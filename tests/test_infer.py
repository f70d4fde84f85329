"""Inference-surface tests on the tiny config (CPU): single image, batch
dir, and the continuous video path with its reader thread + drain timeout
(SURVEY.md §2.6 / §3.5 — the BASELINE config-5 stack in miniature)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from bdd100k_tpu.infer import main as infer_main  # noqa: E402


@pytest.fixture(scope="module")
def video_path(tmp_path_factory):
    """A tiny 15-frame 128x96 mp4 with a moving bright square."""
    path = tmp_path_factory.mktemp("vid") / "clip.mp4"
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (128, 96)
    )
    assert writer.isOpened()
    for t in range(15):
        frame = np.full((96, 128, 3), 40, np.uint8)
        x = 8 + 6 * t
        frame[30:60, x : x + 24] = (250, 120, 60)
        writer.write(frame)
    writer.release()
    return path


def test_run_video_continuous(video_path, tmp_path, capsys):
    """Video mode drains the whole clip through dispatch-ahead continuous
    batching (batch 4 over 15 frames forces a partial final batch) and
    writes a same-length annotated mp4."""
    infer_main([
        "--config", "ssd_tiny_64", "--video", str(video_path),
        "--out_dir", str(tmp_path), "--batch_size", "4",
        "--host_resize", "on", "--drain_timeout", "0.01",
    ])
    out = capsys.readouterr().out
    assert "15 frames" in out, out
    clip = cv2.VideoCapture(str(tmp_path / "det_video.mp4"))
    assert clip.isOpened()
    assert int(clip.get(cv2.CAP_PROP_FRAME_COUNT)) == 15
    clip.release()


def test_run_single_image(tmp_path, capsys):
    img = np.random.RandomState(0).randint(0, 255, (96, 128, 3), np.uint8)
    path = tmp_path / "img.jpg"
    cv2.imwrite(str(path), img[..., ::-1])
    infer_main([
        "--config", "ssd_tiny_64", "--image", str(path),
        "--out_dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "warm latency" in out
    assert (tmp_path / "det_img.jpg").exists()


def test_run_dir_batched(tmp_path, capsys):
    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(1)
    for i in range(5):
        cv2.imwrite(
            str(d / f"im{i}.jpg"),
            rs.randint(0, 255, (96, 128, 3), np.uint8),
        )
    infer_main([
        "--config", "ssd_tiny_64", "--image_dir", str(d),
        "--batch_size", "4",
    ])
    out = capsys.readouterr().out
    assert "5 images" in out, out


def test_run_dir_propagates_decode_failure(tmp_path):
    """A corrupt JPEG mid-sweep must raise, not silently truncate the
    directory sweep with exit code 0 (same failure-propagation discipline
    as data.pipeline.prefetch_to_device)."""
    d = tmp_path / "imgs"
    d.mkdir()
    rs = np.random.RandomState(2)
    for i in range(3):
        cv2.imwrite(
            str(d / f"im{i}.jpg"),
            rs.randint(0, 255, (96, 128, 3), np.uint8),
        )
    (d / "im1.jpg").write_bytes(b"\xff\xd8 not a real jpeg")
    with pytest.raises(RuntimeError, match="image_dir pipeline failed"):
        infer_main([
            "--config", "ssd_tiny_64", "--image_dir", str(d),
            "--batch_size", "2",
        ])
