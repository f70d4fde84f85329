"""Data pipeline tests: parser, synthetic generator, loader, fused augment."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    preprocess_eval_batch,
    _resample,
)
from bdd100k_tpu.data.bdd100k import (
    load_bdd100k_labels,
    parse_bdd100k_record,
    pad_ground_truth,
)
from bdd100k_tpu.data.pipeline import DetectionDataset, make_loader, prefetch_to_device
from bdd100k_tpu.data.synthetic import generate_synthetic_dataset


def test_parse_bdd100k_record():
    rec = {
        "name": "a.jpg",
        "attributes": {"weather": "clear", "timeofday": "daytime"},
        "labels": [
            {"category": "car", "box2d": {"x1": 128, "y1": 72, "x2": 256, "y2": 144},
             "attributes": {"occluded": True}},
            {"category": "drivable area", "poly2d": []},  # skipped: no box2d
            {"category": "traffic light",
             "box2d": {"x1": 0, "y1": 0, "x2": 12.8, "y2": 7.2}},
        ],
    }
    out = parse_bdd100k_record(rec)
    assert out["boxes"].shape == (2, 4)
    np.testing.assert_allclose(out["boxes"][0], [0.1, 0.1, 0.2, 0.2], atol=1e-6)
    assert out["labels"].tolist() == [1, 8]
    assert out["box_attributes"][0]["occluded"] is True


def test_pad_ground_truth():
    b, l, m = pad_ground_truth(
        np.zeros((3, 4), np.float32), np.ones(3, np.int32), 10
    )
    assert b.shape == (10, 4) and m.sum() == 3
    b, l, m = pad_ground_truth(
        np.zeros((0, 4), np.float32), np.zeros(0, np.int32), 10
    )
    assert not m.any()


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bdd")
    generate_synthetic_dataset(root, num_images=6, seed=0, split="train")
    return root


def test_synthetic_dataset_format(synthetic_root):
    recs = load_bdd100k_labels(synthetic_root / "labels" / "train.json")
    assert len(recs) == 6
    assert all(r["boxes"].shape[1] == 4 for r in recs)
    assert all(len(r["boxes"]) >= 1 for r in recs)
    raw = json.loads((synthetic_root / "labels" / "train.json").read_text())
    assert "box2d" in raw[0]["labels"][0]
    assert "weather" in raw[0]["attributes"]


def test_dataset_and_loader(synthetic_root):
    ds = DetectionDataset.from_bdd100k(
        synthetic_root / "labels" / "train.json",
        synthetic_root / "images" / "train",
        max_boxes=16,
    )
    assert len(ds) == 6
    sample = ds[0]
    assert sample["image"].shape == (720, 1280, 3)
    assert sample["image"].dtype == np.uint8

    batches = list(
        make_loader(ds, batch_size=2, shuffle=True, num_epochs=1, num_workers=2)
    )
    assert len(batches) == 3
    assert batches[0].images.shape == (2, 720, 1280, 3)
    assert batches[0].boxes.shape == (2, 16, 4)


def test_loader_per_host_sharding(synthetic_root):
    ds = DetectionDataset.from_bdd100k(
        synthetic_root / "labels" / "train.json",
        synthetic_root / "images" / "train",
    )
    b0 = list(make_loader(ds, 1, shuffle=False, num_epochs=1,
                          process_index=0, process_count=2, num_workers=1))
    b1 = list(make_loader(ds, 1, shuffle=False, num_epochs=1,
                          process_index=1, process_count=2, num_workers=1))
    assert len(b0) == 3 and len(b1) == 3


def test_prefetch_to_device(synthetic_root):
    ds = DetectionDataset.from_bdd100k(
        synthetic_root / "labels" / "train.json",
        synthetic_root / "images" / "train",
    )
    it = prefetch_to_device(
        make_loader(ds, 2, num_epochs=1, num_workers=2), size=2
    )
    n = 0
    for batch in it:
        assert isinstance(batch.images, jax.Array)
        n += 1
    assert n == 3


def test_loader_skip_steps_resumes_permutation(synthetic_root):
    """skip_steps=k reproduces exactly the batches a fresh loader yields
    after its first k — kill/resume continues the shuffle mid-epoch
    (SURVEY.md §5.4 iterator state)."""
    ds = DetectionDataset.from_bdd100k(
        synthetic_root / "labels" / "train.json",
        synthetic_root / "images" / "train",
    )
    kw = dict(batch_size=2, shuffle=True, seed=3, num_workers=1,
              num_epochs=3)
    full = [b.labels for b in make_loader(ds, **kw)]
    k = 4  # crosses an epoch boundary (3 batches/epoch at bs=2, 6 imgs)
    resumed = [b.labels for b in make_loader(ds, skip_steps=k, **kw)]
    assert len(resumed) == len(full) - k
    for a, b in zip(full[k:], resumed):
        np.testing.assert_array_equal(a, b)


def test_prefetch_propagates_loader_errors():
    """A mid-stream loader failure must raise in the consumer, not look
    like clean exhaustion (silent train truncation / partial-set eval)."""

    def broken():
        yield np.zeros((2, 4), np.float32)
        raise OSError("decode failed")

    it = prefetch_to_device(broken(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="input pipeline"):
        for _ in it:
            pass


def _smooth_rgb(n=2, s=64):
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    img = np.stack(
        [xx * 255 / s, yy * 255 / s, (xx + yy) * 255 / (2 * s)], axis=-1
    )
    return np.broadcast_to(img, (n, s, s, 3)).astype(np.uint8).copy()


def test_yuv420_roundtrip_device():
    """rgb→(host yuv420)→(device rgb) reconstructs smooth images within the
    chroma-subsampling budget (wire-efficient path, SURVEY.md §2.7)."""
    from bdd100k_tpu.data.augment import yuv420_to_rgb_batch
    from bdd100k_tpu.data.pipeline import rgb_to_yuv420_host

    rgb = _smooth_rgb()
    y, uv = rgb_to_yuv420_host(rgb)
    assert y.shape == (2, 64, 64) and uv.shape == (2, 32, 32, 2)
    rec = np.asarray(yuv420_to_rgb_batch(jnp.asarray(y), jnp.asarray(uv)))
    err = np.abs(rec * 255 - rgb.astype(np.float32))
    assert err.mean() < 1.5 and err.max() < 8, (err.mean(), err.max())


def test_native_yuv420_matches_host_oracle(synthetic_root):
    """Native planar decode agrees with decode-RGB + host conversion.

    Luma matches within rounding. Chroma is statistical: the raw-data fast
    path resizes native (never-upsampled) chroma planes while the oracle
    upsamples→resizes→re-subsamples, so isolated pixels at sharp chroma
    edges legitimately differ by tens — but mean and p99 stay tiny."""
    from bdd100k_tpu.data import native_decode as nd
    from bdd100k_tpu.data.pipeline import rgb_to_yuv420_host

    if not nd.available():
        pytest.skip("native decode pool not built")
    jpegs = [
        p.read_bytes()
        for p in sorted((synthetic_root / "images" / "train").iterdir())[:3]
    ]
    dec = nd.NativeDecoder(2)
    rgb = dec.decode_batch(jpegs, 300)
    y, uv = dec.decode_batch_yuv420(jpegs, 300)
    oy, ouv = rgb_to_yuv420_host(rgb)
    assert np.abs(y.astype(int) - oy.astype(int)).max() <= 3
    duv = np.abs(uv.astype(int) - ouv.astype(int))
    assert duv.mean() <= 1.0 and np.percentile(duv, 99) <= 3, (
        duv.mean(), np.percentile(duv, 99), duv.max()
    )


def test_native_resize_yuv420_matches_oracle():
    """Native batched resize+convert (the streaming hot path) agrees with
    the numpy conversion oracle at identity size, and stays within the
    resize-impl budget when actually resizing."""
    from bdd100k_tpu.data import native_decode as nd
    from bdd100k_tpu.data.pipeline import rgb_to_yuv420_host

    if not nd.available():
        pytest.skip("native decode pool not built")
    dec = nd.NativeDecoder(2)
    rgb = _smooth_rgb(n=2, s=64)
    y, uv = dec.resize_yuv420_batch(rgb, 64)  # identity resize
    oy, ouv = rgb_to_yuv420_host(rgb)
    assert np.abs(y.astype(int) - oy.astype(int)).max() <= 1
    assert np.abs(uv.astype(int) - ouv.astype(int)).max() <= 1

    big = _smooth_rgb(n=1, s=128)
    y2, uv2 = dec.resize_yuv420_batch(big, 64)
    # smooth gradient: downscale then convert ≈ convert at full res
    assert np.abs(y2.astype(int) - oy[:1].astype(int)).max() <= 4


def test_loader_yuv420_wire(synthetic_root):
    """wire_format='yuv420' loader feeds preprocess_eval_batch end to end
    and matches the RGB wire within the subsampling budget."""
    ds = DetectionDataset.from_bdd100k(
        synthetic_root / "labels" / "train.json",
        synthetic_root / "images" / "train",
        decode_size=64,
    )
    kw = dict(batch_size=2, shuffle=False, num_workers=1, num_epochs=1)
    b_rgb = next(make_loader(ds, **kw))
    b_yuv = next(make_loader(ds, wire_format="yuv420", **kw))
    y, uv = b_yuv.images
    assert y.shape == (2, 64, 64) and uv.shape == (2, 32, 32, 2)
    out_rgb = preprocess_eval_batch(b_rgb.images, 64)
    out_yuv = preprocess_eval_batch(tuple(b_yuv.images), 64)
    assert out_yuv.shape == out_rgb.shape == (2, 64, 64, 3)
    err = np.abs(np.asarray(out_yuv) - np.asarray(out_rgb))
    # inputs are normalized to mean 0.5/std 0.5 ⇒ range [-1, 1]
    assert err.mean() < 0.05, err.mean()


def test_resample_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3), jnp.float32)
    rect = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    out = _resample(img, rect, 16, 0.5)
    # the resample contraction intentionally runs in bf16 (see _resample);
    # identity weights are exact but pixel values round to bf16 (~2e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=4e-3)


def test_resample_crop_quadrant():
    """Cropping the top-left quadrant of a constant-quadrant image."""
    img = np.zeros((16, 16, 1), np.float32)
    img[:8, :8] = 1.0
    out = _resample(jnp.asarray(img), jnp.asarray([0.0, 0.0, 0.5, 0.5]), 8, 0.5)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_resample_expand_fills_mean():
    """Zoom-out rect (1.5× canvas): out-of-image area reads mean fill."""
    img = jnp.ones((8, 8, 1), jnp.float32)
    out = _resample(img, jnp.asarray([-0.25, -0.25, 1.25, 1.25]), 12, 0.25)
    o = np.asarray(out)
    assert abs(o[0, 0, 0] - 0.25) < 1e-5   # corner = fill
    assert abs(o[6, 6, 0] - 1.0) < 1e-5    # center = image


def _toy_batch(n=2, m=8):
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (n, 64, 96, 3), dtype=np.uint8)
    boxes = np.zeros((n, m, 4), np.float32)
    labels = np.zeros((n, m), np.int32)
    mask = np.zeros((n, m), bool)
    boxes[:, 0] = [0.3, 0.3, 0.7, 0.7]
    labels[:, 0] = 1
    mask[:, 0] = True
    return (
        jnp.asarray(images),
        jnp.asarray(boxes),
        jnp.asarray(labels),
        jnp.asarray(mask),
    )


def test_augment_batch_shapes_and_sanity():
    images, boxes, labels, mask = _toy_batch()
    cfg = AugmentConfig(out_size=32)
    out, b, l, m = augment_batch(jax.random.PRNGKey(0), images, boxes, labels, mask, cfg)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert b.shape == boxes.shape
    bb = np.asarray(b)
    assert bb.min() >= 0.0 and bb.max() <= 1.0
    # normalized output range bounded by (0-mean)/std..(1-mean)/std
    assert np.asarray(out).min() >= -1.0 - 1e-5
    assert np.asarray(out).max() <= 1.0 + 1e-5


def test_augment_keeps_some_gt_mostly():
    """The sampler requires a surviving GT unless it keeps the canvas —
    where all GTs survive too; so masks should rarely go empty."""
    images, boxes, labels, mask = _toy_batch(n=8)
    cfg = AugmentConfig(out_size=32)
    out, b, l, m = augment_batch(
        jax.random.PRNGKey(1), images, boxes, labels, mask, cfg
    )
    kept = np.asarray(m).any(axis=1)
    assert kept.mean() >= 0.9


def test_augment_deterministic_given_key():
    images, boxes, labels, mask = _toy_batch()
    cfg = AugmentConfig(out_size=32)
    o1 = augment_batch(jax.random.PRNGKey(7), images, boxes, labels, mask, cfg)
    o2 = augment_batch(jax.random.PRNGKey(7), images, boxes, labels, mask, cfg)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))


def test_preprocess_eval_batch():
    img = jnp.zeros((2, 64, 96, 3), jnp.uint8)
    out = preprocess_eval_batch(img, 32)
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out), -1.0, atol=1e-6)


def test_loader_per_host_sharding_uneven(synthetic_root):
    """len(dataset) % process_count != 0: every host must still yield the
    SAME batch count per epoch (a mismatched host would hang the global
    batch assembly — ADVICE r2). The spare rows are dropped."""
    ds = DetectionDataset.from_bdd100k(
        synthetic_root / "labels" / "train.json",
        synthetic_root / "images" / "train",
    )
    ds.records = ds.records[:5]  # odd count across 2 hosts
    b0 = list(make_loader(ds, 1, shuffle=False, num_epochs=1,
                          process_index=0, process_count=2, num_workers=1))
    b1 = list(make_loader(ds, 1, shuffle=False, num_epochs=1,
                          process_index=1, process_count=2, num_workers=1))
    assert len(b0) == len(b1) == 2


def test_synthetic_nonshared_fs_generates_locally(tmp_path, monkeypatch):
    """Multi-host generation on a NON-shared out_dir (e.g. host-local /tmp
    on a real pod): a non-zero process that cannot see proc 0's output
    after the barrier must generate its own copy (O_EXCL claim), and a
    lock loser must wait for the winner's labels file instead of racing
    (code-review r3)."""
    import threading

    import jax

    from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.sync_global_devices",
        lambda name: None,
    )

    # claim path: empty local dir -> this process generates its own copy
    root = tmp_path / "local_a"
    labels = ensure_synthetic_dataset(root, num_images=3, seed=0)
    assert labels.exists()
    assert len(json.loads(labels.read_text())) == 3
    assert not (root / ".gen_lock_train").exists()  # lock released

    # loser path: lock already held; another "process" finishes generation
    # while we poll -> we must return once the labels JSON is complete
    root_b = tmp_path / "local_b"
    root_b.mkdir()
    (root_b / ".gen_lock_train").touch()

    def winner():
        generate_synthetic_dataset(root_b, num_images=3, seed=0)

    t = threading.Timer(0.3, winner)
    t.start()
    try:
        labels_b = ensure_synthetic_dataset(root_b, num_images=3, seed=0)
        assert len(json.loads(labels_b.read_text())) == 3
    finally:
        t.join()


def test_kmeans_priors_degenerate_shapes():
    """All-identical box shapes must not crash the k-means++ init
    (farthest-point mass is zero -> uniform fallback, code-review r3)."""
    from bdd100k_tpu.data.priors import kmeans_priors

    wh = np.full((50, 2), 0.25)
    centroids, miou = kmeans_priors(wh, k=3, iters=5)
    assert centroids.shape == (3, 2)
    assert miou == pytest.approx(1.0)
