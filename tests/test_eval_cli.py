"""evaluate.py driven end-to-end (SURVEY.md §2.5):

  * YOLO config through the full eval CLI — σ-decode + sigmoid scoring +
    NMS + mAP accumulation (VERDICT r2 missing #4: 'evaluate.py has never
    been driven with a YOLO config');
  * two-process multi-host eval: per-host shards, file-based merge, result
    identical to the single-process run over the same data (VERDICT r2
    weak #6).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.parametrize(
    "config,nms",
    [
        ("yolo_tiny_64", "auto"),
        ("ssd_tiny_64", "auto"),
        ("ssd_tiny_64", "fixpoint"),
    ],
)
def test_evaluate_cli_synthetic(config, nms, tmp_path):
    from bdd100k_tpu import evaluate as eval_mod

    extra = []
    if config == "ssd_tiny_64" and nms == "auto":
        extra = ["--coco_map",
                 "--dump_detections", str(tmp_path / "dets.json")]
    result = eval_mod.main([
        "--config", config, "--synthetic", "8",
        "--synthetic_dir", str(tmp_path / "synth"),
        "--batch_size", "8", "--max_boxes", "16", "--nms", nms,
        "--out", str(tmp_path / "result.json"), *extra,
    ])
    assert 0.0 <= result["mAP"] <= 1.0
    assert result["num_images"] == 8
    assert set(result["per_class"]) >= {"car", "train"}
    # timing excludes the first (compile) batch; a one-batch run has no
    # steady-state sample and must say so rather than report compile rate
    assert result["images_per_sec"] is None
    assert json.loads((tmp_path / "result.json").read_text())["mAP"] == (
        pytest.approx(result["mAP"])
    )
    if extra:
        # COCO-range mAP: @0.50 entry must equal the headline compute
        coco = result["coco"]
        assert coco["per_iou"]["0.50"] == pytest.approx(result["mAP"])
        assert 0.0 <= coco["mAP"] <= result["mAP"] + 1e-9
        # BDD100K-format detection dump: one entry per image, source pixels
        dets = json.loads((tmp_path / "dets.json").read_text())
        assert len(dets) == 8
        assert all(d["name"].endswith(".jpg") for d in dets)
        some = [l for d in dets for l in d["labels"]]
        assert some, "no detections dumped"
        box = some[0]["box2d"]
        assert 0 <= box["x1"] <= box["x2"] <= 1280 + 1e-6
        assert 0 <= box["y1"] <= box["y2"] <= 720 + 1e-6
        assert some[0]["category"] in {
            "car", "bus", "truck", "person", "rider", "bike", "motor",
            "traffic light", "traffic sign", "train",
        }


def test_evaluate_multihost_matches_single_process(tmp_path):
    """2 real processes x --multihost vs 1 process on the same 8 images:
    shard merge must reproduce the single-process mAP."""
    from __graft_entry__ import cpu_mesh_env

    from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset

    data = tmp_path / "synth"
    ensure_synthetic_dataset(data, num_images=8, seed=1, split="val")

    base_args = [
        "--config", "ssd_tiny_64", "--synthetic", "8",
        "--synthetic_dir", str(data), "--max_boxes", "16",
    ]
    # single-process reference (local devices, its own subprocess so the
    # in-test jax backend stays untouched); batch must divide the 8-device
    # mesh in this mode
    env1 = cpu_mesh_env(dict(os.environ), 8)
    env1["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    ref = subprocess.run(
        [sys.executable, "-m", "bdd100k_tpu.evaluate", *base_args,
         "--batch_size", "8", "--out", str(tmp_path / "ref.json")],
        env=env1, cwd=REPO, capture_output=True, text=True, timeout=560,
    )
    assert ref.returncode == 0, ref.stderr[-3000:]
    ref_map = json.loads((tmp_path / "ref.json").read_text())["mAP"]

    port = 22000 + os.getpid() % 10000
    procs = []
    for i in range(2):
        env = cpu_mesh_env(dict(os.environ), 4)
        env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache_mh")
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(i)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "bdd100k_tpu.evaluate", *base_args,
             "--batch_size", "4",  # per-host local batch, no mesh constraint
             "--coco_map",
             "--multihost", "--sync_dir", str(tmp_path / "sync")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"eval worker failed:\n{err[-3000:]}"
    merged = json.loads((tmp_path / "sync" / "result.json").read_text())
    assert merged["num_images"] == 8
    assert merged["num_hosts"] == 2
    # --coco_map must survive the multihost merge path (code-review r3)
    assert merged["coco"]["per_iou"]["0.50"] == pytest.approx(
        merged["mAP"]
    )
    # same images, same fixed-init weights; shard merge must not change mAP
    # (tolerance: per-image scores can wiggle at float noise across batch
    # shapes and reorder PR-curve points near ties)
    np.testing.assert_allclose(merged["mAP"], ref_map, atol=2e-3)
