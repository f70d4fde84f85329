"""Single-file .npz weights artifacts (utils/weights.py): round-trip
fidelity, strict-restore contract, driver integration, and the committed
flagship artifact's integrity.

The reference's analog is handing someone a tf.train.Saver checkpoint
(SURVEY.md §2.4); here one compressed npz is the whole trained model.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bdd100k_tpu.configs.detector_configs import tiny_test_config
from bdd100k_tpu.configs.train_configs import TrainConfig
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.parallel.train_step import create_train_state
from bdd100k_tpu.utils.weights import (
    load_detector_npz,
    load_into_state,
    restore_eval_weights,
    save_detector_npz,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config("ssd")
    bundle = build_detector(cfg, dtype=jnp.float32)
    return cfg, bundle


def _fwd(bundle, state, images):
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    loc, cls = bundle.model.apply(variables, images, train=False)
    return np.asarray(loc), np.asarray(cls)


@pytest.mark.parametrize("dtype,tol", [(np.float32, 0.0), (np.float16, 2e-2)])
def test_roundtrip_forward(tiny, tmp_path, dtype, tol):
    cfg, bundle = tiny
    src = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(1))
    path = tmp_path / "w.npz"
    meta = save_detector_npz(
        path, jax.device_get(src.params), jax.device_get(src.batch_stats),
        config_name=cfg.name, step=123, param_dtype=dtype,
    )
    assert meta["step"] == 123 and meta["source"] == "params"

    # a DIFFERENT random init must be fully overwritten by the artifact
    dst = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(2))
    dst, step = load_into_state(dst, path, expect_config=cfg.name)
    assert step == 123 and int(dst.step) == 123

    images = jax.random.uniform(
        jax.random.PRNGKey(0), (2, cfg.image_size, cfg.image_size, 3)
    )
    loc_a, cls_a = _fwd(bundle, src, images)
    loc_b, cls_b = _fwd(bundle, dst, images)
    if tol == 0.0:
        # fp32 artifact: bit-identical weights → identical program output
        np.testing.assert_array_equal(loc_a, loc_b)
        np.testing.assert_array_equal(cls_a, cls_b)
    else:
        np.testing.assert_allclose(loc_a, loc_b, atol=tol, rtol=tol)
        np.testing.assert_allclose(cls_a, cls_b, atol=tol, rtol=tol)


def test_strict_restore_contract(tiny, tmp_path):
    cfg, bundle = tiny
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(1))
    path = tmp_path / "w.npz"
    save_detector_npz(
        path, jax.device_get(state.params), jax.device_get(state.batch_stats),
        config_name=cfg.name,
    )
    flat_p, flat_s, meta = load_detector_npz(path)
    assert meta["config"] == cfg.name

    # missing a param path → loud error, not a silent warm start
    drop = sorted(flat_p)[0]
    broken = {f"params/{k}": v for k, v in flat_p.items() if k != drop}
    broken |= {f"batch_stats/{k}": v for k, v in flat_s.items()}
    np.savez(tmp_path / "missing.npz", **broken)
    with pytest.raises(ValueError, match="missing params path"):
        load_into_state(state, tmp_path / "missing.npz")

    # an extra path the model doesn't have → loud error
    full = {f"params/{k}": v for k, v in flat_p.items()}
    full |= {f"batch_stats/{k}": v for k, v in flat_s.items()}
    full["params/ghost/kernel"] = np.zeros((1,), np.float32)
    np.savez(tmp_path / "extra.npz", **full)
    with pytest.raises(ValueError, match="absent from the model"):
        load_into_state(state, tmp_path / "extra.npz")

    # --ema against a raw-params artifact → refuse (no shadow in the file)
    with pytest.raises(SystemExit, match="source='params'"):
        load_into_state(state, path, ema=True)


def test_restore_eval_weights_dispatches_to_orbax(tiny, tmp_path):
    from bdd100k_tpu.utils.checkpoint import CheckpointManager

    cfg, bundle = tiny
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(1))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr = CheckpointManager(tmp_path / "ckpt", async_save=False)
    mgr.save(7, state)
    mgr.wait()
    fresh = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(2))
    restored, step = restore_eval_weights(fresh, tmp_path / "ckpt")
    assert step == 7
    a = jax.device_get(state.params)
    b = jax.device_get(restored.params)
    jax.tree.map(np.testing.assert_array_equal, a, b)


def test_export_script_then_eval_cli(tiny, tmp_path):
    """The full user journey: train ckpt → export_weights.py → a fresh
    evaluate.py run fed only the single file."""
    import sys

    from bdd100k_tpu.utils.checkpoint import CheckpointManager

    cfg, bundle = tiny
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(1))
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    mgr = CheckpointManager(tmp_path / "run", async_save=False)
    mgr.save(42, state)
    mgr.wait()

    sys.path.insert(0, "scripts")
    try:
        import export_weights
    finally:
        sys.path.pop(0)
    out = tmp_path / "tiny.npz"
    export_weights.main([
        "--ckpt_dir", str(tmp_path / "run"), "--config", "ssd_tiny_64",
        "--out", str(out),
    ])
    assert out.exists()

    from bdd100k_tpu import evaluate as eval_mod

    result = eval_mod.main([
        "--config", "ssd_tiny_64", "--synthetic", "8",
        "--synthetic_dir", str(tmp_path / "synth"),
        "--batch_size", "8", "--max_boxes", "16",
        "--ckpt_dir", str(out),
        "--out", str(tmp_path / "result.json"),
    ])
    assert 0.0 <= result["mAP"] <= 1.0
    assert result["num_images"] == 8


def test_committed_flagship_artifact():
    """The repo ships the trained SSD300 weights (BENCH_MATRIX.md
    "Accuracy"); its integrity is CI-checked so a scratch wipe can never
    silently orphan the accuracy claims again (CLAUDE.md: /tmp checkpoints
    VANISH between sessions)."""
    from pathlib import Path

    path = (
        Path(__file__).resolve().parent.parent
        / "artifacts" / "ssd_mobilenet_300_synth9k.npz"
    )
    assert path.exists(), "committed weights artifact is missing"
    flat_p, flat_s, meta = load_detector_npz(path)
    assert meta["config"] == "ssd_mobilenet_300"
    assert meta["step"] == 9000
    assert meta["source"] == "params"
    # MobileNetV1 stem+13 blocks + SSD heads: a real tree, not a stub
    assert len(flat_p) > 100
    assert any(k.startswith("backbone/") for k in flat_p)
    assert all(np.isfinite(v).all() for v in flat_p.values())
    assert all(np.isfinite(v).all() for v in flat_s.values())
