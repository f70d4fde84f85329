"""jax.export serving artifacts (bdd100k_tpu/export.py): the serialized
program must reproduce the live model's detections exactly and be loadable
without model code or checkpoint plumbing."""

import jax
import jax.numpy as jnp
import numpy as np

from bdd100k_tpu import export as export_mod


def test_export_roundtrip_matches_live_model(tmp_path):
    out = tmp_path / "tiny.jaxexp"
    export_mod.main([
        "--config", "ssd_tiny_64", "--out", str(out), "--batch_size", "2",
        "--nms", "fixpoint",
    ])
    assert out.exists() and out.stat().st_size > 1000

    serve = export_mod.load(out)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3), np.uint8))
    det = serve(imgs)
    assert det["boxes"].shape[0] == 2
    assert det["valid"].dtype == jnp.bool_

    # live model with the same (fresh-init, seed-0) params and config
    import dataclasses

    from bdd100k_tpu.configs import TrainConfig
    from bdd100k_tpu.configs.detector_configs import tiny_test_config
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.train_step import create_train_state

    cfg = tiny_test_config("ssd")
    cfg = dataclasses.replace(
        cfg, postprocess=dataclasses.replace(
            cfg.postprocess, nms_impl="fixpoint"
        )
    )
    bundle = build_detector(cfg)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    live = export_mod.build_serving_fn(
        bundle,
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
    )
    ref = jax.jit(live)(imgs)
    np.testing.assert_array_equal(
        np.asarray(ref["valid"]), np.asarray(det["valid"])
    )
    np.testing.assert_allclose(
        np.asarray(ref["scores"]), np.asarray(det["scores"]), rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(ref["classes"]), np.asarray(det["classes"])
    )


def test_export_int8_static_bakes_calibrated_scales(tmp_path):
    """--quant int8_static exports a runnable artifact with the calibrated
    activation scales baked in (and refuses to run uncalibrated)."""
    import pytest
    from PIL import Image

    out = tmp_path / "tiny_q.jaxexp"
    with pytest.raises(SystemExit, match="calib_images"):
        export_mod.main([
            "--config", "ssd_tiny_64", "--out", str(out), "--batch_size",
            "1", "--nms", "fixpoint", "--quant", "int8_static",
        ])

    calib_dir = tmp_path / "calib"
    calib_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), np.uint8)
        ).save(calib_dir / f"f{i}.png")
    export_mod.main([
        "--config", "ssd_tiny_64", "--out", str(out), "--batch_size", "1",
        "--nms", "fixpoint", "--quant", "int8_static",
        "--calib_images", str(calib_dir),
    ])
    serve = export_mod.load(out)
    det = serve(jnp.asarray(rng.randint(0, 255, (1, 64, 64, 3), np.uint8)))
    assert det["boxes"].shape[0] == 1


def test_export_rejects_ckpt_dir_without_checkpoint(tmp_path):
    """A mistyped/empty --ckpt_dir must fail loudly, not silently bake
    fresh-init weights into a serving artifact (code-review r3)."""
    import pytest

    empty = tmp_path / "no_ckpts_here"
    empty.mkdir()
    with pytest.raises(SystemExit):
        export_mod.main([
            "--config", "ssd_tiny_64", "--out", str(tmp_path / "x.jaxexp"),
            "--batch_size", "1", "--nms", "fixpoint",
            "--ckpt_dir", str(empty),
        ])


def test_export_accepts_npz_artifact(tmp_path):
    """--ckpt_dir foo.npz (the committed single-file artifact form that
    every other driver accepts) must work for export too."""
    from bdd100k_tpu.configs import TrainConfig
    from bdd100k_tpu.configs.detector_configs import tiny_test_config
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.train_step import create_train_state
    from bdd100k_tpu.utils.weights import save_detector_npz

    cfg = tiny_test_config("ssd")
    bundle = build_detector(cfg)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    npz = tmp_path / "tiny_trained.npz"
    save_detector_npz(
        npz, jax.device_get(state.params), jax.device_get(state.batch_stats),
        config_name=cfg.name, step=7,
    )

    out = tmp_path / "from_npz.jaxexp"
    export_mod.main([
        "--config", "ssd_tiny_64", "--out", str(out), "--batch_size", "1",
        "--nms", "fixpoint", "--ckpt_dir", str(npz),
    ])
    serve = export_mod.load(out)
    det = serve(jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert det["boxes"].shape[0] == 1
