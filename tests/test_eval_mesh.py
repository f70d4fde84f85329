"""pjit eval step over the 8-device fake mesh (the evaluate.py device path:
fwd → fused postprocess with batch sharded on 'data', params replicated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.configs import TrainConfig
from bdd100k_tpu.configs.detector_configs import tiny_test_config
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.parallel.mesh import batch_sharding, make_mesh
from bdd100k_tpu.parallel.train_step import create_train_state, make_eval_step


def test_eval_step_sharded_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    bundle = build_detector(tiny_test_config("ssd"), dtype=jnp.float32)
    state = create_train_state(
        bundle, TrainConfig(batch_size=8, max_boxes=8), jax.random.PRNGKey(0)
    )
    images = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (8, 96, 128, 3), np.uint8)
    )

    ref = make_eval_step(bundle)(state.params, state.batch_stats, images)

    mesh = make_mesh(num_data=8)
    sharded = jax.device_put(images, batch_sharding(mesh))
    out = make_eval_step(bundle, mesh=mesh)(
        state.params, state.batch_stats, sharded
    )

    # eval mode has no cross-example coupling (running BN stats), so the
    # sharded program must agree with single-device to fp noise
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    np.testing.assert_array_equal(
        np.asarray(ref.classes), np.asarray(out.classes)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), rtol=1e-5, atol=1e-6
    )


def test_eval_step_sharded_fixpoint_nms():
    """nms_impl='fixpoint' under the 8-device data mesh: the suppression
    while_loop's convergence test reduces over the GLOBAL sharded array
    (one all-reduce per pass under pjit) — must compile, run, and agree
    with the single-device XLA-oracle result bit-for-bit on keep/class."""
    import dataclasses

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = tiny_test_config("ssd")
    cfg_fix = dataclasses.replace(
        cfg, postprocess=dataclasses.replace(cfg.postprocess, nms_impl="fixpoint")
    )
    bundle_ref = build_detector(cfg, dtype=jnp.float32)
    bundle_fix = build_detector(cfg_fix, dtype=jnp.float32)
    state = create_train_state(
        bundle_ref, TrainConfig(batch_size=8, max_boxes=8), jax.random.PRNGKey(0)
    )
    images = jnp.asarray(
        np.random.RandomState(1).randint(0, 255, (8, 96, 128, 3), np.uint8)
    )

    ref = make_eval_step(bundle_ref)(state.params, state.batch_stats, images)

    mesh = make_mesh(num_data=8)
    sharded = jax.device_put(images, batch_sharding(mesh))
    out = make_eval_step(bundle_fix, mesh=mesh)(
        state.params, state.batch_stats, sharded
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    np.testing.assert_array_equal(
        np.asarray(ref.classes), np.asarray(out.classes)
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), rtol=1e-5, atol=1e-6
    )
