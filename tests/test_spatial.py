"""Spatial partitioning (SURVEY.md §5.7): the H-sharded program must match
the single-device program exactly — GSPMD's derived halo exchanges are the
thing under test. Runs on the 8-fake-CPU-device mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.configs.detector_configs import tiny_test_config
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.parallel.mesh import make_mesh
from bdd100k_tpu.parallel.spatial import (
    make_spatial_infer_fn,
    spatial_sharding,
)
from bdd100k_tpu.parallel.train_step import make_eval_step


def _detector_outputs(images):
    bundle = build_detector(tiny_test_config("ssd"), dtype=jnp.float32)
    variables = bundle.init(jax.random.PRNGKey(0))
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return bundle, params, stats


def test_spatial_infer_matches_single_device():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (2, 64, 64, 3), np.uint8))
    bundle, params, stats = _detector_outputs(images)

    ref = make_eval_step(bundle)(params, stats, images)

    mesh = make_mesh(num_data=8)
    fn = make_spatial_infer_fn(bundle, mesh)
    # 64 rows / 8 shards = 8 rows per device; every 3×3 conv needs its
    # neighbour's boundary row → the partitioner must insert halos at each
    # of the backbone's 10+ conv stages for this to agree.
    out = fn(params, stats, jax.device_put(images, spatial_sharding(mesh)))

    np.testing.assert_allclose(
        np.asarray(out.scores), np.asarray(ref.scores), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.boxes), np.asarray(ref.boxes), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out.classes), np.asarray(ref.classes)
    )
    np.testing.assert_array_equal(
        np.asarray(out.valid), np.asarray(ref.valid)
    )


def test_spatial_infer_rejects_untileable_mesh():
    """64 over 3 devices: no H×W factorization tiles (3 ∤ 64) → refuse."""
    bundle = build_detector(tiny_test_config("ssd"), dtype=jnp.float32)
    mesh = make_mesh(num_data=3, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="not divisible"):
        make_spatial_infer_fn(bundle, mesh)


def test_spatial_mesh_factors():
    from bdd100k_tpu.parallel.spatial import spatial_mesh_factors

    assert spatial_mesh_factors(300, 8) == (4, 2)  # the flagship case
    assert spatial_mesh_factors(64, 8) == (8, 1)
    assert spatial_mesh_factors(60, 8) == (4, 2)
    assert spatial_mesh_factors(512, 4) == (4, 1)
    with pytest.raises(ValueError, match="not divisible"):
        spatial_mesh_factors(64, 3)


def test_spatial_2d_grid_matches_single_device():
    """An input size that does NOT tile 1-D over the mesh (60 px on 8
    devices — the flagship-300-on-v5e-8 situation at test scale) resolves
    the 2-D (4, 2) H×W grid and still matches the single-device program
    exactly: GSPMD now derives halo exchanges in BOTH spatial dims."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_test_config("ssd"), name="ssd_tiny_60", image_size=60
    )
    bundle = build_detector(cfg, dtype=jnp.float32)
    variables = bundle.init(jax.random.PRNGKey(0))
    params, stats = variables["params"], variables.get("batch_stats", {})
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randint(0, 255, (2, 60, 60, 3), np.uint8))

    ref = make_eval_step(bundle)(params, stats, images)

    mesh = make_mesh(num_data=8)
    fn = make_spatial_infer_fn(bundle, mesh)
    assert tuple(fn.input_sharding.spec) == (None, "sp_h", "sp_w", None)
    out = fn(params, stats, jax.device_put(images, fn.input_sharding))

    np.testing.assert_allclose(
        np.asarray(out.scores), np.asarray(ref.scores), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.boxes), np.asarray(ref.boxes), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out.classes), np.asarray(ref.classes)
    )
