"""Manual-collective DP train step via shard_map (SURVEY.md §2.8).

The pjit step in train_step.py lets XLA derive the gradient all-reduce from
shardings — the right default. This variant is the explicit form: per-shard
forward/backward inside `shard_map`, gradients cross-replica-summed with
`jax.lax.pmean` over the 'data' mesh axis, optimizer update replicated by
construction. Use it when manual control over collective placement matters
(e.g. overlapping grad reduction with tail backprop, or debugging comm):
the collectives are visible ops here, not compiler inferences.

Semantics differences vs the pjit step (both are standard DP trade-offs):
  * BatchNorm statistics are per-shard (classic local BN), then pmean-synced
    into the running stats — the pjit step normalizes with global-batch
    stats.
  * augment RNG folds in the shard index so every image still gets a unique
    stream.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
import functools

try:  # jax ≥0.8 moved shard_map out of experimental (kwarg: check_vma)
    from jax import shard_map as _shard_map

    shard_map = functools.partial(_shard_map, check_vma=False)
except ImportError:  # pragma: no cover - older jax (kwarg: check_rep)
    from jax.experimental.shard_map import shard_map as _shard_map

    shard_map = functools.partial(_shard_map, check_rep=False)

from bdd100k_tpu.data.augment import AugmentConfig, augment_batch
from bdd100k_tpu.models.detector import DetectorBundle
from bdd100k_tpu.parallel.train_step import (
    TrainState,
    detection_loss,
    ema_update,
)


def make_shardmap_train_step(
    bundle: DetectorBundle,
    augment_cfg: AugmentConfig | None = None,
    mesh=None,
    donate: bool = True,
    ema_decay: float = 0.0,
) -> Callable:
    """step(state, rng, images_u8, gt_boxes, gt_labels, gt_mask)
    -> (new_state, metrics) — same contract as make_train_step."""
    if mesh is None:
        raise ValueError("shard_map step needs a mesh")
    if augment_cfg is None:
        augment_cfg = AugmentConfig(out_size=bundle.config.image_size)

    def shard_fn(state: TrainState, rng, images, gt_boxes, gt_labels, gt_mask):
        # Unique augment streams per shard.
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        if images.dtype == jnp.uint8:
            images, gt_boxes, gt_labels, gt_mask = augment_batch(
                rng, images, gt_boxes, gt_labels, gt_mask, augment_cfg
            )

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                (loc, cls), updates = bundle.model.apply(
                    variables, images, train=True, mutable=["batch_stats"]
                )
                new_stats = updates["batch_stats"]
            else:
                loc, cls = bundle.model.apply(variables, images, train=True)
                new_stats = state.batch_stats
            lb = detection_loss(
                bundle, loc, cls, gt_boxes, gt_labels, gt_mask
            )
            return lb.total, (lb, new_stats)

        (total, (lb, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # THE manual collectives: replica-mean gradients (and local BN stats)
        # over the data axis of the mesh — what pjit would have inserted.
        grads = jax.lax.pmean(grads, axis_name="data")
        new_stats = jax.lax.pmean(new_stats, axis_name="data")
        total = jax.lax.pmean(total, axis_name="data")
        lb = jax.lax.pmean(lb, axis_name="data")

        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        if ema_decay > 0:
            # post-pmean params are replica-identical, so the EMA shadow is too
            new_state = ema_update(new_state, ema_decay)
        metrics = {
            "loss": total,
            "conf_loss": lb.conf,
            "loc_loss": lb.loc,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    repl = P()
    data = P("data")
    # replication checking disabled at import (check_vma/check_rep=False):
    # optax update closures aren't rep-analyzable
    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(repl, repl, data, data, data, data),
        out_specs=(repl, repl),
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())
