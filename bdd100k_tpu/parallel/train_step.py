"""pjit train/eval steps: ONE compiled program per step (SURVEY.md §3.5).

train: device batch (uint8 frames + padded GT) → fused augment → model fwd
→ batched match+mine → loss → grad → (compiler-inserted) all-reduce over
'data' → optimizer update. Zero host math per step — the TPU-native inverse
of the reference's sess.run feed/fetch loop (SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from bdd100k_tpu.configs.train_configs import TrainConfig
from bdd100k_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    preprocess_eval_batch,
)
from bdd100k_tpu.models.detector import DetectorBundle
from bdd100k_tpu.models.losses import LossBreakdown, ssd_loss, yolo_loss
from bdd100k_tpu.ops import boxes as box_ops
from bdd100k_tpu.ops.matching import encode_targets
from bdd100k_tpu.parallel.mesh import batch_sharding, replicated_sharding


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Shadow params for --ema_decay (None when EMA is off). jax treats None
    # as an empty subtree, so the state pytree/sharding specs are unchanged
    # when disabled and old checkpoints keep loading.
    ema_params: Any = None

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Warmup → piecewise decay (the reference-style LR plan, SURVEY.md §2.4)."""
    # optax.join_schedules re-bases the piecewise schedule at warmup_steps,
    # so boundary keys must be warmup-relative for decays to fire at
    # frac*total_steps in ABSOLUTE steps. Collided keys (small total_steps)
    # multiply rather than silently dropping a decay.
    offset = max(cfg.warmup_steps, 0)
    decay_points: dict[int, float] = {}
    for frac, d in zip(cfg.lr_boundaries, cfg.lr_decays):
        key = max(int(frac * cfg.total_steps) - offset, 1)
        decay_points[key] = decay_points.get(key, 1.0) * d
    piecewise = optax.piecewise_constant_schedule(cfg.learning_rate, decay_points)
    if cfg.warmup_steps <= 0:
        return piecewise
    warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
    return optax.join_schedules([warmup, piecewise], [cfg.warmup_steps])


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    if cfg.optimizer == "momentum":
        opt = optax.sgd(schedule, momentum=cfg.momentum, nesterov=False)
    elif cfg.optimizer == "adam":
        opt = optax.adam(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = [optax.clip_by_global_norm(cfg.grad_clip_norm)]
    if cfg.weight_decay > 0 and cfg.optimizer == "momentum":
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(opt)
    return optax.chain(*chain)


def create_train_state(
    bundle: DetectorBundle,
    cfg: TrainConfig,
    rng: jax.Array,
    mesh=None,
) -> TrainState:
    # model init + optimizer init + (optional) mesh replication fused into
    # ONE jitted program: eagerly, every initializer / zeros_like /
    # device_put leaf is its own dispatch, and on a high-latency link
    # (this box's tunnel: ~10-30 ms each) a 27M-param state costs minutes;
    # one program is one dispatch and its compile is persistently cached.
    tx = make_optimizer(cfg)
    size = bundle.config.image_size

    def _create(rng):
        variables = bundle.model.init(
            rng, jnp.zeros((1, size, size, 3), jnp.float32), train=False
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            tx=tx,
            # EMA shadow starts at the init point (the warmup ramp in
            # ema_update keeps early steps from being anchored to it)
            ema_params=variables["params"] if cfg.ema_decay > 0 else None,
        )

    out = replicated_sharding(mesh) if mesh is not None else None
    return jax.jit(_create, out_shardings=out)(rng)


def ema_update(new_state: TrainState, decay: float) -> TrainState:
    """Fold the post-update params into the EMA shadow (SURVEY.md §2.4).

    TF1 semantics (tf.train.ExponentialMovingAverage with num_updates):
    effective decay = min(decay, (1+step)/(10+step)) so the shadow tracks
    tightly while the net is far from its init and converges to `decay`.
    Runs on the replicated params — free under DP."""
    step = new_state.step.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    new_ema = jax.tree.map(
        lambda e, p: e - (1.0 - d).astype(e.dtype) * (e - p),
        new_state.ema_params,
        new_state.params,
    )
    return new_state.replace(ema_params=new_ema)


def detection_loss(
    bundle: DetectorBundle,
    loc_preds: jnp.ndarray,
    cls_preds: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
) -> LossBreakdown:
    """Head-appropriate loss over the batched matcher output."""
    cfg = bundle.config
    impl = cfg.matcher_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from bdd100k_tpu.ops.pallas_matcher import pallas_encode_targets

        match = pallas_encode_targets(
            gt_boxes, gt_labels, gt_mask, bundle.anchors, cfg.match_threshold
        )
    else:
        match = encode_targets(
            gt_boxes, gt_labels, gt_mask, bundle.anchors, cfg.match_threshold
        )
    if cfg.head == "ssd":
        return ssd_loss(loc_preds, cls_preds, match, cfg.neg_pos_ratio)
    # YOLO: σ-space targets from each anchor's matched GT box
    matched_boxes = jnp.take_along_axis(
        gt_boxes, match.matched_gt[..., None], axis=1
    )  # (B, A, 4)
    sigma_targets = box_ops.yolo_encode_boxes(
        matched_boxes, bundle.anchors, bundle.cell_sizes
    )
    return yolo_loss(
        loc_preds, cls_preds, match, sigma_targets, cfg.neg_pos_ratio
    )


def make_train_step(
    bundle: DetectorBundle,
    augment_cfg: AugmentConfig | None = None,
    mesh=None,
    donate: bool = True,
    checkify_errors=None,
    ema_decay: float = 0.0,
) -> Callable:
    """Build the jitted train step.

    step(state, rng, images_u8, gt_boxes, gt_labels, gt_mask)
      -> (new_state, metrics dict)

    If `augment_cfg` is given, images are native-resolution uint8 frames and
    the fused augment runs inside this same program; otherwise images are
    already preprocessed float (S, S, 3).

    `checkify_errors` (SURVEY.md §5.2 debug mode): a checkify error set
    (e.g. ``checkify.index_checks | checkify.float_checks``) — the step is
    functionalized through `jax.experimental.checkify` and every call
    raises on out-of-bounds indexing / NaN inside the jitted program, at
    the cost of a per-step host sync. For debugging, not production.
    """
    if augment_cfg is None:
        augment_cfg = AugmentConfig(out_size=bundle.config.image_size)

    def step(state: TrainState, rng, images, gt_boxes, gt_labels, gt_mask):
        if isinstance(images, (tuple, list)):
            # planar YUV420 wire (half the host->HBM bytes): reconstruct
            # uint8 RGB on device, then the normal fused augment path
            from bdd100k_tpu.data.augment import yuv420_to_rgb_batch

            images = (yuv420_to_rgb_batch(*images) * 255.0 + 0.5).astype(
                jnp.uint8
            )
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
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        if ema_decay > 0:
            new_state = ema_update(new_state, ema_decay)
        metrics = {
            "loss": total,
            "conf_loss": lb.conf,
            "loc_loss": lb.loc,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if checkify_errors is not None:
        from jax.experimental import checkify

        checked = checkify.checkify(step, errors=checkify_errors)
        if mesh is None:
            jitted = jax.jit(checked)
        else:
            repl = replicated_sharding(mesh)
            data = batch_sharding(mesh)
            # out_shardings omitted: the error pytree rides along and the
            # compiler replicates it. No donation in debug mode.
            jitted = jax.jit(
                checked, in_shardings=(repl, repl, data, data, data, data)
            )

        def run(state, rng, *batch):
            err, out = jitted(state, rng, *batch)
            checkify.check_error(err)  # host sync; raises on any check hit
            return out

        return run

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(repl, repl, data, data, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    bundle: DetectorBundle, mesh=None, quant_vars=None
) -> Callable:
    """fwd + fused postprocess; returns fixed Detections slots only
    (SURVEY.md §3.5 eval stack).

    `quant_vars`: calibrated `quant` collection for quant="int8_static"
    (models/quant.calibrate) — closed over, so the per-layer activation
    scales are constants of the compiled program."""

    def step(params, batch_stats, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if quant_vars is not None:
            variables["quant"] = quant_vars
        # images: float (preprocessed), uint8 RGB, or a (y, uv) planar
        # YUV420 tuple from the wire-efficient loader (half the transfer
        # bytes; reconstructed in the same fused program).
        if isinstance(images, (tuple, list)) or images.dtype == jnp.uint8:
            images = preprocess_eval_batch(images, bundle.config.image_size)
        loc, cls = bundle.model.apply(variables, images, train=False)
        return bundle.postprocess(loc, cls)

    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step, in_shardings=(repl, repl, data), out_shardings=data
    )
