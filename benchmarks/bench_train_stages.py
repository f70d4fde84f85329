"""Per-stage attribution for the TRAIN step (VERDICT r3 #3: the YOLO
config-3 step had one aggregate number — 1 021 imgs/s resident, 14.1% MFU
— and no breakdown, so nobody could say where the other 86% goes).

Same resident fori_loop method as bench_postprocess_stages.py: each stage
STOP compiles a program that runs the pipeline up to that point and
consumes every output with a full reduction (so XLA cannot dead-code or
slice away upstream work), measured as ONE dispatched loop the tunnel
cannot smear. Stage costs are differences of stops:

    augment                      : fused device augment alone
    match    - augment           : anchor matching + target encode
    fwd      - augment           : forward (train=True, BN stats update)
    loss     - fwd - (match-aug) : mining + loss (match cost removed)
    grad     - loss              : backward pass
    full     - grad              : optimizer update (+ state plumbing)

Run: python benchmarks/bench_train_stages.py [--config yolo_mobilenet_384]
     [--batch_size 64] [--matcher auto|pallas|xla]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import device_info, fetch_fence, log  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="yolo_mobilenet_384")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--matcher", choices=("auto", "pallas", "xla"),
                   default="auto")
    args = p.parse_args()

    import time

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from bdd100k_tpu.configs import TrainConfig, get_config
    from bdd100k_tpu.data.augment import AugmentConfig, augment_batch
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.train_step import (
        create_train_state,
        detection_loss,
    )
    from bdd100k_tpu.utils.server_warm import start_server_warm

    log(f"device: {device_info()}")
    det_cfg = get_config(args.config)
    if args.matcher != "auto":
        import dataclasses

        det_cfg = dataclasses.replace(det_cfg, matcher_impl=args.matcher)
    cfg = TrainConfig(batch_size=args.batch_size, max_boxes=100)
    bundle = build_detector(det_cfg)
    warm = start_server_warm(bundle)

    state = create_train_state(bundle, cfg, jax.random.PRNGKey(0))
    aug_cfg = AugmentConfig(out_size=det_cfg.image_size)

    rs = np.random.RandomState(0)
    b, m = args.batch_size, cfg.max_boxes
    images = jnp.asarray(rs.randint(0, 255, (b, 720, 1280, 3), np.uint8))
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    n_obj = 20
    for i in range(b):
        x1 = rs.uniform(0, 0.8, n_obj)
        y1 = rs.uniform(0, 0.8, n_obj)
        w = rs.uniform(0.02, 0.2, n_obj)
        h = rs.uniform(0.02, 0.2, n_obj)
        boxes[i, :n_obj] = np.stack(
            [x1, y1, np.minimum(x1 + w, 1), np.minimum(y1 + h, 1)], -1
        )
        labels[i, :n_obj] = rs.randint(1, 11, n_obj)
        mask[i, :n_obj] = True
    boxes, labels, mask = (
        jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask)
    )
    warm.join()

    def tree_consume(t):
        # full reductions so no upstream op can be sliced or DCE'd away
        return sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(t)
        )

    def match_only(gt_boxes, gt_labels, gt_mask):
        impl = det_cfg.matcher_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            from bdd100k_tpu.ops.pallas_matcher import pallas_encode_targets

            return pallas_encode_targets(
                gt_boxes, gt_labels, gt_mask, bundle.anchors,
                det_cfg.match_threshold,
            )
        from bdd100k_tpu.ops.matching import encode_targets

        return encode_targets(
            gt_boxes, gt_labels, gt_mask, bundle.anchors,
            det_cfg.match_threshold,
        )

    def stop_fn(stop):
        def fn(state, rng, images, gt_boxes, gt_labels, gt_mask):
            imgs_f, bx, lb_, mk = augment_batch(
                rng, images, gt_boxes, gt_labels, gt_mask, aug_cfg
            )
            if stop == "augment":
                return tree_consume((imgs_f, bx, lb_, mk))
            if stop == "match":
                # consume imgs_f too: the real train step materializes the
                # augmented images for the forward pass, so the match stop
                # must not let XLA dead-code the image resample (first
                # measurement without this read 20k imgs/s for "augment +
                # match" vs 7k for augment alone)
                return tree_consume((imgs_f, match_only(bx, lb_, mk)))

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    (loc, cls), upd = bundle.model.apply(
                        variables, imgs_f, train=True,
                        mutable=["batch_stats"],
                    )
                    new_stats = upd["batch_stats"]
                else:
                    loc, cls = bundle.model.apply(
                        variables, imgs_f, train=True
                    )
                    new_stats = state.batch_stats
                if stop == "fwd":
                    return tree_consume((loc, cls, new_stats)), new_stats
                lbk = detection_loss(bundle, loc, cls, bx, lb_, mk)
                return lbk.total, new_stats

            if stop in ("fwd", "loss"):
                return loss_fn(state.params)[0]
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            if stop == "grad":
                return total + tree_consume(grads)
            new_state = state.apply_gradients(grads)
            # consume opt_state too, or XLA dead-codes the momentum update
            return total + tree_consume(
                (new_state.params, new_state.opt_state)
            )

        return fn

    def resident_rate(fn):
        def loop(state, rng, batch):
            def body(i, acc):
                imgs = batch[0] ^ (i % 2).astype(jnp.uint8)
                r = jax.random.fold_in(rng, i)
                return acc + fn(state, r, imgs, *batch[1:]).astype(
                    jnp.float32
                )

            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

        looped = jax.jit(loop)
        batch = (images, boxes, labels, mask)
        t0 = time.monotonic()
        fetch_fence(looped(state, jax.random.PRNGKey(1), batch))
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        fetch_fence(looped(state, jax.random.PRNGKey(1), batch))
        dt = time.monotonic() - t0
        return args.iters * args.batch_size / dt, compile_s

    stops = ["augment", "match", "fwd", "loss", "grad", "full"]
    rates, us = {}, {}
    for stop in stops:
        r, cs = resident_rate(stop_fn(stop))
        rates[stop] = round(r, 1)
        us[stop] = 1e6 / r
        log(f"stop={stop}: {r:.1f} imgs/s resident ({us[stop]:.1f} us/img, "
            f"loop compile {cs:.1f}s)")

    stages = {
        "augment": us["augment"],
        "match(+encode)": us["match"] - us["augment"],
        "forward": us["fwd"] - us["augment"],
        "mine+loss": us["loss"] - us["fwd"] - (us["match"] - us["augment"]),
        "backward": us["grad"] - us["loss"],
        "update": us["full"] - us["grad"],
    }
    out = {
        "metric": "train-step stage attribution (resident, us/img)",
        "value": round(us["full"], 1),
        "unit": "us/img full step",
        "vs_baseline": round(rates["full"] / 625.0, 4),
        "config": args.config,
        "batch": args.batch_size,
        "matcher": args.matcher,
        "stops_imgs_per_sec": rates,
        "stages_us_per_img": {k: round(v, 1) for k, v in stages.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
