"""One-off probes for the preselect redesign (VERDICT r4 item 1).

(a) score sparsity on the TRAINED flagship: per-image count of anchors
    whose max foreground score clears score_threshold, and per-(image,
    class) counts — sizes the anchor-prune M and the per-class k.
(b) micro-bench of exact top-k lowerings at the preselect shape
    (B*C, N) k=200: approx_max_k(recall 1.0) vs lax.top_k vs full sort,
    plus the (B, N) anchor-prune shape.

Run: python benchmarks/probe_preselect.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import fetch_fence, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from bdd100k_tpu.configs import TrainConfig, get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset
    from bdd100k_tpu.data.pipeline import DetectionDataset
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.ops.postprocess import compute_scores
    from bdd100k_tpu.parallel.train_step import create_train_state
    from bdd100k_tpu.utils.weights import restore_eval_weights

    cfg = get_config("ssd_mobilenet_300")
    bundle = build_detector(cfg)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    state, _ = restore_eval_weights(
        state, "artifacts/ssd_mobilenet_300_synth9k.npz",
        expect_config=cfg.name,
    )
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    labels = ensure_synthetic_dataset("/tmp/bdd_synth_val", num_images=64,
                                      seed=1, split="val")
    ds = DetectionDataset.from_bdd100k(
        labels, Path("/tmp/bdd_synth_val") / "images" / "val",
        max_boxes=100, decode_size=300,
    )
    imgs = np.stack([ds[i]["image"] for i in range(64)])

    @jax.jit
    def fg_scores(variables, images_u8):
        x = preprocess_eval_batch(images_u8, cfg.image_size)
        _, cls = bundle.model.apply(variables, x, train=False)
        return compute_scores(
            cls.astype(jnp.float32), cfg.postprocess.score_mode
        )  # (B, N, C)

    s = np.asarray(fg_scores(variables, jnp.asarray(imgs)))
    thr = cfg.postprocess.score_threshold
    above = s > thr
    per_img_anchor = above.any(-1).sum(1)          # anchors w/ any class > thr
    per_img_total = above.sum((1, 2))              # (anchor, class) pairs
    per_img_class = above.sum(1)                   # (B, C)
    stats = {
        "thr": thr,
        "anchors_any_gt_thr": {
            "mean": float(per_img_anchor.mean()),
            "p50": int(np.percentile(per_img_anchor, 50)),
            "p99": int(np.percentile(per_img_anchor, 99)),
            "max": int(per_img_anchor.max()),
        },
        "pairs_gt_thr": {
            "mean": float(per_img_total.mean()),
            "max": int(per_img_total.max()),
        },
        "per_class_max": int(per_img_class.max()),
    }
    log(f"sparsity: {stats}")

    # (b) micro-bench the exact top-k lowerings (resident loop, fenced)
    def bench(fn, x, iters=30):
        f = jax.jit(fn)
        r = f(x)
        fetch_fence(r[0] if isinstance(r, tuple) else r)
        t0 = time.monotonic()
        for _ in range(iters):
            r = f(x)
        fetch_fence(r[0] if isinstance(r, tuple) else r)
        return (time.monotonic() - t0) / iters * 1e3  # ms

    key = jax.random.PRNGKey(0)
    shapes = {
        "BC_N": (1280, 8732),
        "B_N": (128, 8732),
    }
    res = {}
    for name, shp in shapes.items():
        x = jax.random.uniform(key, shp, jnp.float32)
        for k in (200, 1024) if name == "B_N" else (200,):
            if k > shp[1]:
                continue
            res[f"{name}.k{k}.approx1.0"] = bench(
                lambda v, k=k: jax.lax.approx_max_k(v, k=k, recall_target=1.0),
                x,
            )
            res[f"{name}.k{k}.topk"] = bench(
                lambda v, k=k: jax.lax.top_k(v, k=k), x
            )
            res[f"{name}.k{k}.approx.95"] = bench(
                lambda v, k=k: jax.lax.approx_max_k(v, k=k), x
            )
        res[f"{name}.sort"] = bench(lambda v: jnp.sort(v, axis=-1), x)
        res[f"{name}.max"] = bench(lambda v: jnp.max(v, axis=-1), x)
    for kk, v in sorted(res.items()):
        log(f"{kk}: {v:.3f} ms")
    print(json.dumps({"sparsity": stats, "ms": res}))


if __name__ == "__main__":
    main()
