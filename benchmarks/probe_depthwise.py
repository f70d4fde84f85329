"""Depthwise-conv backend probe: Pallas kernels vs the XLA lowering.

Reproduces BENCH_MATRIX "Depthwise kernel study" (r5): per flagship
stride-1 dw shape, on-device correctness of `ops/pallas_depthwise.py`
(errors reduced ON-DEVICE — the tunnel can crawl below 1 MB/s, so the
probe never fetches a 59 MB activation, only 4-byte scalars) and
resident fori_loop timings for XLA fwd vs Pallas fwd vs Pallas dk.
XLA's own isolated dk grad-conv is also attempted per shape — it fails
to compile through this box's AOT path (batch_group_count
canonicalization), which is why the in-situ comparison lives in
`bench_yolo_train_b64.py` under BDD100K_TPU_DW=xla|hybrid|pallas.

Run: python benchmarks/probe_depthwise.py [--iters 100]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import fetch_fence, log  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--batch", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bdd100k_tpu.ops.pallas_depthwise import (
        _dw_xla,
        _fgrad_pallas,
        _fwd_pallas,
    )
    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    def perturb(a, i):
        # defeat loop-invariant hoisting without changing values
        return lax.dynamic_update_slice(
            a, a[:1, :1, :1, :1] + i.astype(a.dtype) * 0, (0, 0, 0, 0)
        )

    def loop_time(fn, *fargs):
        def loop(*a):
            def body(i, acc):
                out = fn(perturb(a[0], i), *a[1:])
                return acc + out.reshape(-1)[0].astype(jnp.float32)

            return lax.fori_loop(0, args.iters, body, jnp.float32(0.0))

        looped = jax.jit(loop)
        fetch_fence(looped(*fargs))
        t0 = time.monotonic()
        fetch_fence(looped(*fargs))
        return (time.monotonic() - t0) / args.iters

    # stride-1 dw layers of the SSD300 + YOLO-384 MobileNets
    shapes = [
        (150, 150, 32), (75, 75, 128), (38, 38, 256), (19, 19, 512),
        (10, 10, 1024),
        (192, 192, 32), (96, 96, 128), (48, 48, 256), (24, 24, 512),
    ]
    rng = np.random.RandomState(0)
    b = args.batch
    log(f"{'shape':16s} | {'roof':>6s} | {'fwd XLA':>8s} {'fwd PAL':>8s}"
        f" {'x':>5s} | {'dk PAL':>8s} | rel err (fwd, dk)")
    for h, w, c in shapes:
        x = jnp.asarray(
            rng.randn(b, h, w, c).astype(np.float32)
        ).astype(jnp.bfloat16)
        k4 = jnp.asarray(rng.randn(3, 3, 1, c).astype(np.float32)).astype(
            jnp.bfloat16
        )
        k3 = k4.reshape(3, 3, c)
        g = jnp.asarray(
            rng.randn(b, h, w, c).astype(np.float32)
        ).astype(jnp.bfloat16)

        def _errs(x, k3, k4, g):
            ref = _dw_xla(x, k4).astype(jnp.float32)
            out = _fwd_pallas(x, k3).astype(jnp.float32)
            e1 = jnp.max(jnp.abs(ref - out)) / (jnp.max(jnp.abs(ref)) + 1e-6)
            _, vjp = jax.vjp(lambda kk: _dw_xla(x, kk), k4)
            dk_ref = vjp(g)[0].astype(jnp.float32).reshape(3, 3, c)
            dk = _fgrad_pallas(x, g)
            e2 = jnp.max(jnp.abs(dk_ref - dk)) / (
                jnp.max(jnp.abs(dk_ref)) + 1e-6
            )
            return e1, e2

        try:
            err, dk_err = map(float, jax.jit(_errs)(x, k3, k4, g))
        except Exception as e:  # XLA's dk grad-conv AOT failure mode
            err, dk_err = float("nan"), float("nan")
            log(f"  (error reduction failed: {str(e)[:80]})")

        io_us = (2 * b * h * w * c) * 2 / 819e9 * 1e6
        t_xla = loop_time(lambda xx, kk: _dw_xla(xx, kk), x, k4)
        t_pal = loop_time(lambda xx, kk: _fwd_pallas(xx, kk), x, k3)
        t_dk = loop_time(lambda xx, gg: _fgrad_pallas(xx, gg), x, g)
        log(
            f"b{b} {h}x{w}x{c:<5d} | {io_us:6.1f} | {t_xla*1e6:8.1f}"
            f" {t_pal*1e6:8.1f} {t_xla/t_pal:5.2f} | {t_dk*1e6:8.1f} |"
            f" ({err:.1e}, {dk_err:.1e})"
        )


if __name__ == "__main__":
    main()
