"""Pre-warm the persistent compilation cache for the driver-facing paths.

Compiles (and caches) the flagship SSD-MobileNet-300 inference program at
the three bench batch shapes for the CURRENT backend, plus the multichip
dryrun's CPU train step — so a later `python bench.py` or driver gate run
on this machine skips the multi-minute compiles (the cache is namespaced
per host-CPU fingerprint; see utils/compilation_cache.py).

Run: python scripts/warm_cache.py [--wire auto] [--batch_sizes 32,128,1]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--wire", choices=("auto", "rgb", "yuv420"),
                   default="auto")
    p.add_argument("--batch_sizes", default="32,128,1")
    p.add_argument("--skip_dryrun", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.data.pipeline import resolve_wire
    from bdd100k_tpu.models.detector import build_detector

    wire = resolve_wire(args.wire)
    cfg = get_config(args.config)
    bundle = build_detector(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))

    def infer_fn(variables, images_u8):
        images = preprocess_eval_batch(images_u8, cfg.image_size)
        loc, cls = bundle.model.apply(variables, images, train=False)
        return bundle.postprocess(loc, cls)

    infer_step = jax.jit(infer_fn)

    s = cfg.image_size

    def warm_input(b):
        if wire == "yuv420":
            return (
                jnp.zeros((b, s, s), jnp.uint8),
                jnp.zeros((b, s // 2, s // 2, 2), jnp.uint8),
            )
        return jnp.zeros((b, s, s, 3), jnp.uint8)

    from benchmarks.common import fetch_fence

    batch_sizes = [int(x) for x in args.batch_sizes.split(",")]
    for b in batch_sizes:
        t0 = time.monotonic()
        # fetch-fence, not block_until_ready: a fresh executable's block can
        # return before the device server has really run it (CLAUDE.md), and
        # absorbing that one-time server-side setup is this script's job
        fetch_fence(infer_step(variables, warm_input(b)).scores)
        print(f"warmed {args.config} b{b} ({wire}): "
              f"{time.monotonic() - t0:.1f}s", flush=True)

    # bench.py's device-resident phase is a SEPARATE program (a fori_loop
    # wrapping the inference step) — warm it at the device batch size too
    from benchmarks.common import resident_infer_rate

    b = max(batch_sizes)
    t0 = time.monotonic()
    resident_infer_rate(infer_fn, variables, warm_input(b), b,
                        compile_only=True)
    print(f"warmed resident fori_loop b{b} ({wire}): "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    if not args.skip_dryrun:
        # the driver's 8-device virtual-CPU gate, in a clean subprocess
        r = subprocess.run(
            [sys.executable, "-c",
             "import __graft_entry__ as g; g.dryrun_multichip(8)"],
            cwd=REPO,
        )
        print(f"dryrun warm: rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
