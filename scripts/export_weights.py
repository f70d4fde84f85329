"""Export an orbax training run to a single-file .npz weights artifact.

The artifact (utils/weights.py) is what you commit, ship, or hand to
`evaluate.py --ckpt_dir foo.npz` / `infer.py --ckpt_dir foo.npz`:
fp16 params + fp32 BN stats + {config, step, source} meta, ~13 MB for the
SSD300-MobileNet flagship.

Run: python scripts/export_weights.py --ckpt_dir /tmp/train_real2 \\
        --config ssd_mobilenet_300 --out artifacts/ssd300_synth9k.npz
Add --ema to export the EMA shadow instead of the raw params.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--out", required=True)
    p.add_argument("--ema", action="store_true",
                   help="export the EMA shadow (run must have used "
                        "--ema_decay)")
    p.add_argument("--dtype", choices=("float16", "float32"),
                   default="float16")
    args = p.parse_args(argv)

    # host-only task: keep it off the tunneled TPU (decide BEFORE any
    # device touch — backends freeze at first jax.devices(); CLAUDE.md).
    # In-process callers (tests) may already hold a backend: leave it be.
    import jax
    import jax._src.xla_bridge as xb

    if not getattr(xb, "_backends", None):
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.configs.train_configs import TrainConfig
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.train_step import create_train_state
    from bdd100k_tpu.utils.checkpoint import CheckpointManager
    from bdd100k_tpu.utils.weights import save_detector_npz

    det_cfg = get_config(args.config)
    bundle = build_detector(det_cfg)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    state, step = CheckpointManager(args.ckpt_dir).restore_latest(
        state, params_only=True, prefer_ema=args.ema
    )
    if step == 0:
        raise SystemExit(f"no checkpoint found under {args.ckpt_dir}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    meta = save_detector_npz(
        out,
        jax.device_get(state.params),
        jax.device_get(state.batch_stats),
        config_name=det_cfg.name,
        step=step,
        source="ema" if args.ema else "params",
        param_dtype=np.dtype(args.dtype),
    )
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB): {meta}")


if __name__ == "__main__":
    main()
