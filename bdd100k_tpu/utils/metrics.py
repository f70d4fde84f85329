"""Structured metrics/observability (SURVEY.md §5.5).

Reference mechanism: TensorBoard summaries + stdout logs. Rebuild: per-step
JSONL under runs/<name>/metrics.jsonl (machine-readable for the bench
harness) + stdout step lines + optional TensorBoard event files when a
writer backend is importable (gated — not a hard dep).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


class MetricsLogger:
    def __init__(self, run_dir: str | Path, name: str = "train",
                 stdout: bool = True, write_files: bool = True):
        """`write_files=False` for non-zero hosts in multi-host runs: they
        keep stdout logging but don't race process 0 on the JSONL/TB files
        (the standard one-writer convention)."""
        self.run_dir = Path(run_dir)
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self._file = (
            open(self.run_dir / f"{name}.jsonl", "a", buffering=1)
            if write_files
            else None
        )
        self.stdout = stdout
        self._tb = self._try_tensorboard() if write_files else None
        self._t0 = time.monotonic()

    def _try_tensorboard(self):
        try:  # flax ships a TB summary writer when tensorboard is available
            from flax.metrics import tensorboard  # type: ignore

            return tensorboard.SummaryWriter(str(self.run_dir / "tb"))
        except Exception:
            return None

    def log(self, step: int, metrics: dict) -> None:
        scalars = {
            k: float(v) for k, v in metrics.items() if _is_scalar(v)
        }
        rec = {"step": int(step), "t": time.monotonic() - self._t0, **scalars}
        if self._file is not None:
            self._file.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.scalar(k, v, step)
        if self.stdout:
            body = " ".join(f"{k}={v:.5g}" for k, v in scalars.items())
            print(f"step {step}: {body}", flush=True)

    def image(self, step: int, name: str, image: "np.ndarray") -> None:
        """Log an HWC uint8 image summary (e.g. drawn detections — the
        reference's TensorBoard image summaries, SURVEY.md §2.4). No-op
        when no TB backend is importable."""
        if self._tb is not None:
            self._tb.image(name, image, step)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._tb is not None:
            self._tb.close()


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
