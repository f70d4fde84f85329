"""Training hyperparameter config (SURVEY.md §2.4)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32               # global batch (split across data axis)
    max_boxes: int = 100               # GT padding (BDD100K p99 ≈ 40+)
    optimizer: str = "momentum"        # "momentum" | "adam"
    learning_rate: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # piecewise LR decay (fractions of total steps → multiplier)
    lr_boundaries: tuple[float, ...] = (0.66, 0.86)
    lr_decays: tuple[float, ...] = (0.1, 0.1)
    warmup_steps: int = 500
    total_steps: int = 120_000
    grad_clip_norm: float = 10.0
    # Exponential moving average of params (TF1-era detectors evaluated the
    # tf.train.ExponentialMovingAverage shadow variables; same semantics
    # here, incl. the (1+step)/(10+step) warmup ramp). 0 disables.
    ema_decay: float = 0.0
    checkpoint_every: int = 1000
    keep_checkpoints: int = 5
    log_every: int = 50
    seed: int = 0
