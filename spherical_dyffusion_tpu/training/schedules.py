"""Learning-rate schedules.

Equivalents of the reference LR schedulers (src/utilities/lr_scheduler.py:
LinearWarmupCosineAnnealingLR at 111-195, warmup-cosine lambdas at 14-110,
name dispatch at 196), expressed as optax schedules.
"""

from __future__ import annotations

import optax

__all__ = ["linear_warmup_cosine", "get_scheduler"]


def linear_warmup_cosine(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """Linear warmup followed by cosine annealing to eta_min."""
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_start_lr,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=eta_min,
    )


def get_scheduler(
    name: str,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    eta_min: float = 0.0,
) -> optax.Schedule:
    name = (name or "constant").lower()
    if name in ("constant", "none"):
        return optax.constant_schedule(base_lr)
    if name in ("cosine", "cosine_annealing"):
        return optax.cosine_decay_schedule(base_lr, max(total_steps, 1), alpha=eta_min / max(base_lr, 1e-12))
    if name in ("linear_warmup_cosine", "warmup_cosine", "linearwarmupcosineannealinglr"):
        return linear_warmup_cosine(base_lr, warmup_steps, total_steps, eta_min=eta_min)
    raise ValueError(f"Unknown scheduler {name!r}")
