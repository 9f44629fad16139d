"""LR / weight-decay schedules.

Parity: mutils/native_scaler.py:64-88 (cosine_scheduler per-step array:
linear warmup + half-cosine) and mutils/lr_utils.py:73-91 (per-iteration
warmup + half-cosine used by the classification path).

Schedules are host-side numpy arrays indexed by step and fed to the jitted
train step as scalar arguments — identical semantics to the reference's
per-step param-group assignment, zero recompilation.
"""

import math

import numpy as np


def cosine_scheduler(base_value, final_value, epochs, niter_per_ep,
                     warmup_epochs=0, start_warmup_value=0, warmup_steps=-1):
    warmup_schedule = np.array([])
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    if warmup_epochs > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)
    n = epochs * niter_per_ep - warmup_iters
    iters = np.arange(n)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(math.pi * iters / n))
    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def adjust_learning_rate(base_lr, min_lr, epoch, total_epochs, warmup_epochs):
    """Per-iteration half-cycle cosine with warmup (lr_utils.py:73-91).
    `epoch` may be fractional (epoch + i/steps)."""
    if epoch < warmup_epochs:
        return base_lr * epoch / warmup_epochs
    return min_lr + (base_lr - min_lr) * 0.5 * (
        1.0 + math.cos(math.pi * (epoch - warmup_epochs) / (total_epochs - warmup_epochs)))
