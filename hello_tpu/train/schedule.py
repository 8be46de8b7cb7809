"""Learning-rate schedules: SGDR cosine warm restarts + sine warmup.

Functional equivalents of the reference schedulers
(reference python/LRSchedulers.py:10-126), expressed as optax-compatible
``schedule(step) -> lr`` callables over fractional "epochs" (the reference
steps them per batch with ``epoch = j + i/len(loader)``).
"""

from __future__ import annotations

import math


def cosine_warm_restarts(base_lr: float, t0: int, t_mult: int = 1,
                         eta_min: float = 0.0, steps_per_epoch: int = 1):
    """SGDR: eta_min + (base-eta_min) * (1 + cos(pi*Tcur/Ti)) / 2."""

    def schedule(step):
        epoch = float(step) / steps_per_epoch
        if epoch >= t0 and t_mult > 1:
            n = int(math.log(epoch / t0 * (t_mult - 1) + 1, t_mult))
            t_cur = epoch - t0 * (t_mult ** n - 1) / (t_mult - 1)
            t_i = t0 * t_mult ** n
        elif epoch >= t0:
            t_cur = epoch % t0
            t_i = t0
        else:
            t_cur = epoch
            t_i = t0
        return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * t_cur / t_i)) / 2

    return schedule


def sine_warmup_restarts(base_lr: float, t0: int, t_mult: int = 1,
                         eta_min: float = 0.0, steps_per_epoch: int = 1):
    """Warmup variant: phase-shifted cosine rising from eta_min to base_lr."""
    cos = cosine_warm_restarts(base_lr, t0, t_mult, eta_min, steps_per_epoch)

    def schedule(step):
        # cos(x + pi) mirror: lr = eta_min + (base-eta_min)*(1+cos(pi*Tcur/Ti+pi))/2
        cos_lr = cos(step)
        return eta_min + (base_lr - eta_min) - (cos_lr - eta_min)

    return schedule


def entropy_decay(initial: float, decay: float):
    """Per-step decayed entropy-regulariser coefficient
    (the reference multiplies its buffer by ``decay`` each forward,
    MixtureOfExpertsTools.py:165)."""

    def coefficient(step):
        return initial * (decay ** step)

    return coefficient
