"""Learning-rate schedules: SGDR cosine warm restarts + sine warmup.

Functional equivalents of the reference schedulers
(reference python/LRSchedulers.py:10-126), expressed as optax-compatible
``schedule(step) -> lr`` callables over fractional "epochs" (the reference
steps them per batch with ``epoch = j + i/len(loader)``).

These are invoked on a *traced* step inside the jitted train step, so the
whole computation uses jnp ops and ``jnp.where`` in place of Python
branches (math.cos / ``if epoch >= t0`` would raise ConcretizationTypeError
under jit).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_warm_restarts(base_lr: float, t0: int, t_mult: int = 1,
                         eta_min: float = 0.0, steps_per_epoch: int = 1):
    """SGDR: eta_min + (base-eta_min) * (1 + cos(pi*Tcur/Ti)) / 2."""
    t0 = float(t0)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) / steps_per_epoch
        if t_mult > 1:
            # restart index n = floor(log_tmult(epoch/t0*(tmult-1)+1));
            # epsilon keeps exact restart boundaries (epoch == t0*(2^n-1))
            # from rounding down in float32.
            arg = jnp.maximum(epoch / t0 * (t_mult - 1) + 1.0, 1.0)
            n = jnp.floor(jnp.log(arg) / math.log(t_mult) + 1e-6)
            pow_n = jnp.power(float(t_mult), n)
            restart_t_cur = epoch - t0 * (pow_n - 1.0) / (t_mult - 1)
            restart_t_i = t0 * pow_n
        else:
            restart_t_cur = jnp.mod(epoch, t0)
            restart_t_i = jnp.full_like(epoch, t0)
        in_first_period = epoch < t0
        t_cur = jnp.where(in_first_period, epoch, restart_t_cur)
        t_i = jnp.where(in_first_period, t0, restart_t_i)
        return eta_min + (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

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
