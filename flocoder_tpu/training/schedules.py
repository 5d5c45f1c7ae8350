"""Learning-rate and batch-size schedules.

``cosine_warm_restarts_decay`` reimplements the reference's
``CosineAnnealingWarmRestartsDecay`` (flocoder/general.py:142-171): torch
CosineAnnealingWarmRestarts stepped per EPOCH, whose base LR is multiplied by
``decay`` at each warm restart. Here it is a pure optax-style
``schedule(step) -> lr`` computed in closed form (jit-friendly, no Python
state), parameterized by ``steps_per_epoch``.

``batch_size_schedule`` closes the reference's README.md:143 TODO ("Try
variable size scheduler" → the bs-scheduler package): a host-side
``bs(epoch) -> int`` with StepBS / MultiStepBS semantics. TPU constraint the
GPU package doesn't have: every distinct batch size is a distinct XLA
executable, so sizes are quantized to ``multiple_of`` (the mesh's data-axis
size) and the policies produce a small discrete set — O(log(max/base))
compiles, each cached after its first epoch."""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["cosine_warm_restarts_decay", "batch_size_schedule"]


def batch_size_schedule(base_bs: int, gamma: float = 2.0,
                        step_every: int = 0, milestones=(),
                        max_bs: int | None = None, multiple_of: int = 1):
    """Returns ``bs(epoch) -> int`` (epoch is 1-based, matching the loops).

    Policies (mirroring bs-scheduler's StepBS / MultiStepBS):
      - ``step_every > 0``: multiply by ``gamma`` every ``step_every`` epochs.
      - ``milestones``: multiply by ``gamma`` at each listed epoch.
    Both quantize down to a multiple of ``multiple_of`` (mesh divisibility)
    and clamp to ``[multiple_of, max_bs]``. With neither knob set the
    schedule is constant ``base_bs``.
    """
    if step_every and milestones:
        raise ValueError("set bs_step_every or bs_milestones, not both")
    if gamma <= 0:
        raise ValueError("bs_gamma must be > 0")
    milestones = sorted(int(m) for m in milestones)
    cap = int(max_bs) if max_bs else None

    def bs(epoch: int) -> int:
        if step_every:
            n = max(int(epoch) - 1, 0) // int(step_every)
        else:
            n = sum(1 for m in milestones if int(epoch) >= m)
        value = int(base_bs * (float(gamma) ** n))
        if cap is not None:
            value = min(value, cap)
        value = (value // multiple_of) * multiple_of
        return max(value, multiple_of)

    return bs


def cosine_warm_restarts_decay(base_lr: float, T_0: int = 50, T_mult: int = 2,
                               decay: float = 0.6, eta_min: float = 0.0,
                               steps_per_epoch: int = 1):
    """Returns ``schedule(count)`` where ``count`` is the optimizer step.

    Cycle n spans ``T_0 * T_mult**n`` epochs; within a cycle,
    ``lr = eta_min + (base_lr*decay**n - eta_min) * (1 + cos(pi*T_cur/T_i))/2``
    (reference: general.py:149-171, torch CosineAnnealingWarmRestarts math).
    """
    if T_mult < 1:
        raise ValueError("T_mult must be >= 1")

    def schedule(count):
        epoch = jnp.asarray(count, jnp.float32) / steps_per_epoch
        if T_mult == 1:
            n = jnp.floor(epoch / T_0)
            t_cur = epoch - n * T_0
            t_i = jnp.asarray(T_0, jnp.float32)
        else:
            # epochs before cycle n: T_0 (T_mult^n - 1)/(T_mult - 1)
            ratio = epoch * (T_mult - 1) / T_0 + 1.0
            n = jnp.floor(jnp.log(ratio) / jnp.log(float(T_mult)))
            start = T_0 * (jnp.power(float(T_mult), n) - 1.0) / (T_mult - 1)
            t_i = T_0 * jnp.power(float(T_mult), n)
            t_cur = epoch - start
        lr_max = base_lr * jnp.power(decay, n)
        return eta_min + (lr_max - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return schedule
