"""Device-resident EMA of a parameter pytree.

Reference: train_flow.py:33-71 keeps a CPU-resident shadow copy with
host↔device transfers every step — a GPU-memory workaround SURVEY.md §7.6
says to drop. Here the EMA is just another device pytree updated inside the
jitted train step (one fused multiply-add per leaf, no transfers)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_init", "ema_update"]


def ema_init(params):
    return jax.tree_util.tree_map(jnp.asarray, params)


def ema_update(ema, params, decay: float = 0.999):
    """shadow ← decay·shadow + (1-decay)·params (reference: train_flow.py:47-55)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params)
