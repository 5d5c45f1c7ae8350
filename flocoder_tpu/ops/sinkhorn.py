"""Sinkhorn divergence, on device in pure JAX.

Reference: flocoder/metrics.py:17-54 uses geomloss ``SamplesLoss("sinkhorn",
p=2, blur=0.05)`` (KeOps CUDA) plus a chunked wrapper. At flocoder's batch
sizes (≤2048 points) a dense log-domain Sinkhorn in jitted JAX saturates the
TPU fine — no KeOps analog needed (SURVEY.md §2c).

Implements the debiased Sinkhorn divergence
``S(a,b) = OT_eps(a,b) - (OT_eps(a,a) + OT_eps(b,b))/2``
with geomloss conventions: cost C(x,y) = ‖x−y‖²/2 for p=2, eps = blur**p.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .ot import pairwise_sqdist

__all__ = ["sinkhorn_divergence", "sinkhorn_loss", "sinkhorn_loss_chunked"]


def _eps_schedule(C_max, eps_target, n_iters):
    """ε-annealing (geomloss 'scaling' heuristic): geometric descent from the
    cost diameter down to the target blur², then hold — converges orders of
    magnitude faster than fixed-ε iteration at small blur."""
    decay = 0.5
    n_anneal = max(n_iters - 10, 1)
    steps = jnp.arange(n_iters)
    eps0 = jnp.maximum(C_max, eps_target)
    ann = eps0 * decay ** steps
    return jnp.maximum(ann, eps_target)


def _sym_potential(C, eps_target, n_iters):
    """Symmetric-problem potential for OT_eps(a,a) via annealed fixed-point
    iteration with averaging (geomloss-style)."""
    n = C.shape[0]
    log_w = jnp.full((n,), -jnp.log(n))
    eps_sched = _eps_schedule(jnp.max(C), eps_target, n_iters)

    def step(f, eps):
        f_new = -eps * jax.scipy.special.logsumexp(
            (f[None, :] - C) / eps + log_w[None, :], axis=1)
        return 0.5 * (f + f_new), None

    f, _ = jax.lax.scan(step, jnp.zeros((n,)), eps_sched)
    return f


def _ot_cost(x, y, eps_target, n_iters):
    """Entropic OT dual cost between uniform clouds x (N,D), y (M,D), with
    ε-annealing."""
    C = pairwise_sqdist(x, y) / 2.0
    n, m = C.shape[0], C.shape[1]
    log_mu = jnp.full((n,), -jnp.log(n))
    log_nu = jnp.full((m,), -jnp.log(m))
    eps_sched = _eps_schedule(jnp.max(C), eps_target, n_iters)

    def step(carry, eps):
        f, g = carry
        f = -eps * jax.scipy.special.logsumexp(
            (g[None, :] - C) / eps + log_nu[None, :], axis=1)
        g = -eps * jax.scipy.special.logsumexp(
            (f[:, None] - C) / eps + log_mu[:, None], axis=0)
        return (f, g), None

    (f, g), _ = jax.lax.scan(step, (jnp.zeros(n), jnp.zeros(m)), eps_sched)
    return jnp.sum(jnp.exp(log_mu) * f) + jnp.sum(jnp.exp(log_nu) * g)


@partial(jax.jit, static_argnames=("n_iters",))
def sinkhorn_divergence(x: jax.Array, y: jax.Array, blur: float = 0.05,
                        n_iters: int = 100) -> jax.Array:
    """Debiased Sinkhorn divergence with p=2, matching the reference's
    geomloss settings (metrics.py:40-44). Inputs are flattened to (N, D)."""
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    y = y.reshape(y.shape[0], -1).astype(jnp.float32)
    eps = blur ** 2
    oxy = _ot_cost(x, y, eps, n_iters)
    fx = _sym_potential(pairwise_sqdist(x, x) / 2.0, eps, n_iters)
    fy = _sym_potential(pairwise_sqdist(y, y) / 2.0, eps, n_iters)
    oxx = 2.0 * jnp.mean(fx)
    oyy = 2.0 * jnp.mean(fy)
    return jnp.maximum(oxy - 0.5 * (oxx + oyy), 0.0)


def sinkhorn_loss(x, y, blur: float = 0.05, n_iters: int = 100):
    """Alias with the reference's name (metrics.py:40)."""
    return sinkhorn_divergence(x, y, blur=blur, n_iters=n_iters)


def sinkhorn_loss_chunked(x, y, blur: float = 0.05, chunk_size: int = 512,
                          n_iters: int = 100):
    """Chunked variant (reference: metrics.py:20-38): average of per-chunk
    divergences, bounding the B×B cost matrix memory."""
    n = min(x.shape[0], y.shape[0])
    if n <= chunk_size:
        return sinkhorn_divergence(x[:n], y[:n], blur=blur, n_iters=n_iters)
    vals = []
    for i in range(0, n - chunk_size + 1, chunk_size):
        vals.append(sinkhorn_divergence(x[i:i + chunk_size], y[i:i + chunk_size],
                                        blur=blur, n_iters=n_iters))
    return jnp.mean(jnp.stack(vals))
