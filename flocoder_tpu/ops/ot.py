"""Minibatch optimal-transport pairing, fully on device.

Reference: flocoder/ot.py. Its active default (``compute_ot_pairing_approximate``,
ot.py:63-78) computes a B×B distance matrix then runs a sequential Python loop
doing greedy nearest-unused-target assignment — O(B²) work with B host-synced
argmin calls. TPU-native redesign:

- The distance matrix is one batched matmul (MXU-friendly ‖s‖² + ‖t‖² − 2 s·tᵀ).
- The greedy loop becomes a ``lax.fori_loop`` over rows with a used-target mask
  held on device — zero host syncs, jit/pjit-compatible, identical assignment
  to the reference's greedy semantics.
- A Sinkhorn-plan variant (reference's ``compute_ot_pairing_vanilla``,
  ot.py:5-26) runs log-domain Sinkhorn on device and then the same greedy
  extraction over the plan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "pairwise_sqdist",
    "compute_ot_pairing",
    "compute_ot_pairing_greedy",
    "compute_ot_pairing_sinkhorn",
]


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances between rows of a (N,D) and b (M,D),
    computed as one matmul — the MXU path."""
    a = a.reshape(a.shape[0], -1)
    b = b.reshape(b.shape[0], -1)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 + b2.T - 2.0 * cross, 0.0)


def _greedy_assign(scores: jax.Array, minimize: bool) -> jax.Array:
    """Row-by-row greedy assignment: row i takes the best not-yet-used column.
    Matches reference ot.py:70-78 (minimize) / :17-24 (maximize over plan)."""
    B = scores.shape[0]
    big = jnp.asarray(jnp.inf, scores.dtype)
    if not minimize:
        scores = -scores  # reduce to minimization

    def body(i, carry):
        indices, used = carry
        row = jnp.where(used, big, scores[i])
        j = jnp.argmin(row)
        return indices.at[i].set(j), used.at[j].set(True)

    indices0 = jnp.zeros((B,), dtype=jnp.int32)
    used0 = jnp.zeros((B,), dtype=bool)
    indices, _ = jax.lax.fori_loop(0, B, body, (indices0, used0))
    return indices


@jax.jit
def compute_ot_pairing_greedy(source: jax.Array, target: jax.Array) -> jax.Array:
    """Greedy nearest-unused-target pairing (the reference's active default,
    ot.py:63-78). Returns int32 permutation ``indices`` s.t. ``target[indices]``
    pairs with ``source``."""
    d = pairwise_sqdist(source, target)
    return _greedy_assign(d, minimize=True)


@partial(jax.jit, static_argnames=("n_iters",))
def compute_ot_pairing_sinkhorn(source: jax.Array, target: jax.Array,
                                reg: float = 0.1, n_iters: int = 100) -> jax.Array:
    """Sinkhorn-plan pairing (reference: ot.py:5-26, POT-based). Log-domain
    Sinkhorn via ``lax.scan`` on device, then greedy max-probability extraction
    identical to the reference's plan→permutation conversion."""
    B = source.shape[0]
    M = pairwise_sqdist(source, target)
    M = M / jnp.maximum(M.max(), 1e-12)  # normalize like POT does internally
    log_mu = jnp.full((B,), -jnp.log(B))
    log_nu = jnp.full((B,), -jnp.log(B))
    Mr = -M / reg

    def step(carry, _):
        f, g = carry
        f = reg * (log_mu - jax.scipy.special.logsumexp((Mr + g[None, :] / reg), axis=1))
        g = reg * (log_nu - jax.scipy.special.logsumexp((Mr + f[:, None] / reg), axis=0))
        return (f, g), None

    (f, g), _ = jax.lax.scan(step, (jnp.zeros(B), jnp.zeros(B)), None, length=n_iters)
    log_plan = Mr + f[:, None] / reg + g[None, :] / reg
    return _greedy_assign(log_plan, minimize=False)


def compute_ot_pairing(source: jax.Array, target: jax.Array,
                       method: str = "greedy") -> jax.Array:
    """Main entry (reference: ot.py:80-84). ``method`` ∈ {'greedy','sinkhorn'};
    greedy is the default, matching the reference's active choice."""
    if method == "sinkhorn":
        return compute_ot_pairing_sinkhorn(source, target)
    return compute_ot_pairing_greedy(source, target)
