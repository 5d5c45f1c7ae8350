"""Residual vector quantization (RVQ), pure-functional and mesh-aware.

The reference uses ``vector-quantize-pytorch``'s ``ResidualVQ`` with stateful
EMA codebooks (reference: codecs.py:456-468 — codebook_size, num_quantizers=
codebook_levels, k-means init, EMA decay 0.95, dead-code reseed threshold 2,
rotation-trick gradients, commitment loss). TPU-native redesign per
SURVEY.md §2c/§7.8:

- Codebooks live in an explicit ``RVQState`` pytree; the EMA update is a pure
  function returning new state — jit/scan/pjit-compatible.
- The nearest-code search is one fused matmul+argmin per level (MXU path);
  cluster statistics are one-hot matmuls (also MXU).
- Under data parallelism the per-batch cluster stats are ``psum``-reduced over
  the mesh axis before the EMA fold — the single genuine cross-device
  communication requirement in the algorithm family (SURVEY.md §2d).
- K-means init on the first training batch runs a fixed number of Lloyd
  iterations inside ``lax.cond`` (static shapes, no host sync).
- Rotation-trick gradient transport (Fifty et al., "Restructuring Vector
  Quantization with the Rotation Trick") instead of plain straight-through,
  matching the reference's ``rotation_trick=True``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["RVQState", "rvq_init", "rvq_apply", "rvq_encode", "rvq_decode",
           "rvq_lookup", "orthogonal_reg_loss"]


@struct.dataclass
class RVQState:
    codebooks: jax.Array   # (L, K, D)
    ema_counts: jax.Array  # (L, K)
    ema_sums: jax.Array    # (L, K, D)
    initted: jax.Array     # () bool


def rvq_init(rng: jax.Array, levels: int, codebook_size: int, dim: int,
             dtype=jnp.float32) -> RVQState:
    cb = jax.random.normal(rng, (levels, codebook_size, dim), dtype) * 0.02
    return RVQState(
        codebooks=cb,
        ema_counts=jnp.zeros((levels, codebook_size), dtype),
        ema_sums=jnp.zeros((levels, codebook_size, dim), dtype),
        initted=jnp.zeros((), bool),
    )


def _sq_dists(z: jax.Array, cb: jax.Array) -> jax.Array:
    """(N,D) x (K,D) → (N,K) squared distances via one matmul."""
    z2 = jnp.sum(z * z, axis=1, keepdims=True)
    c2 = jnp.sum(cb * cb, axis=1)[None, :]
    return z2 + c2 - 2.0 * jnp.dot(z, cb.T, preferred_element_type=jnp.float32)


def _kmeans(rng: jax.Array, z: jax.Array, k: int, iters: int = 10) -> jax.Array:
    """Lloyd iterations initialized from random batch vectors (the reference's
    kmeans_init, vector-quantize-pytorch semantics)."""
    n = z.shape[0]
    idx = jax.random.randint(rng, (k,), 0, n)
    centers = z[idx]

    def step(centers, _):
        d = _sq_dists(z, centers)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=z.dtype)  # (N, K)
        counts = onehot.sum(axis=0)  # (K,)
        sums = jnp.dot(onehot.T, z, preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        centers = jnp.where(counts[:, None] > 0, new.astype(z.dtype), centers)
        return centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def _rotation_trick(z: jax.Array, q: jax.Array) -> jax.Array:
    """Gradient-transporting quantization output: forward equals q, backward
    rotates grads from q back onto z via the (stop-gradded) Householder pair
    that maps ẑ→q̂, scaled by |q|/|z|."""
    eps = 1e-6
    z_norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
    q_norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    e = z / jnp.maximum(z_norm, eps)
    q_hat = q / jnp.maximum(q_norm, eps)
    r = e + q_hat
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), eps)
    r = jax.lax.stop_gradient(r)
    e_sg = jax.lax.stop_gradient(e)
    q_hat_sg = jax.lax.stop_gradient(q_hat)
    scale = jax.lax.stop_gradient(q_norm / jnp.maximum(z_norm, eps))
    rot = (z - 2.0 * r * jnp.sum(r * z, axis=-1, keepdims=True)
           + 2.0 * q_hat_sg * jnp.sum(e_sg * z, axis=-1, keepdims=True))
    return scale * rot


def _bcast0(x: jax.Array, axis_name) -> jax.Array:
    """Broadcast shard 0's value to every device along ``axis_name`` (str or
    tuple of names). Used to keep data-dependent random picks (k-means seeds,
    dead-code reseeds) identical across shards so the replicated RVQ state
    stays bitwise-replicated under shard_map."""
    names = (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
    for nm in names:
        x = jax.lax.all_gather(x, nm)[0]
    return x


def _quantize_level(z: jax.Array, cb: jax.Array, rotation_trick: bool):
    d = _sq_dists(z, cb)
    idx = jnp.argmin(d, axis=1)
    q = cb[idx]
    if rotation_trick:
        q_out = _rotation_trick(z, jax.lax.stop_gradient(q))
    else:
        q_out = z + jax.lax.stop_gradient(q - z)  # straight-through
    return q_out, q, idx


def orthogonal_reg_loss(codebooks: jax.Array) -> jax.Array:
    """Codebook orthogonality penalty ‖ĈĈᵀ − I‖²/K² on L2-normalized codes,
    averaged over levels (the reference configures
    ``orthogonal_reg_weight=0.2`` on its ResidualVQ, codecs.py:466)."""
    L, K, D = codebooks.shape
    cb = codebooks / jnp.maximum(
        jnp.linalg.norm(codebooks, axis=-1, keepdims=True), 1e-8)
    gram = jnp.einsum("lkd,ljd->lkj", cb, cb,
                      preferred_element_type=jnp.float32)
    eye = jnp.eye(K, dtype=gram.dtype)[None]
    return jnp.mean(jnp.sum((gram - eye) ** 2, axis=(1, 2)) / (K * K))


def rvq_apply(state: RVQState, z: jax.Array, train: bool = False,
              rng: Optional[jax.Array] = None, decay: float = 0.95,
              commitment_weight: float = 0.5, dead_threshold: float = 2.0,
              rotation_trick: bool = True, axis_name: Optional[str] = None,
              orthogonal_reg_weight: float = 0.0,
              ) -> Tuple[jax.Array, jax.Array, jax.Array, RVQState]:
    """Quantize flat tokens ``z`` (N, D).

    Returns ``(z_q, indices (N, L), commit_loss, new_state)`` — the reference
    interface shape (codecs.py:504-521, flattened NHWC tokens in, residual sum
    out). When ``train`` and ``rng`` are given, EMA codebook updates, k-means
    first-batch init, and dead-code reseeding produce the new state; otherwise
    state passes through unchanged.
    """
    L, K, D = state.codebooks.shape
    N = z.shape[0]
    zf = z.astype(jnp.float32)

    # defensive device-array cast: checkpoint-restored states may carry numpy
    # leaves, which cannot be fancy-indexed by tracers
    state = RVQState(codebooks=jnp.asarray(state.codebooks),
                     ema_counts=jnp.asarray(state.ema_counts),
                     ema_sums=jnp.asarray(state.ema_sums),
                     initted=jnp.asarray(state.initted))
    codebooks = state.codebooks
    if train and rng is not None:
        def do_init(cbs):
            def init_level(carry, inp):
                residual, = carry
                cb_rng, _level = inp
                centers = _kmeans(cb_rng, residual, K)
                d = _sq_dists(residual, centers)
                q = centers[jnp.argmin(d, axis=1)]
                return (residual - q,), centers
            rngs = jax.random.split(rng, L)
            (_,), centers = jax.lax.scan(
                init_level, (zf,), (rngs, jnp.arange(L)))
            return centers

        codebooks = jax.lax.cond(state.initted,
                                 lambda c: c, do_init, codebooks)
        if axis_name is not None:
            # k-means ran on the LOCAL shard; adopt shard 0's centers so the
            # replicated codebook state stays identical on every device
            codebooks = _bcast0(codebooks, axis_name)

    residual = zf
    z_q = jnp.zeros_like(zf)
    indices = []
    commit_loss = jnp.zeros((), jnp.float32)
    new_counts, new_sums, new_cbs = [], [], []

    for lvl in range(L):
        cb = codebooks[lvl]
        q_out, q_raw, idx = _quantize_level(residual, cb, rotation_trick)
        z_q = z_q + q_out
        indices.append(idx)
        # per-level commitment: pull encoder output toward its code
        commit_loss = commit_loss + commitment_weight * jnp.mean(
            (residual - jax.lax.stop_gradient(q_raw)) ** 2)

        if train and rng is not None:
            onehot = jax.nn.one_hot(idx, K, dtype=jnp.float32)
            counts = onehot.sum(axis=0)
            sums = jnp.dot(onehot.T, jax.lax.stop_gradient(residual),
                           preferred_element_type=jnp.float32)
            if axis_name is not None:
                counts = jax.lax.psum(counts, axis_name)
                sums = jax.lax.psum(sums, axis_name)
            ema_c = state.ema_counts[lvl] * decay + counts * (1 - decay)
            ema_s = state.ema_sums[lvl] * decay + sums * (1 - decay)
            # Laplace-smoothed EMA codebook (vector-quantize-pytorch semantics)
            n_total = jnp.sum(ema_c)
            smoothed = (ema_c + 1e-5) / (n_total + K * 1e-5) * n_total
            cb_new = ema_s / jnp.maximum(smoothed[:, None], 1e-5)
            # Dead-code reseed: expired codes ← random batch residuals
            reseed_rng = jax.random.fold_in(rng, lvl + 1)
            pick = jax.random.randint(reseed_rng, (K,), 0, N)
            dead = ema_c < dead_threshold
            reseed_vecs = jax.lax.stop_gradient(residual)[pick]
            if axis_name is not None:
                # picks came from the LOCAL shard's residuals; broadcast
                # shard 0's (K, D) candidates so replication is preserved
                reseed_vecs = _bcast0(reseed_vecs, axis_name)
            cb_new = jnp.where(dead[:, None], reseed_vecs, cb_new)
            ema_c = jnp.where(dead, dead_threshold + 1.0, ema_c)
            ema_s = jnp.where(dead[:, None], cb_new * (dead_threshold + 1.0), ema_s)
            new_counts.append(ema_c)
            new_sums.append(ema_s)
            new_cbs.append(cb_new)

        residual = residual - jax.lax.stop_gradient(q_raw)

    indices = jnp.stack(indices, axis=1)  # (N, L)

    if orthogonal_reg_weight:
        commit_loss = commit_loss + orthogonal_reg_weight * \
            orthogonal_reg_loss(codebooks)

    if train and rng is not None:
        new_state = RVQState(
            codebooks=jnp.stack(new_cbs),
            ema_counts=jnp.stack(new_counts),
            ema_sums=jnp.stack(new_sums),
            initted=jnp.ones((), bool),
        )
    else:
        new_state = state

    return z_q.astype(z.dtype), indices, commit_loss, new_state


def rvq_encode(state: RVQState, z: jax.Array) -> jax.Array:
    """Tokens → per-level indices (N, L), no state change."""
    _, indices, _, _ = rvq_apply(state, z, train=False)
    return indices


def rvq_lookup(state: RVQState, indices: jax.Array) -> jax.Array:
    """Per-level indices (N, L) → reconstructed vectors (N, D): sum of the
    selected codes across levels."""
    L = state.codebooks.shape[0]
    out = jnp.zeros((indices.shape[0], state.codebooks.shape[2]),
                    state.codebooks.dtype)
    for lvl in range(L):
        out = out + state.codebooks[lvl][indices[:, lvl]]
    return out


rvq_decode = rvq_lookup
