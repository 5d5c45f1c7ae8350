"""Mixture-of-Experts routing + expert-parallel GEGLU compute.

New TPU-native capability (the reference is single-device and dense —
SURVEY.md §2d lists expert parallelism as absent): a static-shape,
MXU-friendly MoE layer for the HDiT family (models/hdit.py:
MoEFeedForwardBlock), with the expert dimension split over the mesh
'model' axis inside the production shard_map train step.

TPU-first design:
- routing uses ONE-HOT DISPATCH/COMBINE MATMULS, never gathers: tokens →
  (T, E, C) dispatch/combine tensors → per-expert batches via einsum. All
  shapes are static (capacity C is computed from the static token count),
  so the whole layer is three large batched matmuls on the MXU plus a
  softmax — exactly the shape XLA tiles well.
- expert parallelism follows the ``ring_attention_replicated`` pattern
  (parallel/ring_attention.py): inputs/params stay REPLICATED over the
  mesh axis, each shard computes only its E/axis_size experts (a static
  slice by ``lax.axis_index``), and one ``psum`` over ICI combines the
  token outputs — the O(E·C·d·d_ff) expert FLOPs split axis_size ways.
  The custom_vjp backward is expert-parallel too (VERDICT r3 #2): each
  shard differentiates only its local expert slice, then ONE psum over
  ICI combines the token-cotangent partials (each expert contributes
  additively to d_flat) and all_gathers along the expert axis reassemble
  the expert-sliced gradients (dispatch/combine/weights) — so gradients
  are full and value-identical on every shard and the train step's usual
  pmean stays a typing no-op, while the O(E·C·d·d_ff) backward FLOPs
  split axis_size ways like the forward's.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["moe_capacity", "moe_routing", "moe_geglu_apply",
           "moe_geglu_replicated", "load_balance_loss"]


def moe_capacity(n_tokens: int, n_experts: int, top_k: int,
                 capacity_factor: float = 1.25) -> int:
    """Static per-expert token capacity: ceil(T·K/E · factor), ≥ 1."""
    return max(int(math.ceil(n_tokens * top_k / n_experts
                             * capacity_factor)), 1)


def moe_routing(logits: jax.Array, top_k: int, capacity: int
                ) -> Tuple[jax.Array, jax.Array, dict]:
    """Top-k routing with capacity truncation → dispatch/combine tensors.

    ``logits``: (T, E) router outputs (fp32 recommended). Returns
    ``dispatch`` (T, E, C) {0,1}-valued, ``combine`` (T, E, C) gate-weighted
    (rows sum to ≤ 1; exactly 1 when no assignment hit the capacity wall),
    and routing stats for the auxiliary losses — all fp32.

    Priority is k-major then token order (every token's first choice beats
    any token's second choice), the Switch-Transformer convention; ties in
    top_k resolve to the lowest expert index (deterministic on TPU).
    """
    T, E = logits.shape
    K = min(top_k, E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)   # (T, E)
    gate_vals, gate_idx = lax.top_k(probs, K)                     # (T, K)
    gate_vals = gate_vals / jnp.maximum(
        gate_vals.sum(axis=-1, keepdims=True), 1e-9)
    onehot = jax.nn.one_hot(gate_idx, E, dtype=jnp.float32)       # (T, K, E)

    # rank of each (token, k) assignment within its expert's queue,
    # k-major priority: flatten to (K·T, E), cumulative count per expert
    pr = onehot.transpose(1, 0, 2).reshape(K * T, E)
    ranks = (jnp.cumsum(pr, axis=0) - 1.0) * pr                   # (K·T, E)
    rank_kt = ranks.sum(axis=-1).reshape(K, T).transpose(1, 0)    # (T, K)
    keep = (rank_kt < capacity).astype(jnp.float32)               # (T, K)

    pos = jax.nn.one_hot(rank_kt.astype(jnp.int32), capacity,
                         dtype=jnp.float32)                       # (T, K, C)
    sel = onehot * keep[..., None]                                # (T, K, E)
    dispatch = jnp.einsum("tke,tkc->tec", sel, pos)
    combine = jnp.einsum("tke,tkc,tk->tec", sel, pos, gate_vals)

    stats = {
        # fraction of tokens whose FIRST choice is expert e (pre-capacity) —
        # the density term of the Switch load-balance loss
        "density": onehot[:, 0, :].mean(axis=0),                  # (E,)
        "prob_mean": probs.mean(axis=0),                          # (E,)
        "dropped_frac": 1.0 - keep.mean(),
        "logits": logits.astype(jnp.float32),
    }
    return dispatch, combine, stats


def load_balance_loss(stats: dict, n_experts: int,
                      z_weight: float = 1e-3) -> jax.Array:
    """Switch-Transformer auxiliary loss: E·Σ_e density_e·prob_mean_e
    (minimized at uniform routing, where it equals 1) plus a router z-loss
    that keeps logits bounded (bf16-friendly)."""
    lb = n_experts * jnp.sum(stats["density"] * stats["prob_mean"])
    z = jnp.mean(jax.nn.logsumexp(stats["logits"], axis=-1) ** 2)
    return lb + z_weight * z


def moe_geglu_apply(flat: jax.Array, dispatch: jax.Array,
                    combine: jax.Array, w_up: jax.Array,
                    w_down: jax.Array) -> jax.Array:
    """Replicated (single-device) expert compute.

    ``flat`` (T, d) tokens, ``dispatch``/``combine`` (T, E, C) from
    ``moe_routing``, ``w_up`` (E, d, 2·d_ff), ``w_down`` (E, d_ff, d).
    Returns (T, d). GEGLU per expert, matching the dense
    ``FeedForwardBlock`` math (models/hdit.py)."""
    dt = flat.dtype
    x_e = jnp.einsum("tec,td->ecd", dispatch.astype(dt), flat)
    h = jnp.einsum("ecd,edf->ecf", x_e, w_up.astype(dt))
    a, b = jnp.split(h, 2, axis=-1)
    h = jax.nn.gelu(a, approximate=False) * b
    y_e = jnp.einsum("ecf,efd->ecd", h, w_down.astype(dt))
    return jnp.einsum("tec,ecd->td", combine.astype(dt), y_e)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def moe_geglu_replicated(flat: jax.Array, dispatch: jax.Array,
                         combine: jax.Array, w_up: jax.Array,
                         w_down: jax.Array, ep_axis: str,
                         ep_axis_size: int) -> jax.Array:
    """Expert-parallel GEGLU for REPLICATED inputs/params inside a
    ``shard_map`` whose mesh has manual axis ``ep_axis``:

    - forward: each shard statically slices its E/ep_axis_size experts
      (by ``lax.axis_index``) from the weights AND the dispatch/combine
      tensors, runs ``moe_geglu_apply`` on that slice, and ONE ``psum``
      over ICI sums the per-expert partial outputs (each token's output is
      a sum over experts, so the reduction is exact).
    - backward (custom_vjp): each shard runs the VJP of ITS expert slice
      only; a psum combines the token cotangents (experts contribute
      additively to d_flat) and expert-axis all_gathers reassemble the
      sliced gradients — gradients stay full and value-identical on every
      shard, so the surrounding train step's pmean is a typing no-op (the
      exact contract of ``ring_attention_replicated``), with the backward
      FLOPs split over the axis like the forward's.

    Degenerates to ``moe_geglu_apply`` at ``ep_axis_size == 1``. E must be
    divisible by ``ep_axis_size``. Take gradients INSIDE the shard_map.
    """
    if ep_axis_size == 1:
        return moe_geglu_apply(flat, dispatch, combine, w_up, w_down)
    E = w_up.shape[0]
    if E % ep_axis_size:
        raise ValueError(f"n_experts={E} not divisible by "
                         f"ep_axis_size={ep_axis_size}")
    e_loc = E // ep_axis_size
    off = lax.axis_index(ep_axis) * e_loc
    out = moe_geglu_apply(
        flat,
        lax.dynamic_slice_in_dim(dispatch, off, e_loc, axis=1),
        lax.dynamic_slice_in_dim(combine, off, e_loc, axis=1),
        lax.dynamic_slice_in_dim(w_up, off, e_loc, axis=0),
        lax.dynamic_slice_in_dim(w_down, off, e_loc, axis=0))
    return lax.psum(out, ep_axis)


def _moe_fwd(flat, dispatch, combine, w_up, w_down, ep_axis, ep_axis_size):
    out = moe_geglu_replicated(flat, dispatch, combine, w_up, w_down,
                               ep_axis, ep_axis_size)
    return out, (flat, dispatch, combine, w_up, w_down)


def _moe_bwd(ep_axis, ep_axis_size, res, g):
    flat, dispatch, combine, w_up, w_down = res
    if ep_axis_size == 1:
        _, vjp = jax.vjp(moe_geglu_apply, flat, dispatch, combine,
                         w_up, w_down)
        return vjp(g.astype(flat.dtype))
    E = w_up.shape[0]
    e_loc = E // ep_axis_size
    off = lax.axis_index(ep_axis) * e_loc
    _, vjp = jax.vjp(
        moe_geglu_apply, flat,
        lax.dynamic_slice_in_dim(dispatch, off, e_loc, axis=1),
        lax.dynamic_slice_in_dim(combine, off, e_loc, axis=1),
        lax.dynamic_slice_in_dim(w_up, off, e_loc, axis=0),
        lax.dynamic_slice_in_dim(w_down, off, e_loc, axis=0))
    # the forward's psum makes every shard's output cotangent the full g;
    # each local VJP therefore yields this shard's expert-slice gradients
    d_flat, d_disp_loc, d_comb_loc, d_wu_loc, d_wd_loc = vjp(
        g.astype(flat.dtype))
    # experts contribute additively to the token gradient → one psum;
    # expert-sliced gradients reassemble by all_gather in axis-index order
    d_flat = lax.psum(d_flat, ep_axis)
    d_disp = lax.all_gather(d_disp_loc, ep_axis, axis=1, tiled=True)
    d_comb = lax.all_gather(d_comb_loc, ep_axis, axis=1, tiled=True)
    d_wu = lax.all_gather(d_wu_loc, ep_axis, axis=0, tiled=True)
    d_wd = lax.all_gather(d_wd_loc, ep_axis, axis=0, tiled=True)
    return d_flat, d_disp, d_comb, d_wu, d_wd


moe_geglu_replicated.defvjp(_moe_fwd, _moe_bwd)
