"""Pallas TPU kernel for 2-D neighborhood attention (the NATTEN replacement).

This is the centerpiece custom kernel named by BASELINE.json's north star
(SURVEY.md §2c). Strategy, sized for where the codec actually runs
neighborhood attention (32² and 16² feature maps, codecs.py:416-431):

- The spatial grid is tiled by ROW BANDS: each program owns a (TILE_H × W)
  block of queries for one (batch·head) slice and loads the K/V row halo
  [row_start, row_start + TILE_H + ks − 1) via a dynamic slice (K/V stay
  resident per program; at these resolutions a full head slice fits VMEM).
- Attention is computed as two dense MXU matmuls — scores
  (TILE_H·W, KH·W) = Q Kᵀ and out = softmax(scores)·V — with the clamped k×k
  window enforced by a broadcasted-iota mask. Dense-with-mask wastes
  (TILE_H+ks−1)·W / ks² key-FLOPs versus a gather formulation but keeps the
  MXU saturated instead of scattering through HBM; at W≤32 that trade wins.
- Borders use NATTEN's clamped-window semantics: every query attends to
  exactly ks×ks keys, windows slide inward at edges (verified against the
  gather oracle in tests/test_neighborhood_attention.py).

Backward: a hand-written Pallas kernel (``_na2d_bwd_kernel`` below) — one
program per (batch·head) slice, statically unrolled row bands, dQ/dK/dV
accumulated with pad-and-add halo handling. Gradients are oracle-checked at
the production k=7/8-head config (tests/test_pallas_na2d.py) and the full
fwd+bwd pass beat the banded-XLA fallback 3.1–7.3× on hardware
(docs/ROADMAP.md round-2 acceptance).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["na2d_pallas"]


def _na2d_kernel(q_ref, k_ref, v_ref, o_ref, *, ks: int, H: int, W: int,
                 dh: int, tile_h: int, scale: float):
    rt = pl.program_id(1)
    r0 = rt * tile_h
    KH = min(tile_h + ks - 1, H)
    row_start = jnp.clip(r0 - ks // 2, 0, H - KH)

    q = q_ref[0].reshape(tile_h * W, dh) * scale
    k = k_ref[0, pl.ds(row_start, KH)].reshape(KH * W, dh)
    v = v_ref[0, pl.ds(row_start, KH)].reshape(KH * W, dh)

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)

    nq, nk = tile_h * W, KH * W
    qi = r0 + jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0) // W
    qj = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0) % W
    ki = row_start + jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) // W
    kj = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) % W
    rs = jnp.clip(qi - ks // 2, 0, H - ks)
    cs = jnp.clip(qj - ks // 2, 0, W - ks)
    valid = ((ki >= rs) & (ki < rs + ks) & (kj >= cs) & (kj < cs + ks))

    scores = jnp.where(valid, scores, -jnp.inf)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(tile_h, W, dh).astype(o_ref.dtype)


def _pick_tile_h(H: int) -> int:
    """Row-band height. Hardware sweep (benchmarks/na2d_tile_sweep.py, v5e,
    B=16/8-head/k=7): at 16² a single full-height band wins (bf16 fwd+bwd
    1215 µs vs 1308 at tile 8 — the band's K/V halo spans the whole slice
    anyway so smaller tiles only add grid overhead); at 32² tile 8 is best
    (2010 µs fwd+bwd bf16; 16/32 regress the bwd). So: whole grid when it's
    small, else 8-row bands."""
    if H <= 16:
        return H
    for t in (8, 4, 2, 1):
        if H % t == 0:
            return t
    return 1


def _na2d_fwd_impl(q, k, v, kernel_size: int, heads: int, scale: float):
    B, H, W, C = q.shape
    dh = C // heads
    ks = min(kernel_size, H, W)
    tile_h = _pick_tile_h(H)

    def to_heads(x):
        # (B,H,W,C) → (B*heads, H, W, dh)
        x = x.reshape(B, H, W, heads, dh)
        return x.transpose(0, 3, 1, 2, 4).reshape(B * heads, H, W, dh)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)

    kernel = functools.partial(_na2d_kernel, ks=ks, H=H, W=W, dh=dh,
                               tile_h=tile_h, scale=scale)
    grid = (B * heads, H // tile_h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, W, dh), lambda bh, rt: (bh, rt, 0, 0)),
            pl.BlockSpec((1, H, W, dh), lambda bh, rt: (bh, 0, 0, 0)),
            pl.BlockSpec((1, H, W, dh), lambda bh, rt: (bh, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, dh),
                               lambda bh, rt: (bh, rt, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * heads, H, W, dh), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qh, kh, vh)

    out = out.reshape(B, heads, H, W, dh).transpose(0, 2, 3, 1, 4)
    return out.reshape(B, H, W, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def na2d_pallas(q, k, v, kernel_size: int = 7, heads: int = 8,
                scale: Optional[float] = None):
    """Neighborhood attention, Pallas forward. NHWC in/out; C = heads·dh."""
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    return _na2d_fwd_impl(q, k, v, kernel_size, heads, scale)


def _fwd(q, k, v, kernel_size, heads, scale):
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    return _na2d_fwd_impl(q, k, v, kernel_size, heads, scale), (q, k, v)


def _band_mask(r0: int, row_start: int, ks: int, H: int, W: int,
               tile_h: int, KH: int):
    """Clamped-window validity mask for one row band (static geometry)."""
    nq, nk = tile_h * W, KH * W
    qi = r0 + jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0) // W
    qj = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 0) % W
    ki = row_start + jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) // W
    kj = jax.lax.broadcasted_iota(jnp.int32, (nq, nk), 1) % W
    rs = jnp.clip(qi - ks // 2, 0, H - ks)
    cs = jnp.clip(qj - ks // 2, 0, W - ks)
    return (ki >= rs) & (ki < rs + ks) & (kj >= cs) & (kj < cs + ks)


def _na2d_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                     ks: int, H: int, W: int, dh: int, tile_h: int,
                     scale: float):
    """Hand-written backward: one program per (batch·head) slice, row bands
    statically unrolled (all slices static → Mosaic-friendly). Per band the
    standard softmax-attention backward runs as dense MXU matmuls under the
    clamped-window mask; dK/dV halo contributions accumulate in registers
    across the (overlapping) bands before one store."""
    q = q_ref[0].reshape(H * W, dh)
    k = k_ref[0].reshape(H * W, dh)
    v = v_ref[0].reshape(H * W, dh)
    g = g_ref[0].reshape(H * W, dh).astype(jnp.float32)
    dk = jnp.zeros((H * W, dh), jnp.float32)
    dv = jnp.zeros((H * W, dh), jnp.float32)
    KH = min(tile_h + ks - 1, H)
    hi = jnp.float32

    def halo_pad(x, row_start):
        # place a (KH·W, dh) halo contribution at its rows of the full map
        # (static pad — scatter-free accumulation across overlapping bands)
        return jnp.pad(x, ((row_start * W, (H - row_start - KH) * W),
                           (0, 0)))

    for t in range(H // tile_h):
        r0 = t * tile_h
        row_start = min(max(r0 - ks // 2, 0), H - KH)
        qs = q[r0 * W:(r0 + tile_h) * W] * scale        # (nq, dh)
        kh = k[row_start * W:(row_start + KH) * W]      # (nk, dh)
        vh = v[row_start * W:(row_start + KH) * W]
        gs = g[r0 * W:(r0 + tile_h) * W]

        scores = jnp.dot(qs, kh.T, preferred_element_type=hi)
        valid = _band_mask(r0, row_start, ks, H, W, tile_h, KH)
        scores = jnp.where(valid, scores, -jnp.inf)
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        probs = jnp.exp(scores)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)

        dP = jnp.dot(gs, vh.astype(jnp.float32).T,
                     preferred_element_type=hi)
        delta = jnp.sum(probs * dP, axis=-1, keepdims=True)
        dS = probs * (dP - delta)                       # (nq, nk) f32

        dq_band = jnp.dot(dS, kh.astype(jnp.float32),
                          preferred_element_type=hi) * scale
        dq_ref[0, r0:r0 + tile_h] = dq_band.reshape(
            tile_h, W, dh).astype(dq_ref.dtype)
        dk = dk + halo_pad(jnp.dot(dS.T, qs.astype(jnp.float32),
                                   preferred_element_type=hi), row_start)
        dv = dv + halo_pad(jnp.dot(probs.T, gs, preferred_element_type=hi),
                           row_start)

    dk_ref[0] = dk.reshape(H, W, dh).astype(dk_ref.dtype)
    dv_ref[0] = dv.reshape(H, W, dh).astype(dv_ref.dtype)


def _na2d_bwd_impl(q, k, v, g, kernel_size: int, heads: int, scale: float):
    B, H, W, C = q.shape
    dh = C // heads
    ks = min(kernel_size, H, W)
    tile_h = _pick_tile_h(H)

    def to_heads(x):
        x = x.reshape(B, H, W, heads, dh)
        return x.transpose(0, 3, 1, 2, 4).reshape(B * heads, H, W, dh)

    def from_heads(x):
        x = x.reshape(B, heads, H, W, dh).transpose(0, 2, 3, 1, 4)
        return x.reshape(B, H, W, C)

    kernel = functools.partial(_na2d_bwd_kernel, ks=ks, H=H, W=W, dh=dh,
                               tile_h=tile_h, scale=scale)
    full = pl.BlockSpec((1, H, W, dh), lambda bh: (bh, 0, 0, 0))
    shp = jax.ShapeDtypeStruct((B * heads, H, W, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B * heads,),
        in_specs=[full, full, full, full],
        out_specs=(full, full, full),
        out_shape=(shp, shp, shp),
        interpret=jax.default_backend() != "tpu",
    )(to_heads(q), to_heads(k), to_heads(v), to_heads(g))
    return from_heads(dq), from_heads(dk), from_heads(dv)


def _bwd(kernel_size, heads, scale, residuals, g):
    q, k, v = residuals
    if scale is None:
        scale = (q.shape[-1] // heads) ** -0.5
    return _na2d_bwd_impl(q, k, v, g, kernel_size, heads, scale)


na2d_pallas.defvjp(_fwd, _bwd)
