"""Pallas TPU kernel: fused 1×1 compression conv + residual-VQ encode.

The second custom-kernel target named by BASELINE.json's north star
("codecs.py VQGAN/SD-VAE encoder-decoder becomes Pallas-fused
conv+vector-quantize kernels"): the encoder's final 1×1 projection to
``vq_embedding_dim`` (reference: codecs.py:436) and the RVQ nearest-code
search (codecs.py:504-521) run as ONE kernel — the projected activations
never round-trip to HBM between the conv and the codebook lookup.

Per grid step (a tile of N tokens):
  x = z·W + b                           (MXU: (TN, Din) @ (Din, D))
  for each RVQ level l:                  (unrolled; L is small)
      d = ‖x‖² + ‖C_l‖² − 2 x·C_lᵀ       (MXU: (TN, D) @ (D, K))
      idx_l = argmin d                   (VPU)
      x -= C_l[idx_l]  (via one-hot matmul — gather-free on TPU)
  z_q = sum of selected codes; indices (TN, L)

Inference path (pre-encode with quantize=true, codebook tracking); training
uses ops.rvq which also owns the EMA state updates.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_compress_vq", "fused_compress_tail_vq"]


def _kernel(z_ref, w_ref, b_ref, cb_ref, zq_ref, idx_ref, *, L: int, K: int,
            D: int):
    hi = jax.lax.Precision.HIGHEST  # fp32 MXU passes: argmin correctness
    x = jnp.dot(z_ref[...], w_ref[...], precision=hi,
                preferred_element_type=jnp.float32) + b_ref[...]
    residual = x
    z_q = jnp.zeros_like(x)
    for lvl in range(L):
        cb = cb_ref[lvl]  # (K, D)
        r2 = jnp.sum(residual * residual, axis=1, keepdims=True)
        c2 = jnp.sum(cb * cb, axis=1)[None, :]
        d = r2 + c2 - 2.0 * jnp.dot(residual, cb.T, precision=hi,
                                    preferred_element_type=jnp.float32)
        idx = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(idx, K, dtype=jnp.float32)
        q = jnp.dot(onehot, cb, precision=hi,
                    preferred_element_type=jnp.float32)
        z_q = z_q + q
        residual = residual - q
        idx_ref[:, lvl] = idx.astype(jnp.int32)
    zq_ref[...] = z_q.astype(zq_ref.dtype)


def fused_compress_vq(z: jax.Array, w: jax.Array, b: jax.Array,
                      codebooks: jax.Array, tile_n: int = 512
                      ) -> Tuple[jax.Array, jax.Array]:
    """``z`` (N, Din) tokens, ``w`` (Din, D), ``b`` (D,), ``codebooks``
    (L, K, D) → ``(z_q (N, D), indices (N, L))``.

    Pads N up to a tile multiple; runs interpreted off-TPU (tests), Mosaic on
    TPU.
    """
    N, Din = z.shape
    D = w.shape[1]
    L, K, _ = codebooks.shape
    n_pad = (-N) % tile_n
    if n_pad:
        z = jnp.concatenate([z, jnp.zeros((n_pad, Din), z.dtype)], axis=0)
    n_tiles = z.shape[0] // tile_n

    kernel = functools.partial(_kernel, L=L, K=K, D=D)
    z_q, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, Din), lambda i: (i, 0)),
            pl.BlockSpec((Din, D), lambda i: (0, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((L, K, D), lambda i: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tile_n, D), lambda i: (i, 0)),
            pl.BlockSpec((tile_n, L), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((z.shape[0], D), z.dtype),
            jax.ShapeDtypeStruct((z.shape[0], L), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(z, w, b, codebooks)
    return z_q[:N], idx[:N]


# ---------------------------------------------------------------------------
# whole compression tail + RVQ (VERDICT r1 item 5: extend the fusion window
# to the 3×3 compression tail, reference codecs.py:435-440 + :504-521)

def _tail_kernel(h_ref, w1_ref, b1_ref, gs_ref, gb_ref, cw_ref, cbias_ref,
                 cb_ref, zq_ref, idx_ref, *, L: int, K: int, D: int,
                 groups: int, eps: float, TB: int, H: int, W: int):
    # Mosaic-robust formulation (the first version hard-crashed the TPU
    # compiler, layout.h CHECK on implicit-dim layouts): no lane-dim
    # slicing/concat (GroupNorm uses group-indicator masks instead), conv
    # weights arrive as a 2-D (9·D, D) ref sliced on the sublane dim, RVQ
    # indices are stored per level into a 2-D (N, L) ref — exactly the
    # constructs the hardware-validated fused_compress_vq kernel uses.
    hi = jax.lax.Precision.HIGHEST
    x = h_ref[...].astype(jnp.float32)            # (TB, H, W, Din)
    din = x.shape[-1]
    # 1×1 compress (the only wide matmul — MXU): (TB·H·W, Din) @ (Din, D)
    y = jnp.dot(x.reshape(TB * H * W, din), w1_ref[...], precision=hi,
                preferred_element_type=jnp.float32) + b1_ref[...]
    # GroupNorm per image per group (flax semantics: stats over H·W·C/g,
    # biased variance). Group membership via a lane mask — no lane slicing.
    y3 = y.reshape(TB, H * W, D)
    gsz = D // groups
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (1, 1, D), 2) // gsz
    denom = float(H * W * gsz)
    ynorm = jnp.zeros_like(y3)
    for g in range(groups):
        mask = (lane_group == g).astype(jnp.float32)   # (1, 1, D)
        sl = y3 * mask
        m = jnp.sum(sl, axis=(1, 2), keepdims=True) / denom
        v = jnp.sum(sl * sl, axis=(1, 2), keepdims=True) / denom - m * m
        ynorm = ynorm + mask * ((y3 - m) * jax.lax.rsqrt(v + eps))
    y3 = ynorm * gs_ref[...] + gb_ref[...]
    y = jax.nn.silu(y3).reshape(TB, H, W, D)
    # 3×3 conv, pad 1: nine shifted (TB·H·W, D) @ (D, D) matmuls
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((TB * H * W, D), jnp.float32) + cbias_ref[...]
    for dy in range(3):
        for dx in range(3):
            patch = yp[:, dy:dy + H, dx:dx + W, :].reshape(TB * H * W, D)
            tap = cw_ref[(dy * 3 + dx) * D:(dy * 3 + dx + 1) * D, :]
            out = out + jnp.dot(patch, tap, precision=hi,
                                preferred_element_type=jnp.float32)
    # residual-VQ levels, unrolled; per-level column stores into the 2-D ref
    residual = out
    z_q = jnp.zeros_like(out)
    for lvl in range(L):
        cb = cb_ref[lvl]  # (K, D)
        r2 = jnp.sum(residual * residual, axis=1, keepdims=True)
        c2 = jnp.sum(cb * cb, axis=1)[None, :]
        d = r2 + c2 - 2.0 * jnp.dot(residual, cb.T, precision=hi,
                                    preferred_element_type=jnp.float32)
        idx = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(idx, K, dtype=jnp.float32)
        q = jnp.dot(onehot, cb, precision=hi,
                    preferred_element_type=jnp.float32)
        z_q = z_q + q
        residual = residual - q
        idx_ref[:, lvl] = idx.astype(jnp.int32)
    zq_ref[...] = z_q.astype(zq_ref.dtype)


def fused_compress_tail_vq(h: jax.Array, w1: jax.Array, b1: jax.Array,
                           gn_scale: jax.Array, gn_bias: jax.Array,
                           conv_w: jax.Array, conv_b: jax.Array,
                           codebooks: jax.Array, groups: int,
                           eps: float = 1e-5, tile_b: int = 8
                           ) -> Tuple[jax.Array, jax.Array]:
    """The codec's ENTIRE compression tail fused with the RVQ encode in one
    kernel: 1×1 compress → GroupNorm → SiLU → 3×3 conv → L residual-VQ
    levels, with no HBM round-trips between stages (reference:
    codecs.py:435-440 compress head + :504-521 quantize).

    ``h`` (B, H, W, Din) pre-compress activations, ``w1`` (Din, D) + ``b1``
    the 1×1 kernel, ``conv_w`` (3, 3, D, D) HWIO + ``conv_b`` the 3×3 tail,
    ``codebooks`` (L, K, D) → ``(z_q (B, H, W, D), indices (B, H, W, L))``.
    GroupNorm statistics are per-image, so the grid tiles the batch.
    """
    B, H, W, Din = h.shape
    D = w1.shape[1]
    L, K, _ = codebooks.shape
    tile_b = min(tile_b, B)
    b_pad = (-B) % tile_b
    if b_pad:
        h = jnp.concatenate(
            [h, jnp.zeros((b_pad, H, W, Din), h.dtype)], axis=0)
    n_tiles = h.shape[0] // tile_b
    Bp = h.shape[0]
    tok = tile_b * H * W           # tokens per tile
    cw2 = conv_w.reshape(9 * D, D)  # (dy·3+dx)·D rows: 2-D sublane slicing

    kernel = functools.partial(_tail_kernel, L=L, K=K, D=D, groups=groups,
                               eps=eps, TB=tile_b, H=H, W=W)
    z_q, idx = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_b, H, W, Din), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((Din, D), lambda i: (0, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((9 * D, D), lambda i: (0, 0)),
            pl.BlockSpec((D,), lambda i: (0,)),
            pl.BlockSpec((L, K, D), lambda i: (0, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tok, D), lambda i: (i, 0)),
            pl.BlockSpec((tok, L), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp * H * W, D), h.dtype),
            jax.ShapeDtypeStruct((Bp * H * W, L), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(h, w1, b1, gn_scale, gn_bias, cw2, conv_b, codebooks)
    z_q = z_q.reshape(Bp, H, W, D)[:B]
    idx = idx.reshape(Bp, H, W, L)[:B]
    return z_q, idx
