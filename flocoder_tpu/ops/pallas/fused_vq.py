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
      pick_l = first-min one-hot of d    (VPU: iota-based first-min pick)
      x -= pick_l · C_l                  (one-hot matmul — gather-free)
  z_q = sum of selected codes; indices (TN, L)

Mosaic discipline (learned the hard way — the first two formulations
hard-crashed the TPU compiler with layout.h implicit-dim CHECKs): every
value inside the kernels is rank-2 (or a scalar); no rank-1 refs or
stores, no ``argmin`` (rank-1), no rank-3/4 intermediates. The same
construct set as the hardware-proven NA2D kernels (ops/pallas/na2d.py):
rank-2 broadcasted_iota, static slices, matmuls, full-block stores.

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


def _first_min_onehot(d: jax.Array) -> jax.Array:
    """Rank-2 (N, K) distances → rank-2 float one-hot of the FIRST minimum
    per row (argmin tie-break semantics, without materializing a rank-1
    index vector — and without cumsum, which Mosaic doesn't lower)."""
    K = d.shape[1]
    dmin = jnp.min(d, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    cand = jnp.where(d <= dmin, lane, K)
    kfirst = jnp.min(cand, axis=1, keepdims=True)
    return (lane == kfirst).astype(jnp.float32)


def _rvq_levels_rank2(x, cb_ref, L: int, K: int, hi):
    """Unrolled residual-VQ on (N, D) tokens; returns (z_q (N, D),
    idx (N, L) int32) with rank-2-only intermediates."""
    N = x.shape[0]
    residual = x
    z_q = jnp.zeros_like(x)
    idx_acc = jnp.zeros((N, L), jnp.float32)
    # int iota only: Mosaic rejects float tpu.iota results
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (N, L), 1)
    for lvl in range(L):
        cb = cb_ref[lvl]                                   # (K, D)
        r2 = jnp.sum(residual * residual, axis=1, keepdims=True)   # (N, 1)
        c2 = jnp.sum(cb * cb, axis=1, keepdims=True)                # (K, 1)
        d = r2 + c2.T - 2.0 * jnp.dot(residual, cb.T, precision=hi,
                                      preferred_element_type=jnp.float32)
        pick = _first_min_onehot(d)                        # (N, K)
        q = jnp.dot(pick, cb, precision=hi,
                    preferred_element_type=jnp.float32)    # (N, D)
        z_q = z_q + q
        residual = residual - q
        kidx = jnp.sum(
            pick * jax.lax.broadcasted_iota(jnp.int32, (N, K),
                                            1).astype(jnp.float32),
            axis=1, keepdims=True)                         # (N, 1)
        idx_acc = idx_acc + jnp.where(lane_l == lvl, kidx, 0.0)
    return z_q, idx_acc.astype(jnp.int32)


def _kernel(z_ref, w_ref, b_ref, cb_ref, zq_ref, idx_ref, *, L: int, K: int,
            D: int):
    hi = jax.lax.Precision.HIGHEST  # fp32 MXU passes: argmin correctness
    x = jnp.dot(z_ref[...], w_ref[...], precision=hi,
                preferred_element_type=jnp.float32) + b_ref[...]
    z_q, idx = _rvq_levels_rank2(x, cb_ref, L, K, hi)
    zq_ref[...] = z_q.astype(zq_ref.dtype)
    idx_ref[...] = idx


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
            pl.BlockSpec((1, D), lambda i: (0, 0)),
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
    )(z, w, b.reshape(1, D), codebooks)
    return z_q[:N], idx[:N]


# ---------------------------------------------------------------------------
# whole compression tail + RVQ (VERDICT r1 item 5: extend the fusion window
# to the 3×3 compression tail, reference codecs.py:435-440 + :504-521)

def _tail_kernel(h_ref, w1_ref, b1_ref, gs_ref, gb_ref, cw_ref, cbias_ref,
                 cb_ref, zq_ref, idx_ref, *, L: int, K: int, D: int,
                 groups: int, eps: float, TB: int, H: int, W: int):
    hi = jax.lax.Precision.HIGHEST
    HW = H * W
    N = TB * HW
    x = h_ref[...].astype(jnp.float32)             # (TB, H, W, Din) block
    din = x.shape[-1]
    # 1×1 compress (the only wide matmul — MXU): (N, Din) @ (Din, D)
    y = jnp.dot(x.reshape(N, din), w1_ref[...], precision=hi,
                preferred_element_type=jnp.float32) + b1_ref[...]
    # GroupNorm per image per group (flax semantics: stats over H·W·C/g,
    # biased variance). Rank-2 masked reductions; TB·groups unrolled —
    # all tiny at the production sizes (tile_b=4 default for VMEM fit at
    # 128², groups=2).
    gsz = D // groups
    row_img = jax.lax.broadcasted_iota(jnp.int32, (N, D), 0) // HW
    lane_grp = jax.lax.broadcasted_iota(jnp.int32, (N, D), 1) // gsz
    denom = float(HW * gsz)
    ynorm = jnp.zeros_like(y)
    for bi in range(TB):
        for g in range(groups):
            mask = ((row_img == bi) & (lane_grp == g)).astype(jnp.float32)
            sl = y * mask
            # keepdims (1,1) reductions: stay rank-2 end to end
            m = jnp.sum(sl, axis=(0, 1), keepdims=True) / denom
            v = (jnp.sum(sl * sl, axis=(0, 1), keepdims=True) / denom
                 - m * m)
            ynorm = ynorm + mask * ((y - m) * jax.lax.rsqrt(v + eps))
    y = jax.nn.silu(ynorm * gs_ref[...] + gb_ref[...])   # (N, D)
    # 3×3 conv, pad 1, on the flattened (N, D) map: each tap is a static
    # row-roll + validity mask + (N, D) @ (D, D) matmul. A roll by
    # (dy·W + dx) crosses image boundaries only at rows the y-validity mask
    # already zeroes, so no rank-4 pad/slice is needed.
    row = jax.lax.broadcasted_iota(jnp.int32, (N, D), 0)
    yy = (row // W) % H
    xx = row % W
    out = jnp.zeros((N, D), jnp.float32) + cbias_ref[...]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shift = dy * W + dx
            # roll(0) lowers to a zero-size slice Mosaic rejects
            src = y if shift == 0 else jnp.roll(y, -shift, axis=0)
            valid = ((yy + dy >= 0) & (yy + dy < H) &
                     (xx + dx >= 0) & (xx + dx < W)).astype(jnp.float32)
            tap_i = (dy + 1) * 3 + (dx + 1)
            tap = cw_ref[tap_i * D:(tap_i + 1) * D, :]    # (D, D)
            out = out + jnp.dot(src * valid, tap, precision=hi,
                                preferred_element_type=jnp.float32)
    z_q, idx = _rvq_levels_rank2(out, cb_ref, L, K, hi)
    zq_ref[...] = z_q.astype(zq_ref.dtype)
    idx_ref[...] = idx


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
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
            pl.BlockSpec((9 * D, D), lambda i: (0, 0)),
            pl.BlockSpec((1, D), lambda i: (0, 0)),
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
    )(h, w1, b1.reshape(1, D), gn_scale.reshape(1, D),
      gn_bias.reshape(1, D), cw2, conv_b.reshape(1, D), codebooks)
    z_q = z_q.reshape(Bp, H, W, D)[:B]
    idx = idx.reshape(Bp, H, W, L)[:B]
    return z_q, idx
