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

__all__ = ["fused_compress_vq"]


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
