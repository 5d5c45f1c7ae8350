"""2-D neighborhood (local-window) attention — the NATTEN replacement.

The reference codec uses NATTEN's CUDA kernels for k×k sliding-window
attention inside encoder/decoder blocks (reference: codecs.py:93-145,
``NATTENBlock`` kernel_size=7, 8 heads; install notes README.md:58-64). This
module provides TPU-native equivalents (SURVEY.md §2c: "the centerpiece
custom kernel"):

- ``na2d_reference``: exact clamped-window semantics via advanced-indexing
  gathers — the XLA fallback and the correctness oracle for tests.
- ``na2d``: dispatcher that routes to the Pallas tiled kernel on TPU
  (ops/pallas/na2d.py) and to the gather fallback elsewhere.

Window semantics match NATTEN: every query attends to exactly k×k keys; at
borders the window slides inward (clamped), it does not shrink.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["na2d", "na2d_reference", "na2d_banded", "window_starts"]


def window_starts(n: int, kernel_size: int) -> jax.Array:
    """Clamped window start index for each of n query positions."""
    pos = jnp.arange(n)
    return jnp.clip(pos - kernel_size // 2, 0, n - kernel_size)


def na2d_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                   kernel_size: int = 7, heads: int = 8,
                   scale: Optional[float] = None) -> jax.Array:
    """Exact neighborhood attention on NHWC tensors via gathers.

    q, k, v: (B, H, W, C) with C = heads * head_dim. Returns (B, H, W, C).
    """
    B, H, W, C = q.shape
    ks = kernel_size
    if H < ks or W < ks:
        ks = min(ks, H, W)
    dh = C // heads
    if scale is None:
        scale = dh ** -0.5

    rs = window_starts(H, ks)                     # (H,)
    cs = window_starts(W, ks)                     # (W,)
    rows = rs[:, None] + jnp.arange(ks)[None, :]  # (H, ks)
    cols = cs[:, None] + jnp.arange(ks)[None, :]  # (W, ks)

    def gather_windows(x):
        # (B,H,W,C) -> (B, H, W, ks*ks, C): neighbors for every query
        xw = x[:, rows]              # (B, H, ks, W, C)
        xw = xw[:, :, :, cols]       # (B, H, ks, W, ks, C)
        xw = jnp.moveaxis(xw, 2, 3)  # (B, H, W, ks, ks, C)
        return xw.reshape(B, H, W, ks * ks, C)

    kw = gather_windows(k).reshape(B, H, W, ks * ks, heads, dh)
    vw = gather_windows(v).reshape(B, H, W, ks * ks, heads, dh)
    qh = q.reshape(B, H, W, heads, dh) * scale

    logits = jnp.einsum("bhwnd,bhwknd->bhwnk", qh, kw,
                        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhwnk,bhwknd->bhwnd", attn, vw)
    return out.reshape(B, H, W, C)


def na2d_banded(q: jax.Array, k: jax.Array, v: jax.Array,
                kernel_size: int = 7, heads: int = 8,
                scale: Optional[float] = None,
                tile_h: int = 8) -> jax.Array:
    """Dense-banded neighborhood attention in plain XLA — the same row-band
    formulation as the Pallas kernel (ops/pallas/na2d.py) but differentiable
    by autodiff: queries are grouped into row bands, each band attends
    densely to its (tile_h + ks − 1)-row key halo under the clamped-window
    mask. ~k²/((tile_h+ks−1)·W) of the dense FLOPs are 'wasted' on masked
    keys, but everything is batched matmuls (MXU path) and the memory
    footprint is (tile_h+ks−1)·W per query instead of the gather
    formulation's k²·C-per-pixel blowup. Used as the training-time backward
    for the Pallas forward and as the default non-Pallas implementation."""
    B, H, W, C = q.shape
    ks = min(kernel_size, H, W)
    dh = C // heads
    if scale is None:
        scale = dh ** -0.5
    th = tile_h
    while H % th:
        th //= 2
    th = max(th, 1)
    nb = H // th
    KH = min(th + ks - 1, H)

    band_r0 = jnp.arange(nb) * th                        # (nb,)
    halo_start = jnp.clip(band_r0 - ks // 2, 0, H - KH)  # (nb,)
    halo_rows = halo_start[:, None] + jnp.arange(KH)[None, :]  # (nb, KH)

    qb = q.reshape(B, nb, th, W, heads, dh)
    kb = k[:, halo_rows]  # (B, nb, KH, W, C)
    vb = v[:, halo_rows]
    kb = kb.reshape(B, nb, KH, W, heads, dh)
    vb = vb.reshape(B, nb, KH, W, heads, dh)

    scores = jnp.einsum("bntwhd,bnkxhd->bnhtwkx", qb * scale, kb,
                        preferred_element_type=jnp.float32)
    # mask: query (band n, row t, col w) ↔ key (halo row idx kk, col x)
    qi = band_r0[:, None] + jnp.arange(th)[None, :]          # (nb, th) abs row
    ki = halo_rows                                            # (nb, KH) abs row
    rs = jnp.clip(qi - ks // 2, 0, H - ks)                    # (nb, th)
    cs = jnp.clip(jnp.arange(W) - ks // 2, 0, W - ks)         # (W,)
    row_ok = ((ki[:, None, :] >= rs[:, :, None]) &
              (ki[:, None, :] < rs[:, :, None] + ks))         # (nb, th, KH)
    col_ok = ((jnp.arange(W)[None, :] >= cs[:, None]) &
              (jnp.arange(W)[None, :] < cs[:, None] + ks))    # (W, W) [q, k]
    mask = (row_ok[:, :, None, :, None] &
            col_ok[None, None, :, None, :])                   # (nb,th,W,KH,W)
    scores = jnp.where(mask[:, None][None], scores, -jnp.inf)
    # softmax over the (KH, W) key axes jointly
    smax = jnp.max(scores, axis=(-2, -1), keepdims=True)
    probs = jnp.exp(scores - smax)
    probs = probs / jnp.sum(probs, axis=(-2, -1), keepdims=True)
    out = jnp.einsum("bnhtwkx,bnkxhd->bntwhd", probs.astype(v.dtype), vb)
    return out.reshape(B, H, W, C)


def na2d(q: jax.Array, k: jax.Array, v: jax.Array, kernel_size: int = 7,
         heads: int = 8, scale: Optional[float] = None,
         impl: Optional[str] = None) -> jax.Array:
    """Neighborhood attention with backend dispatch.

    impl: None → auto ('pallas' on TPU, else the dense-banded XLA
    formulation); 'reference' forces the gather oracle.
    """
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "banded"
    if impl == "pallas":
        try:
            from .pallas.na2d import na2d_pallas
            return na2d_pallas(q, k, v, kernel_size=kernel_size, heads=heads,
                               scale=scale)
        except Exception:
            impl = "banded"
    if impl == "banded":
        return na2d_banded(q, k, v, kernel_size=kernel_size, heads=heads,
                           scale=scale)
    return na2d_reference(q, k, v, kernel_size=kernel_size, heads=heads,
                          scale=scale)
