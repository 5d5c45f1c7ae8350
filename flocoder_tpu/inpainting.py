"""Inpainting subsystem: mask encoder, mask generators, blending, triplets.

Reference: flocoder/inpainting.py —
- ``MaskEncoder`` (inpainting.py:141-245): two aggressive learnable
  downsampling blocks, each concatenating a non-learnable AvgPool "hard
  shrink" of the mask as a skip channel, then a 1×1 head with sigmoid; the
  doubly-shrunk raw mask is kept as channel 0 of the output.
- ``mask_blending`` (:250-253): source + mask·(noise − source).
- Mask generators (:277-351): brush-stroke random walks, rectangles, noise,
  total, nothing — categorically sampled with the reference's probabilities.
  These are host-side numpy (they feed the data pipeline, not the TPU), but
  use an explicit ``numpy.random.Generator`` instead of global state.
- ``create_inpainting_triplet`` (:378-389) for pre-encoding.
- Research extras ``approx_AL`` (:68-88) and the training-free ΠGDM-style
  velocity correction ``algorithm3`` (:92-130), in JAX.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["MaskEncoder", "mask_blending", "simulate_brush_stroke",
           "generate_rectangles", "generate_mask", "generate_mask_batch",
           "create_inpainting_triplet", "approx_AL", "algorithm3",
           "MASK_CHOICES", "MASK_PROBS"]


# --------------------------------------------------------------------------
# Mask encoder (device model)
# --------------------------------------------------------------------------

class _DownsampleBlock(nn.Module):
    """shrink_fac× learnable downsample + hard AvgPool skip channel
    (reference: inpainting.py:161-177). NHWC."""
    out_channels: int
    shrink_fac: int = 4
    mode: str = "pool"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mask = x[..., 0:1]
        f = self.shrink_fac
        if self.mode == "pool":
            skip = nn.avg_pool(mask, (f, f), strides=(f, f))
        else:
            b, h, w, c = mask.shape
            skip = jax.image.resize(mask, (b, h // f, w // f, c), "bilinear")
        learned = nn.Conv(self.out_channels, (f, f), strides=f,
                          dtype=self.dtype)(x)
        learned = nn.silu(learned)
        learned = nn.Conv(self.out_channels, (3, 3), padding=1,
                          dtype=self.dtype)(learned)
        learned = nn.silu(learned)
        return jnp.concatenate([skip, learned], axis=-1)


class MaskEncoder(nn.Module):
    """Pixel mask (B,H,W,1) → latent-shaped conditioning (B,H/16,W/16,C)
    (reference: inpainting.py:180-245). Channel 0 of the output is the raw
    doubly-shrunk mask; the rest are learned features passed through a
    sigmoid."""
    output_channels: int = 4
    shrink_fac: int = 4
    mode: str = "pool"
    final_act: str = "sigmoid"  # 'sigmoid' | 'silu' | 'none'
    target_hw: Optional[Tuple[int, int]] = None  # final latent spatial size
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mask_pixels):
        x = mask_pixels.astype(self.dtype)
        if x.ndim == 3:
            x = x[..., None]
        h = _DownsampleBlock(16, self.shrink_fac, self.mode, self.dtype)(x)
        h = _DownsampleBlock(32, self.shrink_fac, self.mode, self.dtype)(h)
        h = nn.Conv(self.output_channels - 1, (1, 1), dtype=self.dtype)(h)
        if self.final_act == "sigmoid":
            h = nn.sigmoid(h)
        elif self.final_act == "silu":
            h = nn.silu(h)
        f2 = self.shrink_fac ** 2
        if self.mode == "pool":
            doubly = nn.avg_pool(x, (f2, f2), strides=(f2, f2))
        else:
            b, hh, ww, c = x.shape
            doubly = jax.image.resize(x, (b, hh // f2, ww // f2, c),
                                      "bilinear")
        out = jnp.concatenate([doubly, h], axis=-1)
        # Generalization over the reference (whose fixed 16× shrink assumes
        # 128px images with 8×-compressed latents): when the codec's latent
        # spatial size differs, resize the encoding to it.
        if self.target_hw is not None and out.shape[1:3] != tuple(self.target_hw):
            b, _, _, c = out.shape
            out = jax.image.resize(
                out, (b, self.target_hw[0], self.target_hw[1], c), "bilinear")
        return out


def mask_blending(source, mask, noise=None, rng: Optional[jax.Array] = None):
    """source + mask·(noise − source) (reference: inpainting.py:250-253)."""
    if noise is None:
        if rng is None:
            raise ValueError("mask_blending needs noise or an rng key")
        noise = jax.random.normal(rng, source.shape, source.dtype)
    return source + mask * (noise - source)


# --------------------------------------------------------------------------
# Host-side mask generators (numpy)
# --------------------------------------------------------------------------

MASK_CHOICES = ("total", "brush", "rectangles", "noise", "nothing")
MASK_PROBS = (0.4, 0.35, 0.15, 0.05, 0.05)  # (reference: inpainting.py:321-322)


def simulate_brush_stroke(size=(128, 128), num_strokes: int = 1,
                          brush_size: Optional[int] = None,
                          max_brush_size: int = 15,
                          rng: Optional[np.random.Generator] = None):
    """Random-walk brush strokes with varying radius
    (reference: inpainting.py:277-300)."""
    rng = rng or np.random.default_rng()
    mask = np.zeros(size)
    for _ in range(num_strokes):
        bs = brush_size if brush_size is not None else int(
            rng.integers(3, max_brush_size))
        x = float(rng.integers(0, size[0]))
        y = float(rng.integers(size[1] // 3, 2 * size[1] // 3))
        length = int(rng.integers(100, 300))
        direction = rng.uniform(-np.pi / 10, np.pi / 10)
        if x > size[0] / 2:
            direction += np.pi
        for _ in range(length):
            direction += rng.normal(0, 0.04)
            nx, ny = x + np.cos(direction) * 0.7, y + np.sin(direction) * 0.7
            if not (0 <= nx < size[0] and 0 <= ny < size[1]):
                break
            x, y = nx, ny
            cur = max(1, bs + int(rng.integers(-bs // 2, max(bs // 2, 1))))
            xi, yi, r = int(x), int(y), cur + 1
            y0, y1 = max(0, yi - r), min(size[0], yi + r + 1)
            x0, x1 = max(0, xi - r), min(size[1], xi + r + 1)
            yy, xx = np.ogrid[y0:y1, x0:x1]
            mask[y0:y1, x0:x1][(xx - xi) ** 2 + (yy - yi) ** 2 <= cur ** 2] = 1
    return mask


def generate_rectangles(size=(128, 128), max_size_ratio_x: float = 0.8,
                        max_size_ratio_y: float = 0.3,
                        rng: Optional[np.random.Generator] = None):
    """2–10 random rectangles (reference: inpainting.py:303-315)."""
    rng = rng or np.random.default_rng()
    mask = np.zeros(size)
    max_w = int(size[0] * max_size_ratio_x)
    max_h = int(size[1] * max_size_ratio_y)
    for _ in range(int(rng.integers(2, 11))):
        w = int(rng.integers(3, max(max_w, 4)))
        h = int(rng.integers(3, max(max_h, 4)))
        x = int(rng.integers(0, max(size[0] - w, 1)))
        y = int(rng.integers(0, max(size[1] - h, 1)))
        mask[x:x + w, y:y + h] = 1
    return mask.T


def generate_mask(size=(128, 128), mask_type: str = "",
                  choices=MASK_CHOICES, p=MASK_PROBS,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Sample a mask type and draw it (reference: inpainting.py:319-351).
    Returns float32 (H, W) in {0, 1}."""
    rng = rng or np.random.default_rng()
    if not mask_type:
        mask_type = rng.choice(choices, p=np.asarray(p) / np.sum(p))
    if mask_type == "total":
        mask = np.ones(size)
    elif mask_type == "brush":
        mask = simulate_brush_stroke(size, num_strokes=int(rng.integers(2, 6)),
                                     rng=rng)
    elif mask_type == "rectangles":
        mask = generate_rectangles(size, rng=rng)
    elif mask_type == "noise":
        mask = (rng.random(size) > 0.7).astype(float)
    elif mask_type == "nothing":
        mask = np.zeros(size)
    else:
        raise ValueError(f"Unsupported mask_type: {mask_type}")
    return mask.astype(np.float32)


def generate_mask_batch(size=(128, 128), batch_size: int = 1,
                        unique_masks: bool = True, seed: Optional[int] = None,
                        **kwargs) -> np.ndarray:
    """(B, H, W, 1) batch of masks (reference: inpainting.py:355-374; the
    multiprocessing Pool there is unnecessary — these are cheap numpy ops)."""
    rng = np.random.default_rng(seed)
    if unique_masks:
        masks = [generate_mask(size, rng=rng, **kwargs)
                 for _ in range(batch_size)]
        out = np.stack(masks, axis=0)
    else:
        out = np.tile(generate_mask(size, rng=rng, **kwargs)[None],
                      (batch_size, 1, 1))
    return out[..., None]


def create_inpainting_triplet(full_image, codec, codec_params,
                              quantize: bool = False,
                              rng: Optional[np.random.Generator] = None):
    """(target_latents, mask_pixels, source_latents) for one batch
    (reference: inpainting.py:378-389): encode the full image, mask it in
    pixel space, encode the masked image."""
    target_latents = codec.encode(codec_params, full_image)
    mask = generate_mask_batch(full_image.shape[1:3],
                               batch_size=full_image.shape[0],
                               seed=None if rng is None else int(rng.integers(2**31)))
    mask_j = jnp.asarray(mask)
    incomplete = full_image * (1 - mask_j)
    source_latents = codec.encode(codec_params, incomplete)
    if quantize and hasattr(codec, "quantize"):
        source_latents = codec.quantize(codec_params, source_latents)[0]
        target_latents = codec.quantize(codec_params, target_latents)[0]
    return target_latents, mask, source_latents


# --------------------------------------------------------------------------
# Research extras
# --------------------------------------------------------------------------

def approx_AL(source, target):
    """Least-squares latent measurement operator A_L with Y ≈ X A_Lᵀ
    (reference: inpainting.py:68-88)."""
    X = target.reshape(target.shape[0], -1)
    Y = source.reshape(source.shape[0], -1)
    sol, *_ = jnp.linalg.lstsq(X, Y)
    return sol.T


def algorithm3(v, x, t, tp, y, A, sigma_y: float = 0.05,
               gamma_t: float = 1.0):
    """Training-free inverse-problem velocity correction (ΠGDM-style)
    (reference: inpainting.py:92-130). Conditional-OT path: α_t = t,
    σ_t = 1 − t."""
    r_tp_sq = (1 - tp) ** 2 / (tp ** 2 + (1 - tp) ** 2)
    alpha_t, sigma_t = tp, 1 - tp
    d_ln_ratio_dt = 1.0 / (tp * (1 - tp))
    d_ln_sigma_dt = -1.0 / (1 - tp)
    coeff_inv = 1.0 / (alpha_t * d_ln_ratio_dt)
    x1_hat = coeff_inv * (v - d_ln_sigma_dt * x)
    residual = y - A @ x1_hat.reshape(-1)
    cov = r_tp_sq * (A @ A.T) + sigma_y ** 2 * jnp.eye(A.shape[0],
                                                       dtype=x.dtype)
    g = (residual @ jnp.linalg.solve(cov, A)).reshape(x.shape)
    return v + sigma_t ** 2 * d_ln_ratio_dt * gamma_t * g
