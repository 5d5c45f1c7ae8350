"""On-device (XLA) image augmentation for the pre-encode pass.

The reference runs its frozen augmentations (rotate ±15° → center-crop 90% →
RandomResizedCrop(0.8-1.0) → h-flip → normalize; data.py:97-111) in host
DataLoader workers — ``augs_per`` PIL pipelines per image (SURVEY §3.2 calls
the pre-encode host pipeline a hard part: "keeping TPUs fed from PIL/PNG
augmentation"). TPU-first redesign: every step of that pipeline is an affine
map, so the whole chain composes into ONE 2×3 matrix per sample and ONE
bilinear gather — batched and jitted, dispatched back-to-back with
``codec.encode`` with the batch resident on device throughout. The host
decodes each image once (a single resize to a fixed source size); the chip
then manufactures all ``augs_per`` variants.

Distributional parity, not bit parity, with the host pipeline
(data/transforms.py): same angle/scale/ratio/offset/flip laws, explicit
``jax.random`` keys for frozen-augmentation reproducibility. The one
documented approximation: the host image is pre-resized to ``src_size``
(default ⌈1.25·image_size⌉, chosen so the smallest RandomResizedCrop window,
0.9·√0.8 ≈ 0.805 of the frame, still covers ≥ image_size source pixels — no
upsampling blur at the output resolution).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_device_augment", "default_src_size", "load_resized"]


def default_src_size(image_size: int) -> int:
    return int(math.ceil(image_size * 1.25))


def load_resized(img, src_size: int) -> np.ndarray:
    """Host-side half of the pipeline: PIL image → float32 (S0, S0, C) in
    [0, 1]. One resize per image, ever.

    Square-source assumption: non-square images are squashed to S0×S0 here,
    and the on-device RRC clamps its window per-dimension — so distributional
    parity with the host pipeline (data/transforms.py:61-71, which retries
    then falls back to plain resize) holds exactly for square sources and
    approximately otherwise. Datasets with extreme aspect ratios should use
    the host pipeline (preencoding.device_augs=false)."""
    from PIL import Image
    if img.mode != "RGB":
        img = img.convert("RGB")
    img = img.resize((src_size, src_size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def _bilinear_zero(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample ``img`` (H, W, C) at float coords with zero outside (PIL
    rotate's black fill)."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))[..., None]
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return v * valid

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def make_device_augment(image_size: int, src_size: Optional[int] = None,
                        rotate_deg: float = 15.0, center_crop: float = 0.9,
                        rrc_scale: Tuple[float, float] = (0.8, 1.0),
                        rrc_ratio: Tuple[float, float] = (3 / 4, 4 / 3),
                        hflip: float = 0.5, mean: float = 0.5,
                        std: float = 0.5):
    """Build ``fn(images (B, S0, S0, C) in [0,1], key) -> (B, S, S, C)``
    normalized to [-1, 1] — the batched on-device equivalent of
    ``transforms.image_transforms`` (reference: data.py:97-111)."""
    S = image_size
    S0 = src_size or default_src_size(image_size)

    def one(img, key):
        k_th, k_sc, k_ar, k_x, k_y, k_fl = jax.random.split(key, 6)
        cc = center_crop * S0                 # center-crop frame edge
        m = (S0 - cc) / 2.0                   # frame origin
        # RandomResizedCrop window inside the frame
        area = cc * cc * jax.random.uniform(k_sc, (), minval=rrc_scale[0],
                                            maxval=rrc_scale[1])
        ar = jax.random.uniform(k_ar, (), minval=rrc_ratio[0],
                                maxval=rrc_ratio[1])
        cw = jnp.minimum(jnp.sqrt(area * ar), cc)
        ch = jnp.minimum(jnp.sqrt(area / ar), cc)
        x0 = m + jax.random.uniform(k_x, ()) * (cc - cw)
        y0 = m + jax.random.uniform(k_y, ()) * (cc - ch)
        flip = jax.random.uniform(k_fl, ()) < hflip

        jj = jnp.arange(S, dtype=jnp.float32)
        jj = jnp.where(flip, S - 1 - jj, jj)
        ii = jnp.arange(S, dtype=jnp.float32)
        # half-pixel-center sampling grid inside the crop window
        us = x0 + (jj + 0.5) * (cw / S) - 0.5          # (S,)
        vs = y0 + (ii + 0.5) * (ch / S) - 0.5          # (S,)
        U = jnp.broadcast_to(us[None, :], (S, S))
        V = jnp.broadcast_to(vs[:, None], (S, S))
        # rotation about the source center (PIL rotate, expand=False)
        theta = jax.random.uniform(k_th, (), minval=-rotate_deg,
                                   maxval=rotate_deg) * (math.pi / 180.0)
        c = (S0 - 1) / 2.0
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        Xs = c + cos * (U - c) - sin * (V - c)
        Ys = c + sin * (U - c) + cos * (V - c)
        out = _bilinear_zero(img, Ys, Xs)
        return (out - mean) / std

    @jax.jit
    def fn(images, key):
        keys = jax.random.split(key, images.shape[0])
        return jax.vmap(one)(images.astype(jnp.float32), keys)

    return fn
