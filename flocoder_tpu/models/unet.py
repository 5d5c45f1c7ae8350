"""Flow-matching velocity-field U-Net, flax.linen, NHWC.

Reference architecture: flocoder/unet.py:164-377 (capability-parity, not a
translation):

- pixel-unshuffle downsample (unet.py:49-54) / nearest-upsample (42-46)
- ResnetBlocks with FiLM time scale/shift (76-96), GroupNorm groups=4 default
- LinearAttention at every scale (125-150), softmax Attention at the
  bottleneck (99-122), both heads=4, dim_head=32
- sinusoidal time embedding → MLP with time_dim = dim*8 (197-204)
- class conditioning added into the time embedding via Embedding+MLP (206-212)
- mask conditioning fused spatially at the input and the first two down/up
  scales (214-235, 298-305, 336-340, 359-364)
- global "biggest" skip (308, 369); final resblock + 1×1 head (285-286)
- optional whole-forward rematerialization (374-377 → ``jax.checkpoint``)

TPU-first choices: NHWC layout throughout; attention reshapes to (B, N, H, D)
token-major form so QK^T/AV land on the MXU; the null class for classifier-free
guidance is the id -1 whose embedding contribution is masked to zero, so the
cond/uncond CFG branches batch into one forward (see sampling.cfg_velocity)
instead of the reference's two sequential calls.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["Unet", "sinusoidal_embedding"]


def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal position embedding of a scalar-per-example time vector
    (reference: unet.py:18-30)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=t.dtype) * (-math.log(10000.0) / (half - 1)))
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class Block(nn.Module):
    """conv3x3 → GroupNorm → (FiLM scale/shift) → SiLU (reference: unet.py:57-73)."""
    dim_out: int
    groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=self.groups, dtype=self.dtype, epsilon=1e-5)(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """FiLM-conditioned residual block (reference: unet.py:76-96)."""
    dim_out: int
    groups: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb):
        emb = nn.Dense(self.dim_out * 2, dtype=self.dtype)(nn.silu(time_emb))
        emb = emb[:, None, None, :]
        scale, shift = jnp.split(emb, 2, axis=-1)
        h = Block(self.dim_out, self.groups, self.dtype)(x, (scale, shift))
        h = Block(self.dim_out, self.groups, self.dtype)(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(x)
        return h + x


class Attention(nn.Module):
    """Full softmax attention over spatial tokens, bottleneck only
    (reference: unet.py:99-122).

    ``ring_axis``/``ring_axis_size``: sequence-parallel extension point
    (SURVEY §5.7) — when set (>1) and the module is traced inside a
    shard_map binding that mesh axis, the token axis is chunked across the
    axis and attention runs as a ppermute K/V ring
    (parallel.ring_attention.ring_attention_replicated, replicated-in/
    replicated-out incl. grads). Only matters beyond the reference's
    resolutions; off in every recipe by default."""
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32
    ring_axis: Any = None
    ring_axis_size: int = 1

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, heads, d)
        if self.ring_axis is not None and self.ring_axis_size > 1:
            from ..parallel.ring_attention import ring_attention_replicated
            out = ring_attention_replicated(q, k, v, self.ring_axis,
                                            self.ring_axis_size)
            out = out.reshape(b, h, w, hidden).astype(self.dtype)
            return nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(out)
        q = q * (self.dim_head ** -0.5)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h, w, hidden)
        return nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(out)


class LinearAttention(nn.Module):
    """O(N) kernel-feature attention used at every scale
    (reference: unet.py:125-150): q softmaxed over feature dim, k over tokens,
    context = K Vᵀ then out = contextᵀ Q — two small MXU matmuls per head."""
    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, dtype=self.dtype)(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, heads, d)
        q = jax.nn.softmax(q, axis=-1)  # over feature dim d
        k = jax.nn.softmax(k, axis=1)   # over tokens n
        q = q * (self.dim_head ** -0.5)
        context = jnp.einsum("bnhd,bnhe->bhde", k, v,
                             preferred_element_type=jnp.float32).astype(self.dtype)
        out = jnp.einsum("bhde,bnhd->bnhe", context, q)
        out = out.reshape(b, h, w, hidden)
        out = nn.Conv(c, (1, 1), dtype=self.dtype)(out)
        return nn.GroupNorm(num_groups=1, dtype=self.dtype, epsilon=1e-5)(out)


class PreNormResidual(nn.Module):
    """x + fn(GroupNorm_1(x)) (reference: unet.py:33-39, 153-161)."""
    fn: nn.Module
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return x + self.fn(nn.GroupNorm(num_groups=1, dtype=self.dtype, epsilon=1e-5)(x))


def pixel_unshuffle(x: jax.Array, factor: int = 2) -> jax.Array:
    """Space-to-depth: (B, H, W, C) → (B, H/f, W/f, C·f²), NHWC equivalent of
    the reference's Rearrange-based downsample (unet.py:49-54)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def pixel_shuffle(x: jax.Array, factor: int = 2) -> jax.Array:
    """Depth-to-space: (B, H, W, C·f²) → (B, H·f, W·f, C)."""
    b, h, w, c = x.shape
    co = c // (factor * factor)
    x = x.reshape(b, h, w, co, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * factor, w * factor, co)


class Downsample(nn.Module):
    """Pixel-unshuffle + 1×1 conv (reference: unet.py:49-54)."""
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(pixel_unshuffle(x, 2))


class Upsample(nn.Module):
    """Nearest 2× upsample + conv3×3 (reference: unet.py:42-46)."""
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(self.dim_out, (3, 3), padding=1, dtype=self.dtype)(x)


def _resize_mask(mask: jax.Array, hw) -> jax.Array:
    """Bilinear mask resize to a spatial size (reference: unet.py:338, 362)."""
    b, _, _, c = mask.shape
    return jax.image.resize(mask, (b, hw[0], hw[1], c), method="bilinear")


class Unet(nn.Module):
    """Velocity field v(x, t, cond) (reference: unet.py:164-377).

    cond is a dict {'class_cond': (B,) int or None, 'mask_cond': (B,H,W,Cm) or
    None}; class id < 0 means unconditional (the CFG null token).
    """
    dim: int
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    resnet_block_groups: int = 4
    n_classes: int = 0
    mask_cond: bool = False
    mask_channels: int = 1
    use_checkpoint: bool = False
    dtype: Any = jnp.float32
    # sequence-parallel bottleneck attention (see Attention.ring_axis);
    # requires tracing inside a shard_map that binds this mesh axis
    ring_axis: Any = None
    ring_axis_size: int = 1
    # MeanFlow (average-velocity) mode: the field becomes u(x, r, t) — `time`
    # is the STATE time r and cond['time_horizon'] the target time t (same
    # t_scale units). The horizon enters as a second sinusoidal embedding of
    # Δ = t − r added into the time embedding; a missing horizon means Δ = 0,
    # i.e. u(x, t, t) = v(x, t) — the instantaneous velocity — so a
    # dual-time model drops into every standard-FM code path unchanged.
    dual_time: bool = False

    @nn.compact
    def __call__(self, x, time, cond: Optional[dict] = None, train: bool = False):
        # Whole-forward rematerialization (reference: unet.py:374-377) is done
        # at the train-step level with ``jax.checkpoint`` around ``apply`` —
        # see training/flow.py — keeping the module itself a pure forward.
        return self._forward(x, time, cond)

    def _forward(self, x, time, cond: Optional[dict] = None):
        dtype = self.dtype
        groups = self.resnet_block_groups
        dims = [self.dim] + [self.dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        time_dim = self.dim * 8

        class_cond = cond.get("class_cond") if cond else None
        mask = cond.get("mask_cond") if cond else None
        if self.mask_cond and mask is None:
            # Param structure must not depend on the call-time cond (linen
            # auto-names modules by creation order): a missing mask becomes
            # the all-ones mask, which the input fusion bypasses — the same
            # "all ones = unconditional" convention as CFG dropout.
            mask = jnp.ones(x.shape[:3] + (self.mask_channels,), self.dtype)

        x = x.astype(dtype)
        x = nn.Conv(self.dim, (1, 1), dtype=dtype, name="init_conv")(x)

        # Input-level mask fusion (reference: unet.py:214-221, 297-305);
        # bypassed when the mask is all ones (= unconditional generation).
        if self.mask_cond and mask is not None:
            mask = mask.astype(dtype)
            fused = jnp.concatenate([x, mask], axis=-1)
            fused = nn.Conv(2 * self.dim, (5, 5), padding=2, dtype=dtype)(fused)
            fused = nn.silu(fused)
            fused = nn.Conv(2 * self.dim, (3, 3), padding=1, dtype=dtype)(fused)
            fused = nn.silu(fused)
            fused = nn.Conv(self.dim, (3, 3), padding=1, dtype=dtype)(fused)
            all_ones = jnp.all(mask == 1.0)
            x = jnp.where(all_ones, x, fused)

        r = x  # biggest skip (reference: unet.py:308)

        t = sinusoidal_embedding(jnp.asarray(time, dtype), self.dim)
        t = nn.Dense(time_dim, dtype=dtype)(t)
        t = nn.gelu(t, approximate=False)  # exact erf, torch parity
        t = nn.Dense(time_dim, dtype=dtype)(t)

        if self.dual_time:
            # horizon embedding of Δ = t_horizon − r; the MLP always runs
            # (on Δ=0 when no horizon is given) so the param structure never
            # depends on the call-time cond
            horizon = cond.get("time_horizon") if cond else None
            tv = jnp.asarray(time, dtype)
            delta = (jnp.asarray(horizon, dtype) - tv if horizon is not None
                     else jnp.zeros_like(tv))
            d = sinusoidal_embedding(delta, self.dim)
            d = nn.Dense(time_dim, dtype=dtype)(d)
            d = nn.gelu(d, approximate=False)
            d = nn.Dense(time_dim, dtype=dtype)(d)
            t = t + d

        if self.n_classes > 0 and class_cond is not None:
            # Null token: ids < 0 contribute zero (CFG-friendly batched form
            # of the reference's cond=None branch, unet.py:313-316).
            ids = jnp.clip(class_cond, 0, self.n_classes - 1)
            ce = nn.Embed(self.n_classes, time_dim, dtype=dtype)(ids)
            ce = nn.Dense(time_dim, dtype=dtype)(ce)
            ce = nn.gelu(ce, approximate=False)
            ce = nn.Dense(time_dim, dtype=dtype)(ce)
            valid = (class_cond >= 0).astype(dtype)[:, None]
            t = t + ce * valid

        hs = []
        n_res = len(in_out)
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= n_res - 1
            x = ResnetBlock(dim_in, groups, dtype)(x, t)
            hs.append(x)
            x = ResnetBlock(dim_in, groups, dtype)(x, t)
            x = PreNormResidual(LinearAttention(dtype=dtype), dtype=dtype)(x)
            hs.append(x)
            if self.mask_cond and mask is not None and ind < 2:
                m = _resize_mask(mask, x.shape[1:3])
                xm = jnp.concatenate([x, m], axis=-1)
                xm = nn.Conv(dim_in, (3, 3), padding=1, dtype=dtype)(xm)
                x = x + nn.silu(xm)
            if not is_last:
                x = Downsample(dim_out, dtype)(x)
            else:
                x = nn.Conv(dim_out, (3, 3), padding=1, dtype=dtype)(x)

        mid = dims[-1]
        x = ResnetBlock(mid, groups, dtype)(x, t)
        x = PreNormResidual(Attention(dtype=dtype, ring_axis=self.ring_axis,
                                      ring_axis_size=self.ring_axis_size),
                            dtype=dtype)(x)
        x = ResnetBlock(mid, groups, dtype)(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == n_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dtype)(x, t)
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_out, groups, dtype)(x, t)
            x = PreNormResidual(LinearAttention(dtype=dtype), dtype=dtype)(x)
            if self.mask_cond and mask is not None and ind < 2:
                m = _resize_mask(mask, x.shape[1:3])
                xm = jnp.concatenate([x, m], axis=-1)
                xm = nn.Conv(dim_out, (3, 3), padding=1, dtype=dtype)(xm)
                x = x + nn.silu(xm)
            if not is_last:
                x = Upsample(dim_in, dtype)(x)
            else:
                x = nn.Conv(dim_in, (3, 3), padding=1, dtype=dtype)(x)

        x = jnp.concatenate([x, r], axis=-1)
        x = ResnetBlock(self.dim, groups, dtype)(x, t)
        out = nn.Conv(self.channels, (1, 1), dtype=dtype, name="final_conv")(x)
        return out.astype(jnp.float32)
