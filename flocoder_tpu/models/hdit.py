"""Hourglass Diffusion Transformer (HDiT) velocity field — a real model
family behind the reference's *dangling* HDiT branch.

The reference's non-pre-encoded mode constructs
``flocoder.hdit.ImageTransformerDenoiserModelV2(levels=[LevelSpec(depth,
width, d_ff, self_attn=GlobalAttentionSpec(d_head), dropout)], mapping=
MappingSpec(depth, width, d_ff), in_channels, out_channels, patch_size,
num_classes, mapping_cond_dim)`` (reference train_flow.py:292-300) — but no
``flocoder/hdit.py`` exists in the package, so that branch ImportErrors
(SURVEY.md §7 "hard parts": "HDiT import of a module absent from the
package"). This module supplies the model family for real, following the
HDiT architecture those names point at (Crowson et al., "Scalable
High-Resolution Pixel-Space Image Synthesis with Hourglass Diffusion
Transformers", arXiv:2401.11605 — k-diffusion's image_transformer_v2):

- an hourglass of transformer levels over patch tokens: TokenMerge
  (space-to-depth + matmul) between levels going down, TokenSplit
  (matmul + depth-to-space) with a learnable-lerp skip going up;
- per-level self-attention — neighborhood attention at the outer
  (high-resolution) levels, global attention at the inner levels — with
  axial 2-D RoPE and RMS-normalized q/k;
- GEGLU feed-forward blocks;
- a mapping MLP that turns (time, class[, MeanFlow horizon]) into one
  conditioning vector consumed by AdaRMSNorm in every block.

TPU-first choices (not a port — there is no reference code to port):
- tokens stay NHWC ``(B, H, W, width)``: every projection is an
  ``nn.Dense`` on the trailing axis, i.e. one large batched matmul on the
  MXU; merges/splits are reshapes, never gathers.
- neighborhood attention rides the validated Pallas NA2D kernel
  (``ops/neighborhood_attention.na2d`` auto-dispatch: Pallas on TPU,
  banded-XLA elsewhere) — the same kernel the VQGAN codec uses.
- global attention can shard over the mesh 'model' axis via ring attention
  (``parallel/ring_attention.ring_attention_replicated``) with the same
  ``ring_axis`` plumbing as the U-Net bottleneck.
- conditioning enters only through AdaRMSNorm scale offsets with
  zero-initialized projections, and the class null token (ids < 0)
  contributes exactly zero — the same batched-CFG convention as
  ``models/unet.py``, so CFG sampling stays one executable.
- every residual branch ends in a zero-initialized projection, so the
  model is the zero velocity field at init (adaLN-zero-style residual
  gating collapsed into the output projections).

API: ``HDiT.apply(params, x, time, cond)`` with the package-wide cond dict
``{'class_cond': (B,) int or None, 'mask_cond': must be None,
'time_horizon': (B,) for dual-time MeanFlow models}`` — drop-in for the
U-Net in every sampler/train-step/serving path (they are all
``model_apply``-generic).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.neighborhood_attention import na2d
from .unet import sinusoidal_embedding

__all__ = ["HDiT", "LevelSpec", "MappingSpec", "GlobalAttentionSpec",
           "NeighborhoodAttentionSpec", "MoEFeedForwardBlock",
           "hdit_from_config"]


# ---------------------------------------------------------------------------
# Specs — the constructor vocabulary the reference's branch uses
# (train_flow.py:293-299). Frozen/hashable so they can be linen fields.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GlobalAttentionSpec:
    d_head: int = 64


@dataclasses.dataclass(frozen=True)
class NeighborhoodAttentionSpec:
    d_head: int = 64
    kernel_size: int = 7


@dataclasses.dataclass(frozen=True)
class LevelSpec:
    depth: int
    width: int
    d_ff: int
    self_attn: Any = GlobalAttentionSpec()
    dropout: float = 0.0  # accepted for signature parity; HDiT recipes here
    #                       run dropout-free (the reference branch passes 0.0)
    moe_experts: int = 0          # >0 → MoE GEGLU FFN with this many experts
    moe_top_k: int = 2
    moe_capacity: float = 1.25


@dataclasses.dataclass(frozen=True)
class MappingSpec:
    depth: int = 2
    width: int = 256
    d_ff: int = 768
    dropout: float = 0.0


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _rms_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMS normalization over the trailing axis, accumulated in fp32."""
    x32 = x.astype(jnp.float32)
    rms = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * rms).astype(x.dtype)


class RMSNorm(nn.Module):
    """RMSNorm with a learnable scale (ones-init)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return _rms_norm(x) * scale.astype(x.dtype)


class AdaRMSNorm(nn.Module):
    """RMSNorm whose scale is (1 + zero-init Dense(cond)) — the HDiT
    conditioning mechanism: at init every block sees plain RMSNorm and the
    conditioning pathway grows from zero."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        # cond: (B, mapping_width) → per-channel scale offset
        off = nn.Dense(x.shape[-1], use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       name="cond_scale")(cond)
        scale = 1.0 + off.astype(x.dtype)
        return _rms_norm(x) * scale[:, None, None, :]


def _axial_rope(q: jax.Array, k: jax.Array, hw: Tuple[int, int],
                base: float = 10000.0):
    """Axial 2-D RoPE on per-head tensors ``(B, H, W, heads, d)``.

    The head dim splits in half: the first half rotates with the row
    position, the second with the column position; within each half,
    standard RoPE pairs with log-spaced frequencies. d must be divisible
    by 4. Positions are the integer grid of the CURRENT level, so merged
    tokens re-index cleanly at every scale."""
    H, W = hw
    d = q.shape[-1]
    dq = d // 2                                  # dims per axis
    half = dq // 2                               # rotation pairs per axis
    freqs = base ** (-jnp.arange(half, dtype=jnp.float32) / half)

    def angles(n):  # (n, half)
        return jnp.arange(n, dtype=jnp.float32)[:, None] * freqs[None, :]

    ah = angles(H)[:, None, None, :]             # (H, 1, 1, half)
    aw = angles(W)[None, :, None, :]             # (1, W, 1, half)

    def rot(x, ang):
        # x: (..., 2*half) pairs (x1, x2) rotated by ang
        x1, x2 = x[..., :ang.shape[-1]], x[..., ang.shape[-1]:]
        c, s = jnp.cos(ang), jnp.sin(ang)
        c = c.astype(x.dtype)
        s = s.astype(x.dtype)
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)

    def apply(x):
        xh, xw = x[..., :dq], x[..., dq:]
        return jnp.concatenate([rot(xh, ah), rot(xw, aw)], axis=-1)

    return apply(q), apply(k)


class SelfAttentionBlock(nn.Module):
    """Pre-AdaRMSNorm residual attention block: qk RMSNorm, axial RoPE,
    neighborhood (Pallas NA2D) or global (optionally ring-sharded)
    attention, zero-init output projection."""
    spec: Any
    dtype: Any = jnp.float32
    ring_axis: Any = None
    ring_axis_size: int = 1

    @nn.compact
    def __call__(self, x, cond):
        B, H, W, width = x.shape
        d_head = self.spec.d_head
        if d_head % 4:
            raise ValueError(f"d_head must be divisible by 4 for axial "
                             f"RoPE, got {d_head}")
        heads = max(width // d_head, 1)
        hidden = heads * d_head
        skip = x
        x = AdaRMSNorm(dtype=self.dtype)(x, cond)
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, H, W, 3, heads, d_head)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # qk RMSNorm (scale shared across heads) keeps logits bounded at
        # any width — bf16-friendly on the MXU
        qs = self.param("q_scale", nn.initializers.ones, (d_head,))
        ks = self.param("k_scale", nn.initializers.ones, (d_head,))
        q = _rms_norm(q) * qs.astype(q.dtype)
        k = _rms_norm(k) * ks.astype(k.dtype)
        q, k = _axial_rope(q, k, (H, W))
        # qk-normalized logits have no 1/sqrt(d) convention to preserve;
        # keep the standard scale for smooth optimizer behavior
        scale = d_head ** -0.5
        if isinstance(self.spec, NeighborhoodAttentionSpec):
            out = na2d(q.reshape(B, H, W, hidden),
                       k.reshape(B, H, W, hidden),
                       v.reshape(B, H, W, hidden),
                       kernel_size=self.spec.kernel_size, heads=heads,
                       scale=scale)
        elif self.ring_axis is not None and self.ring_axis_size > 1:
            from ..parallel.ring_attention import ring_attention_replicated
            out = ring_attention_replicated(
                q.reshape(B, H * W, heads, d_head),
                k.reshape(B, H * W, heads, d_head),
                v.reshape(B, H * W, heads, d_head),
                self.ring_axis, self.ring_axis_size, scale)
            out = out.reshape(B, H, W, hidden).astype(self.dtype)
        else:
            qf = q.reshape(B, H * W, heads, d_head) * scale
            kf = k.reshape(B, H * W, heads, d_head)
            vf = v.reshape(B, H * W, heads, d_head)
            sim = jnp.einsum("bnhd,bmhd->bhnm", qf, kf,
                             preferred_element_type=jnp.float32)
            sim = sim - jax.lax.stop_gradient(
                sim.max(axis=-1, keepdims=True))
            attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, vf)
            out = out.reshape(B, H, W, hidden)
        out = nn.Dense(width, use_bias=False, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="out")(out)
        return skip + out


class FeedForwardBlock(nn.Module):
    """Pre-AdaRMSNorm residual GEGLU MLP with zero-init down projection."""
    d_ff: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        skip = x
        x = AdaRMSNorm(dtype=self.dtype)(x, cond)
        up = nn.Dense(self.d_ff * 2, use_bias=False, dtype=self.dtype,
                      name="up")(x)
        a, b = jnp.split(up, 2, axis=-1)
        x = nn.gelu(a, approximate=False) * b
        x = nn.Dense(skip.shape[-1], use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros, name="down")(x)
        return skip + x


class MoEFeedForwardBlock(nn.Module):
    """Pre-AdaRMSNorm residual MIXTURE-OF-EXPERTS GEGLU MLP — the sparse
    twin of ``FeedForwardBlock`` (new capability; the reference is dense,
    SURVEY §2d). Routing/dispatch/expert compute live in
    ``parallel/moe.py``: static-shape one-hot dispatch matmuls, top-k gates,
    capacity truncation, Switch load-balance + router-z auxiliary loss
    (sown into the 'moe_losses' collection — train_flow.py folds it into
    the training loss; plain ``apply`` drops it, so serving is unchanged).

    Expert parallelism: with ``ep_axis``/``ep_axis_size`` set (inside the
    production shard_map step), each shard computes only its
    E/ep_axis_size experts and one ``psum`` over ICI combines tokens —
    see ``moe_geglu_replicated``. Zero-init down projections keep every
    expert's residual contribution zero at init, like the dense block."""
    d_ff: int
    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32
    ep_axis: Any = None
    ep_axis_size: int = 1

    @nn.compact
    def __call__(self, x, cond):
        from ..parallel.moe import (load_balance_loss, moe_capacity,
                                    moe_geglu_apply, moe_geglu_replicated,
                                    moe_routing)
        skip = x
        B, H, W, d = x.shape
        x = AdaRMSNorm(dtype=self.dtype)(x, cond)
        flat = x.reshape(B * H * W, d)
        # router in fp32 — routing decisions are precision-sensitive
        logits = nn.Dense(self.n_experts, use_bias=False, dtype=jnp.float32,
                          name="router")(flat.astype(jnp.float32))
        cap = moe_capacity(flat.shape[0], self.n_experts, self.top_k,
                           self.capacity_factor)
        dispatch, combine, stats = moe_routing(logits, self.top_k, cap)
        self.sow("moe_losses", "aux",
                 load_balance_loss(stats, self.n_experts))

        w_up = self.param(
            "up_kernel",
            nn.initializers.lecun_normal(in_axis=-2, out_axis=-1,
                                         batch_axis=(0,)),
            (self.n_experts, d, self.d_ff * 2))
        w_down = self.param("down_kernel", nn.initializers.zeros,
                            (self.n_experts, self.d_ff, d))
        if self.ep_axis is not None and self.ep_axis_size > 1:
            out = moe_geglu_replicated(flat, dispatch, combine, w_up,
                                       w_down, self.ep_axis,
                                       self.ep_axis_size)
        else:
            out = moe_geglu_apply(flat, dispatch, combine, w_up, w_down)
        return skip + out.reshape(B, H, W, d).astype(skip.dtype)


class _MidBlockPair(nn.Module):
    """One (attention, feed-forward) block pair with the ``nn.scan`` carry
    signature — the unit the stacked/pipelined mid level is built from
    (``HDiT.pp_stages``, parallel/pipeline.py). Params of a depth-L mid
    level live stacked on a leading (L, ...) axis under 'mid_blocks'."""
    spec: LevelSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        x = SelfAttentionBlock(self.spec.self_attn, self.dtype,
                               name="attn")(x, cond)
        x = FeedForwardBlock(self.spec.d_ff, self.dtype, name="ff")(x, cond)
        return x, None


class TokenMerge(nn.Module):
    """Space-to-depth patch merge: (B,H,W,C) → (B,H/p,W/p,out_width)."""
    out_width: int
    patch: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        p = self.patch
        x = x.reshape(b, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p,
                                                  p * p * c)
        return nn.Dense(self.out_width, use_bias=False, dtype=self.dtype,
                        name="proj")(x)


class TokenSplit(nn.Module):
    """Depth-to-space patch split: (B,H,W,C) → (B,H·p,W·p,out_width); with a
    skip, blends via a learnable lerp ``skip + fac·(up − skip)`` (fac init
    0.5) — the hourglass skip connection."""
    out_width: int
    patch: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None):
        b, h, w, c = x.shape
        p = self.patch
        x = nn.Dense(self.out_width * p * p, use_bias=False,
                     dtype=self.dtype, name="proj")(x)
        x = x.reshape(b, h, w, p, p, self.out_width)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p,
                                                  self.out_width)
        if skip is not None:
            fac = self.param("fac", nn.initializers.constant(0.5), (1,))
            x = skip + fac.astype(x.dtype) * (x - skip)
        return x


class MappingMLP(nn.Module):
    """The mapping network: residual GEGLU blocks over the fused
    (time ⊕ class ⊕ horizon) embedding, final RMSNorm."""
    spec: MappingSpec
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, e):
        for i in range(self.spec.depth):
            skip = e
            h = RMSNorm(dtype=self.dtype, name=f"norm_{i}")(e)
            h = nn.Dense(self.spec.d_ff * 2, use_bias=False,
                         dtype=self.dtype, name=f"up_{i}")(h)
            a, b = jnp.split(h, 2, axis=-1)
            h = nn.gelu(a, approximate=False) * b
            h = nn.Dense(self.spec.width, use_bias=False, dtype=self.dtype,
                         kernel_init=nn.initializers.zeros,
                         name=f"down_{i}")(h)
            e = skip + h
        return RMSNorm(dtype=self.dtype, name="norm_out")(e)


# ---------------------------------------------------------------------------
# The model
# ---------------------------------------------------------------------------

class HDiT(nn.Module):
    """Hourglass DiT velocity field v(x, t, cond) (or u(x, r, t) with
    ``dual_time=True`` — the MeanFlow convention of ``models/unet.py``).

    ``levels`` runs outermost → innermost; levels[:-1] each contribute a
    down stage and an up stage around the next level, levels[-1] is the
    middle. Spatial size must be divisible by patch_size · 2^(len(levels)−1).
    """
    levels: Tuple[LevelSpec, ...]
    mapping: MappingSpec = MappingSpec()
    channels: int = 4
    patch_size: int = 4
    n_classes: int = 0
    dual_time: bool = False
    dtype: Any = jnp.float32
    ring_axis: Any = None
    ring_axis_size: int = 1
    ep_axis: Any = None          # expert-parallel mesh axis for MoE levels
    ep_axis_size: int = 1
    pp_stages: int = 0           # >0 → stacked mid level (pipeline-ready)
    pp_axis: Any = None          # pipeline mesh axis (inside shard_map)
    pp_axis_size: int = 1
    pp_microbatches: int = 0     # 0 → largest divisor of B that is ≤ 2·S
    pp_interleave: int = 1       # >1 → interleaved virtual-chunk schedule

    @nn.compact
    def __call__(self, x, time, cond: Optional[dict] = None,
                 train: bool = False):
        dtype = self.dtype
        class_cond = cond.get("class_cond") if cond else None
        mask = cond.get("mask_cond") if cond else None
        if mask is not None:
            raise ValueError("HDiT has no mask-conditioning path "
                             "(reference HDiT branch has none either); "
                             "use arch=unet for inpainting")

        # ---- mapping: time (+ horizon, + class) → cond vector ------------
        mw = self.mapping.width
        t = jnp.asarray(time, dtype)
        e = nn.Dense(mw, dtype=dtype, name="time_in")(
            sinusoidal_embedding(t, mw // 4))
        if self.dual_time:
            horizon = cond.get("time_horizon") if cond else None
            delta = (jnp.asarray(horizon, dtype) - t if horizon is not None
                     else jnp.zeros_like(t))
            e = e + nn.Dense(mw, dtype=dtype, name="horizon_in")(
                sinusoidal_embedding(delta, mw // 4))
        if self.n_classes > 0 and class_cond is not None:
            ids = jnp.clip(class_cond, 0, self.n_classes - 1)
            ce = nn.Embed(self.n_classes, mw, dtype=dtype,
                          name="class_emb")(ids)
            valid = (class_cond >= 0).astype(dtype)[:, None]
            e = e + ce * valid                      # null token (<0) = zero
        cond_vec = MappingMLP(self.mapping, dtype=dtype, name="mapping")(e)

        # ---- hourglass ----------------------------------------------------
        x = x.astype(dtype)
        need = self.patch_size * (1 << (len(self.levels) - 1))
        if x.shape[1] % need or x.shape[2] % need:
            raise ValueError(
                f"HDiT with patch_size={self.patch_size} and "
                f"{len(self.levels)} levels needs spatial dims divisible "
                f"by {need}; got {x.shape[1]}×{x.shape[2]} — lower "
                f"hdit_patch_size or drop a level")
        x = TokenMerge(self.levels[0].width, self.patch_size, dtype,
                       name="patch_in")(x)

        def run_level(x, spec, tag):
            for j in range(spec.depth):
                x = SelfAttentionBlock(spec.self_attn, dtype,
                                       self.ring_axis, self.ring_axis_size,
                                       name=f"{tag}_attn_{j}")(x, cond_vec)
                if spec.moe_experts:
                    x = MoEFeedForwardBlock(
                        spec.d_ff, spec.moe_experts, spec.moe_top_k,
                        spec.moe_capacity, dtype, self.ep_axis,
                        self.ep_axis_size,
                        name=f"{tag}_ff_{j}")(x, cond_vec)
                else:
                    x = FeedForwardBlock(spec.d_ff, dtype,
                                         name=f"{tag}_ff_{j}")(x, cond_vec)
            return x

        skips = []
        for i, spec in enumerate(self.levels[:-1]):
            x = run_level(x, spec, f"down_{i}")
            skips.append(x)
            x = TokenMerge(self.levels[i + 1].width, 2, dtype,
                           name=f"merge_{i}")(x)

        if self.pp_stages:
            # stacked mid level (pipeline parallelism, parallel/pipeline.py):
            # the depth-L block-pair stack lives as ONE nn.scan module with
            # params stacked on a leading (L, ...) axis. Off-mesh (serving,
            # init, eval) it runs as a sequential lax.scan; inside the
            # production shard_map step with pp_axis set, the stack runs as
            # an S-stage GPipe pipeline over the mesh 'model' axis.
            spec = self.levels[-1]
            if spec.moe_experts:
                raise ValueError("pp_stages does not combine with a MoE "
                                 "mid level (hdit_moe_experts[-1] must be 0)")
            if spec.depth % self.pp_stages:
                raise ValueError(
                    f"mid-level depth {spec.depth} not divisible by "
                    f"pp_stages={self.pp_stages}")
            scan_cls = nn.scan(_MidBlockPair, variable_axes={"params": 0},
                               split_rngs={"params": True},
                               length=spec.depth, in_axes=nn.broadcast)
            scan_mod = scan_cls(spec, dtype, name="mid_blocks")
            pipelined = (self.pp_axis is not None and self.pp_axis_size > 1
                         and not self.is_initializing())
            if not pipelined:
                x, _ = scan_mod(x, cond_vec)
            else:
                if self.pp_axis_size != self.pp_stages:
                    raise ValueError(
                        f"pp mesh axis size {self.pp_axis_size} != "
                        f"pp_stages={self.pp_stages}")
                from ..parallel.pipeline import pipeline_apply
                stacked = self.scope.get_variable("params", "mid_blocks")
                blk = _MidBlockPair(spec, dtype)

                def block_fn(p, h, a):
                    out, _ = blk.apply({"params": p}, h, a)
                    return out

                B = x.shape[0]
                S = self.pp_axis_size
                if self.pp_interleave > 1:
                    # interleaved schedule: M must come in rounds of S, so
                    # the per-shard batch must split into a multiple of S
                    # microbatches — a constraint the plain GPipe path does
                    # not have (ADVICE r4: fail HERE with the requirement
                    # named, not at trace time inside the pipeline)
                    if B < S or B % S != 0:
                        raise ValueError(
                            f"pp_interleave={self.pp_interleave} needs the "
                            f"per-shard batch ({B}) divisible by "
                            f"pp_stages={S} (microbatch count must be a "
                            f"multiple of the stage count); pad the batch "
                            f"or set pp_interleave=1")
                    M = self.pp_microbatches or max(
                        (m for m in range(S, min(2 * S, B) + 1, S)
                         if B % m == 0), default=S)
                else:
                    M = self.pp_microbatches or max(
                        m for m in range(1, min(2 * S, B) + 1) if B % m == 0)
                x = pipeline_apply(block_fn, self.pp_axis, S, M,
                                   stacked, x, cond_vec,
                                   interleave=self.pp_interleave)
        else:
            x = run_level(x, self.levels[-1], "mid")

        for i, spec in reversed(list(enumerate(self.levels[:-1]))):
            x = TokenSplit(spec.width, 2, dtype, name=f"split_{i}")(
                x, skips.pop())
            x = run_level(x, spec, f"up_{i}")

        x = RMSNorm(dtype=dtype, name="norm_out")(x)
        p = self.patch_size
        x = nn.Dense(self.channels * p * p, use_bias=False, dtype=dtype,
                     kernel_init=nn.initializers.zeros, name="patch_out")(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, p, p, self.channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p,
                                                  self.channels)
        return x.astype(jnp.float32)


def hdit_from_config(config, channels: int, n_classes: int, dtype,
                     dual_time: bool = False, ring_axis=None,
                     ring_axis_size: int = 1, ep_axis=None,
                     ep_axis_size: int = 1, pp_axis=None,
                     pp_axis_size: int = 1) -> HDiT:
    """Build an HDiT from flat flow-section config keys (``ldcfg``
    precedence). Defaults are the reference branch's exact printed spec
    (train_flow.py:294-299: two levels (2,256,768)/(4,512,1536), global
    d_head=64 attention, patch 4); ``hdit_attns`` entries may be 'global'
    or 'na[:k]' to put Pallas neighborhood attention at outer levels.
    ``hdit_moe_experts`` (per-level list, 0 = dense) turns a level's FFNs
    into MoE blocks (``hdit_moe_top_k``/``hdit_moe_capacity`` tune the
    router); expert parallelism rides ``flow.n_model`` + ``flow.moe_ep``
    (train_flow.py passes ep_axis='model'). ``hdit_pp_stages`` (>0) stacks
    the mid level's block pairs (nn.scan layout) so training can run them
    as a GPipe pipeline over the mesh 'model' axis (``flow.pp``,
    parallel/pipeline.py); off-mesh the stack replays sequentially, so
    serving from a pp checkpoint needs no mesh."""
    from ..config import ldcfg

    depths = [int(d) for d in ldcfg(config, "hdit_depths", [2, 4])]
    widths = [int(w) for w in ldcfg(config, "hdit_widths", [256, 512])]
    d_ffs = [int(f) for f in
             ldcfg(config, "hdit_d_ffs", [3 * w for w in widths])]
    d_head = int(ldcfg(config, "hdit_d_head", 64))
    attns = [str(a) for a in
             ldcfg(config, "hdit_attns", ["global"] * len(depths))]
    moes = [int(m) for m in
            ldcfg(config, "hdit_moe_experts", [0] * len(depths))]
    moe_top_k = int(ldcfg(config, "hdit_moe_top_k", 2))
    moe_cap = float(ldcfg(config, "hdit_moe_capacity", 1.25))
    if not (len(depths) == len(widths) == len(d_ffs) == len(attns)
            == len(moes)):
        raise SystemExit("hdit_depths/hdit_widths/hdit_d_ffs/hdit_attns/"
                         "hdit_moe_experts must have equal lengths")
    levels = []
    for depth, width, d_ff, attn, moe in zip(depths, widths, d_ffs, attns,
                                             moes):
        if attn.startswith("na"):
            k = int(attn.split(":", 1)[1]) if ":" in attn else 7
            spec = NeighborhoodAttentionSpec(d_head=d_head, kernel_size=k)
        else:
            spec = GlobalAttentionSpec(d_head=d_head)
        levels.append(LevelSpec(depth=depth, width=width, d_ff=d_ff,
                                self_attn=spec, moe_experts=moe,
                                moe_top_k=moe_top_k, moe_capacity=moe_cap))
    mapping = MappingSpec(
        depth=int(ldcfg(config, "hdit_mapping_depth", 2)),
        width=int(ldcfg(config, "hdit_mapping_width", 256)),
        d_ff=int(ldcfg(config, "hdit_mapping_d_ff", 768)))
    pp_stages = int(ldcfg(config, "hdit_pp_stages", 0))
    # flow.pp_schedule=interleaved (VERDICT r3 #5): the virtual-chunk
    # schedule with flow.pp_interleave chunks/device (default 2); 'gpipe'
    # stays the oracle default (parallel/pipeline.py)
    pp_schedule = str(ldcfg(config, "pp_schedule", "gpipe")).lower()
    if pp_schedule not in ("gpipe", "interleaved"):
        raise SystemExit(f"flow.pp_schedule={pp_schedule!r} must be "
                         "'gpipe' or 'interleaved'")
    pp_interleave = (int(ldcfg(config, "pp_interleave", 2))
                     if pp_schedule == "interleaved" else 1)
    if pp_stages:
        if levels[-1].moe_experts:
            raise SystemExit("hdit_pp_stages does not combine with a MoE "
                             "mid level (set hdit_moe_experts[-1]=0)")
        if levels[-1].depth % (pp_stages * pp_interleave):
            raise SystemExit(
                f"hdit_pp_stages={pp_stages}×pp_interleave={pp_interleave} "
                f"must divide the mid-level depth ({levels[-1].depth})")
    return HDiT(levels=tuple(levels), mapping=mapping, channels=channels,
                patch_size=int(ldcfg(config, "hdit_patch_size", 4)),
                n_classes=n_classes, dual_time=dual_time, dtype=dtype,
                ring_axis=ring_axis, ring_axis_size=ring_axis_size,
                ep_axis=ep_axis, ep_axis_size=ep_axis_size,
                pp_stages=pp_stages,
                pp_axis=pp_axis, pp_axis_size=pp_axis_size,
                pp_microbatches=int(ldcfg(config, "hdit_pp_microbatches",
                                          0)),
                pp_interleave=pp_interleave)
