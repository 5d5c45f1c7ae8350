"""Image codecs: NoOp, SimpleResize, and the VQGAN-style VQVAE — NHWC linen.

Reference inventory (flocoder/codecs.py): interchangeable codecs behind a
common encode/decode/forward contract (SURVEY.md §2a "Codec zoo"):
- ``NoOpAE`` (codecs.py:623) and ``SimpleResizeAE`` (codecs.py:578-620) for
  running the flow pipeline without a trained codec,
- ``VQVAE`` (codecs.py:395-574): strided residual encoder with neighborhood
  attention on the last two scales, 1×1 compression to ``vq_embedding_dim``,
  ResidualVQ bottleneck, PixelShuffle decoder with NoiseInjection and RoPE
  non-local attention at latent resolution,
- ``SD_VAE_Wrapper`` lives in models/sd_vae.py,
- the ``setup_codec`` factory (codecs.py:668-741) dispatching on
  ``config.codec.choice``.

TPU-first: NHWC everywhere, attention as token-major MXU matmuls, NATTEN
replaced by ops.neighborhood_attention (Pallas/XLA), dropout/noise via
explicit linen RNG collections instead of global torch RNG.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.neighborhood_attention import na2d
from ..ops.quant import QuantConv
from ..ops.rvq import RVQState, rvq_apply, rvq_init

__all__ = ["gn_groups", "NoOpAE", "SimpleResizeAE", "VQVAE",
           "VQVAEEncoder", "VQVAEDecoder", "AttnBlock", "NATTENBlock",
           "EncDecResidualBlock", "NoiseInjection", "SpatialNonLocalAttention",
           "setup_codec"]


def _conv(quant: bool, features, kernel_size, name, dtype, **kw):
    """nn.Conv or its W8A8 int8 drop-in (ops/quant.py), under an EXPLICIT
    name matching nn.Conv's autonames ("Conv_<i>") so the parameter pytree —
    and every checkpoint/converter — is identical either way."""
    cls = QuantConv if quant else nn.Conv
    return cls(features, kernel_size, name=name, dtype=dtype, **kw)


def gn_groups(proposed: int, channels: int) -> int:
    """Nearest valid GroupNorm group count ≥ proposed that divides channels
    (reference: codecs.py:34-43)."""
    if channels % proposed == 0:
        return proposed
    for cand in range(proposed, channels):
        if channels % cand == 0:
            return cand
    return 1


# --------------------------------------------------------------------------
# Trivial codecs (test backends — reference: codecs.py:578-629)
# --------------------------------------------------------------------------

class NoOpAE:
    """Identity codec (reference: codecs.py:623-629). Latents are pixels."""
    in_channels = 3

    def __init__(self, in_channels: int = 3):
        self.in_channels = in_channels

    def init(self, rng, sample):
        return {}

    def encode(self, params, x, **_):
        return x

    def decode(self, params, z, **_):
        return z

    def latent_shape(self, image_size: int) -> Tuple[int, int, int]:
        return (image_size, image_size, self.in_channels)


class SimpleResizeAE:
    """Bilinear-resize pseudo-codec (reference: codecs.py:578-620): 'latents'
    are just a resized image, so the whole flow pipeline can run untrained."""

    def __init__(self, latent_shape=(32, 32, 3), image_size: int = 128,
                 method: str = "bilinear"):
        # accepts reference-style (C,H,W) lists for recipe compat
        if len(latent_shape) == 3 and latent_shape[0] <= 4 < latent_shape[-1]:
            c, h, w = latent_shape
            latent_shape = (h, w, c)
        self._latent_shape = tuple(latent_shape)
        self.image_size = image_size
        self.method = method
        self.in_channels = self._latent_shape[-1]

    def init(self, rng, sample):
        return {}

    def encode(self, params, x, **_):
        b = x.shape[0]
        h, w, c = self._latent_shape
        # antialias=False matches torch F.interpolate numerics (the
        # reference's resize path, codecs.py:598; parity test in
        # tests/test_parity_torch.py). Extra latent channels are copies of
        # the channel mean (reference: codecs.py:600-603), never spatial
        # interpolation across the channel axis.
        small = jax.image.resize(x, (b, h, w, x.shape[-1]),
                                 method=self.method, antialias=False)
        if c == x.shape[-1]:
            return small
        mean = jnp.mean(small, axis=-1, keepdims=True)
        extra = jnp.repeat(mean, c - x.shape[-1], axis=-1)
        return jnp.concatenate([small, extra], axis=-1)

    def decode(self, params, z, **_):
        b = z.shape[0]
        s = self.image_size
        # only the first 3 channels decode (reference: codecs.py:611-613)
        z = z[..., : min(3, z.shape[-1])]
        return jax.image.resize(z, (b, s, s, z.shape[-1]), method=self.method,
                                antialias=False)

    def latent_shape(self, image_size: int) -> Tuple[int, int, int]:
        return self._latent_shape


# --------------------------------------------------------------------------
# Building blocks
# --------------------------------------------------------------------------

class AttnBlock(nn.Module):
    """VQGAN-style single-head non-local block (reference: codecs.py:54-89):
    GroupNorm → 1×1 q/k/v → softmax attention over all tokens → 1×1 out,
    residual."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = nn.GroupNorm(num_groups=gn_groups(32, c), epsilon=1e-6,
                          dtype=self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype)(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype)(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype)(hn).reshape(b, h * w, c)
        logits = jnp.einsum("bnc,bmc->bnm", q, k,
                            preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype)(out)
        return x + out


class NATTENBlock(nn.Module):
    """Neighborhood-attention block (reference: codecs.py:93-145): GroupNorm →
    fused qkv projection → k×k window attention → out projection, residual
    gated by a zero-init gamma."""
    kernel_size: int = 7
    num_heads: int = 8
    init_scale: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        xn = nn.GroupNorm(num_groups=gn_groups(8, c), epsilon=1e-5, dtype=self.dtype)(x)
        init = nn.initializers.normal(self.init_scale)
        qkv = nn.Dense(3 * c, use_bias=False, kernel_init=init,
                       dtype=self.dtype)(xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = na2d(q, k, v, kernel_size=self.kernel_size, heads=self.num_heads)
        out = nn.Dense(c, use_bias=False, kernel_init=init,
                       dtype=self.dtype)(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), self.dtype)
        return x + out * gamma


class EncDecResidualBlock(nn.Module):
    """Strided residual block with optional attention (reference:
    codecs.py:150-214): conv3×3(stride)→GN→SiLU→dropout→[attn]→conv3×3→GN
    → +skip(1×1 proj if needed) → SiLU → dropout."""
    out_channels: int
    stride: int = 1
    attention: Optional[str] = None  # None | 'natten' | 'full'
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32
    # W8A8 int8 convs for inference (ops/quant.py); param tree unchanged
    quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c_in = x.shape[-1]
        h = _conv(self.quant, self.out_channels, (3, 3), "Conv_0", self.dtype,
                  strides=self.stride, padding=1)(x)
        h = nn.GroupNorm(num_groups=gn_groups(8, self.out_channels), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        if self.attention == "natten":
            h = NATTENBlock(dtype=self.dtype)(h)
        elif self.attention == "full":
            h = AttnBlock(dtype=self.dtype)(h)
        h = _conv(self.quant, self.out_channels, (3, 3), "Conv_1", self.dtype,
                  padding=1)(h)
        h = nn.GroupNorm(num_groups=gn_groups(8, self.out_channels), epsilon=1e-5,
                         dtype=self.dtype)(h)
        if self.stride != 1 or c_in != self.out_channels:
            x = _conv(self.quant, self.out_channels, (1, 1), "Conv_2",
                      self.dtype, strides=self.stride)(x)
            x = nn.GroupNorm(num_groups=gn_groups(8, self.out_channels), epsilon=1e-5,
                             dtype=self.dtype)(x)
        h = nn.silu(h + x)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h


class NoiseInjection(nn.Module):
    """Learned spatially-varying noise (reference: codecs.py:217-241):
    x + s·(noise·scale(x) + bias(x)) with zero-init 1×1 scale/bias convs; a
    no-op when strength is 0 (the default in the reference's live config)."""
    noise_strength: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, noise_strength: Optional[float] = None):
        s = self.noise_strength if noise_strength is None else noise_strength
        scale = nn.Conv(x.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                        dtype=self.dtype)(x)
        bias = nn.Conv(x.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                       dtype=self.dtype)(x)
        if s == 0.0:
            return x
        noise = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
        return x + s * (noise * scale + bias)


def _rope_1d(x: jax.Array, max_log: float = math.log(10000.0)) -> jax.Array:
    """1-D RoPE over flattened spatial tokens (reference: codecs.py:349-366)."""
    b, n, c = x.shape
    c_pad = c + (c % 2)
    if c_pad != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    half = c_pad // 2
    pos = jnp.arange(n)[:, None].astype(x.dtype)
    inv_freq = jnp.exp(-jnp.arange(half).astype(x.dtype) * max_log / half)
    ang = pos * inv_freq[None, :]
    sin, cos = jnp.sin(ang)[None], jnp.cos(ang)[None]
    x_even, x_odd = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x_even * cos - x_odd * sin,
                     x_odd * cos + x_even * sin], axis=-1).reshape(b, n, c_pad)
    return out[..., :c] if c_pad != c else out


class SpatialNonLocalAttention(nn.Module):
    """Full attention over flattened H·W tokens with 1-D RoPE on q/k
    (reference: codecs.py:336-382); zero-init output projection so the block
    starts as identity; residual.

    ``ring_axis``/``ring_axis_size`` (>1): sequence-parallel form — token
    chunks across the mesh axis with a ppermute K/V ring
    (parallel.ring_attention), for resolutions beyond one chip's HBM;
    requires tracing inside a shard_map binding that axis."""
    reduction_factor: int = 2
    dtype: Any = jnp.float32
    ring_axis: Any = None
    ring_axis_size: int = 1

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        rd = max(1, c // self.reduction_factor)
        small = nn.initializers.variance_scaling(1e-4, "fan_avg", "uniform")
        q = nn.Conv(rd, (1, 1), kernel_init=small, dtype=self.dtype)(x)
        k = nn.Conv(rd, (1, 1), kernel_init=small, dtype=self.dtype)(x)
        v = nn.Conv(c, (1, 1), kernel_init=small, dtype=self.dtype)(x)
        q = _rope_1d(q.reshape(b, h * w, rd))
        k = _rope_1d(k.reshape(b, h * w, rd))
        v = v.reshape(b, h * w, c)
        if self.ring_axis is not None and self.ring_axis_size > 1:
            from ..parallel.ring_attention import ring_attention_replicated
            out = ring_attention_replicated(
                q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
                self.ring_axis, self.ring_axis_size)[:, :, 0, :]
            out = out.reshape(b, h, w, c).astype(self.dtype)
        else:
            logits = jnp.einsum("bnc,bmc->bnm", q, k,
                                preferred_element_type=jnp.float32
                                ) * (q.shape[-1] ** -0.5)
            attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                      dtype=self.dtype)(out)
        return x + out


# --------------------------------------------------------------------------
# VQVAE encoder / decoder stacks
# --------------------------------------------------------------------------

class VQVAEEncoder(nn.Module):
    """Encoder (reference: codecs.py:413-443): per scale a stride-2 block plus
    a stride-1 block, neighborhood attention on the last two scales; then a
    projection to internal_dim and a 1×1→GN→SiLU→3×3 compression to
    vq_embedding_dim."""
    hidden_channels: int = 256
    num_downsamples: int = 3
    internal_dim: int = 128
    vq_embedding_dim: int = 4
    use_attention: bool = True
    dtype: Any = jnp.float32
    # W8A8 int8 convs for the inference-only pre-encode pass (ops/quant.py).
    # The compression head (→vq_embedding_dim, typically 4) falls below
    # MIN_QUANT_CHANNELS and stays in self.dtype, protecting the latents.
    quant: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 stop_before_compress: bool = False):
        h = x
        attention = None
        for i in range(self.num_downsamples):
            out_ch = self.hidden_channels * (2 ** i)
            attention = ("natten" if (self.use_attention and
                                      i >= self.num_downsamples - 2) else None)
            h = EncDecResidualBlock(out_ch, stride=2, attention=attention,
                                    dropout_rate=0.05, dtype=self.dtype,
                                    quant=self.quant)(h, deterministic)
            h = EncDecResidualBlock(out_ch, stride=1, attention=attention,
                                    dropout_rate=0.15, dtype=self.dtype,
                                    quant=self.quant)(h, deterministic)
        h = EncDecResidualBlock(self.internal_dim, stride=1,
                                attention=attention, dropout_rate=0.15,
                                dtype=self.dtype, quant=self.quant)(
                                    h, deterministic)
        h = _conv(self.quant, self.internal_dim, (1, 1), "Conv_0",
                  self.dtype)(h)
        if stop_before_compress:
            # hand-off point for the Pallas fused compress+VQ kernel
            # (ops.pallas.fused_vq.fused_compress_tail_vq consumes the
            # compression-head params directly)
            return h
        # compression head (reference: codecs.py:435-440)
        h = nn.Conv(self.vq_embedding_dim, (1, 1), dtype=self.dtype,
                    name="Conv_1")(h)
        h = nn.GroupNorm(num_groups=gn_groups(2, self.vq_embedding_dim), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.vq_embedding_dim, (3, 3), padding=1,
                    dtype=self.dtype, name="Conv_2")(h)
        return h


class VQVAEDecoder(nn.Module):
    """Decoder (reference: codecs.py:245-316): RoPE non-local attention at
    latent resolution, 1×1 expansion, then per scale conv→SiLU→PixelShuffle2×
    → NoiseInjection → two residual blocks; 3×3 head to pixels."""
    in_channels: int = 3
    hidden_channels: int = 256
    num_downsamples: int = 3
    internal_dim: int = 128
    vq_embedding_dim: int = 4
    decoder_nonlocal: bool = True
    use_attention: bool = True
    dtype: Any = jnp.float32
    ring_axis: Any = None
    ring_axis_size: int = 1
    # W8A8 int8 convs for serving (ops/quant.py); param tree unchanged.
    # Attention, NoiseInjection (zero-init 1×1s) and the output head stay
    # in self.dtype.
    quant: bool = False

    @nn.compact
    def __call__(self, z, deterministic: bool = True,
                 noise_strength: float = 0.0):
        from .unet import pixel_shuffle  # local import to avoid cycle

        n_conv = 0  # explicit names must mirror nn.Conv autonaming

        def cname():
            nonlocal n_conv
            n_conv += 1
            return f"Conv_{n_conv - 1}"

        h = z
        if self.decoder_nonlocal:
            h = SpatialNonLocalAttention(
                dtype=self.dtype, ring_axis=self.ring_axis,
                ring_axis_size=self.ring_axis_size)(h)
        cur = self.hidden_channels * (2 ** (self.num_downsamples - 1))
        h = _conv(self.quant, self.internal_dim, (1, 1), cname(),
                  self.dtype)(h)
        h = nn.GroupNorm(num_groups=gn_groups(self.vq_embedding_dim,
                                              self.internal_dim), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        h = _conv(self.quant, cur, (1, 1), cname(), self.dtype)(h)
        h = NoiseInjection(dtype=self.dtype)(h, noise_strength)
        first_attn = "full" if self.decoder_nonlocal else (
            "natten" if self.use_attention else None)
        h = EncDecResidualBlock(cur, attention=first_attn, dropout_rate=0.05,
                                dtype=self.dtype, quant=self.quant)(
                                    h, deterministic)
        for i in range(self.num_downsamples - 1, -1, -1):
            out_ch = self.hidden_channels * (2 ** max(0, i - 1))
            if i == 0:
                out_ch = self.hidden_channels
            attn = ("natten" if (self.use_attention and
                                 i > self.num_downsamples - 2) else None)
            h = _conv(self.quant, cur * 4, (3, 3), cname(), self.dtype,
                      padding=1)(h)
            h = nn.silu(h)
            h = pixel_shuffle(h, 2)
            h = NoiseInjection(dtype=self.dtype)(h, noise_strength)
            h = EncDecResidualBlock(out_ch, attention=attn, dropout_rate=0.0,
                                    dtype=self.dtype, quant=self.quant)(
                                        h, deterministic)
            h = NoiseInjection(dtype=self.dtype)(h, noise_strength)
            h = EncDecResidualBlock(out_ch, attention=None, dropout_rate=0.0,
                                    dtype=self.dtype, quant=self.quant)(
                                        h, deterministic)
            cur = out_ch
        h = NoiseInjection(dtype=self.dtype)(h, noise_strength)
        h = _conv(self.quant, 64, (3, 3), cname(), self.dtype, padding=1)(h)
        h = nn.silu(h)
        h = NoiseInjection(dtype=self.dtype)(h, noise_strength)
        # output head: high precision protects final pixel values
        return nn.Conv(self.in_channels, (3, 3), padding=1,
                       dtype=self.dtype, name=cname())(h)


class VQVAE:
    """VQGAN codec = encoder + residual-VQ bottleneck + decoder (reference:
    codecs.py:395-574). Pure-functional: ``params`` holds encoder/decoder
    linen params, ``vq`` (an ``ops.rvq.RVQState``) is carried explicitly so
    EMA codebook updates remain jit/psum-compatible."""

    def __init__(self, in_channels=3, hidden_channels=256, num_downsamples=3,
                 vq_num_embeddings=512, internal_dim=256, codebook_levels=3,
                 vq_embedding_dim=4, commitment_weight=0.25,
                 use_attention=True, decoder_nonlocal=True,
                 dtype=jnp.float32, ring_axis=None, ring_axis_size=1,
                 quant_decode=False, quant_encode=False):
        self.in_channels = in_channels
        self.num_downsamples = num_downsamples
        self.codebook_levels = codebook_levels
        self.vq_num_embeddings = vq_num_embeddings
        self.vq_embedding_dim = vq_embedding_dim
        self.commitment_weight = commitment_weight
        self.encoder = VQVAEEncoder(
            hidden_channels=hidden_channels, num_downsamples=num_downsamples,
            internal_dim=internal_dim, vq_embedding_dim=vq_embedding_dim,
            use_attention=use_attention, dtype=dtype, quant=quant_encode)
        self.decoder = VQVAEDecoder(
            in_channels=in_channels, hidden_channels=hidden_channels,
            num_downsamples=num_downsamples, internal_dim=internal_dim,
            vq_embedding_dim=vq_embedding_dim,
            decoder_nonlocal=decoder_nonlocal, use_attention=use_attention,
            dtype=dtype, ring_axis=ring_axis, ring_axis_size=ring_axis_size,
            quant=quant_decode)

    def init(self, rng, sample) -> dict:
        k_enc, k_dec, k_vq, k_noise = jax.random.split(rng, 4)
        enc = self.encoder.init({"params": k_enc}, sample)
        z = self.encoder.apply(enc, sample)
        dec = self.decoder.init({"params": k_dec, "noise": k_noise}, z)
        vq = rvq_init(k_vq, self.codebook_levels, self.vq_num_embeddings,
                      self.vq_embedding_dim)
        return {"encoder": enc, "decoder": dec, "vq": vq}

    # -- functional pieces --------------------------------------------------
    def encode(self, params, x, deterministic: bool = True, rng=None):
        rngs = {"dropout": rng} if rng is not None else None
        return self.encoder.apply(params["encoder"], x,
                                  deterministic=deterministic, rngs=rngs)

    def quantize(self, params, z, train: bool = False, rng=None,
                 axis_name=None):
        """NHWC latents → (z_q, indices (B,H,W,L), commit_loss, new_vq)
        (reference: codecs.py:504-521)."""
        b, h, w, c = z.shape
        flat = z.reshape(-1, c)
        z_q, idx, loss, new_vq = rvq_apply(
            params["vq"], flat, train=train, rng=rng,
            commitment_weight=self.commitment_weight, axis_name=axis_name)
        return (z_q.reshape(b, h, w, c), idx.reshape(b, h, w, -1), loss,
                new_vq)

    def encode_quantize_fused(self, params, x, tile_b: int = 4):
        # tile_b=4 keeps the per-tile RVQ distance matrices (tokens × K)
        # inside the 16 MB scoped-VMEM limit at the production config
        # (16² latents, K=512, L=3); tile_b=8 overflows by ~0.5 MB.
        """Inference-path encode+quantize with the compression tail and RVQ
        search fused in ONE Pallas kernel (1×1 → GN → SiLU → 3×3 → L VQ
        levels, no HBM round-trips between stages; reference:
        codecs.py:435-440, 504-521).

        Positioning (round-3 decision, VERDICT r2 #2): on hardware this ties
        the unfused XLA path on throughput — the encoder BODY dominates the
        encode pass, so fusing the tail cannot move the total. Its value is
        PRECISION: the kernel runs fp32 distance accumulation end-to-end and
        matches an fp64 pick oracle 100% (docs/BENCH_NOTES.md), where the
        default XLA path's bf16-mixed convs drift ~1% of picks. Off by
        default in pre-encoding (preencoding.fused_vq=true opts in);
        training keeps ops.rvq (EMA state updates).

        Returns (z_q (B,h,w,D), indices (B,h,w,L))."""
        from ..ops.pallas.fused_vq import fused_compress_tail_vq
        h = self.encoder.apply(params["encoder"], x,
                               stop_before_compress=True)
        enc = params["encoder"]["params"]
        d = self.vq_embedding_dim
        return fused_compress_tail_vq(
            h,
            enc["Conv_1"]["kernel"][0, 0], enc["Conv_1"]["bias"],
            enc["GroupNorm_0"]["scale"], enc["GroupNorm_0"]["bias"],
            enc["Conv_2"]["kernel"], enc["Conv_2"]["bias"],
            params["vq"].codebooks, groups=gn_groups(2, d), tile_b=tile_b)

    def decode(self, params, z_q, deterministic: bool = True,
               noise_strength: float = 0.0, rng=None):
        rngs = {}
        if rng is not None:
            k_d, k_n = jax.random.split(rng)
            rngs = {"dropout": k_d, "noise": k_n}
        return self.decoder.apply(params["decoder"], z_q,
                                  deterministic=deterministic,
                                  noise_strength=noise_strength,
                                  rngs=rngs or None)

    def forward(self, params, x, train: bool = False, rng=None,
                noise_strength: Optional[float] = None, axis_name=None):
        """Full autoencode (reference: codecs.py:544-574). Returns
        (recon, commit_loss, indices, new_vq_state)."""
        if noise_strength is None:
            noise_strength = 0.05 if train else 0.0
        if rng is not None:
            k_e, k_q, k_d = jax.random.split(rng, 3)
        else:
            k_e = k_q = k_d = None
        z = self.encode(params, x, deterministic=not train, rng=k_e)
        z_q, idx, commit_loss, new_vq = self.quantize(
            params, z, train=train, rng=k_q, axis_name=axis_name)
        recon = self.decode(params, z_q, deterministic=not train,
                            noise_strength=noise_strength, rng=k_d)
        return recon, commit_loss, idx, new_vq

    def latent_shape(self, image_size: int) -> Tuple[int, int, int]:
        s = image_size // (2 ** self.num_downsamples)
        return (s, s, self.vq_embedding_dim)


# --------------------------------------------------------------------------
# Factory
# --------------------------------------------------------------------------

def setup_codec(config, load_checkpoint: bool = True,
                ring_axis_size: int = 1, dtype=None):
    """Build a codec from ``config.codec.choice`` ∈ {noop, resize, sd,
    vqgan, vqgan_plus, dac} (reference: codecs.py:668-741; ``dac`` is the
    audio family, models/audio_codec.py). Returns the codec
    object; parameter loading is the caller's concern via
    training.checkpoint (kept separate so jit boundaries stay clean).

    Compute dtype: ``dtype`` argument when given (serving casts), else
    bfloat16 iff ``codec.bf16`` is set — deliberately codec-SCOPED, so
    ``flow.bf16`` (a train-step speed flag) can't silently change
    pre-encode latent precision.

    ``ring_axis_size`` > 1 with ``codec.ring_attention=true`` builds the
    VQVAE with sequence-parallel non-local attention over the mesh 'model'
    axis (see SpatialNonLocalAttention.ring_axis — callers must then run
    the codec under a shard_map binding that axis)."""
    from ..config import ldcfg
    choice = config.codec.choice if "codec" in config else "noop"
    image_size = ldcfg(config, "image_size", 128)
    in_channels = ldcfg(config, "in_channels", 3)
    if dtype is None:
        codec_bf16 = (bool(config.codec.get("bf16", False))
                      if "codec" in config else False)
        dtype = jnp.bfloat16 if codec_bf16 else jnp.float32
    if choice == "noop":
        return NoOpAE(in_channels=in_channels)
    if choice == "resize":
        lat = config.codec.get("latent_shape", [in_channels, 32, 32])
        return SimpleResizeAE(latent_shape=tuple(lat),
                              image_size=config.codec.get("image_size",
                                                          image_size))
    if choice == "sd":
        from .sd_vae import SDVAE
        # codec.quant_decode / codec.quant_encode = int8: W8A8 serving
        # decode / pre-encode encode (ops/quant.py) — measured 1.27-1.29×
        # over bf16 conv on v5e; param tree unchanged either way
        quant = str(ldcfg(config, "quant_decode", "")) == "int8"
        quant_e = str(ldcfg(config, "quant_encode", "")) == "int8"
        return SDVAE(image_size=image_size, dtype=dtype, quant_decode=quant,
                     quant_encode=quant_e)
    if choice == "dac":
        # DAC-style audio codec (models/audio_codec.py — reference
        # README.md:144 TODO "Add audio example, e.g. using DAC"). Audio
        # configs put waveform keys under codec.*; latent_shape() takes the
        # crop length instead of an image size.
        from .audio_codec import DACCodec
        return DACCodec(
            sample_rate=int(ldcfg(config, "sample_rate", 16000)),
            strides=tuple(ldcfg(config, "strides", [2, 4, 8, 8])),
            base_channels=int(ldcfg(config, "base_channels", 32)),
            vq_embedding_dim=int(ldcfg(config, "vq_embedding_dim", 8)),
            codebook_levels=int(ldcfg(config, "codebook_levels", 4)),
            vq_num_embeddings=int(ldcfg(config, "vq_num_embeddings", 512)),
            commitment_weight=float(ldcfg(config, "commitment_weight", 0.25)),
            dtype=dtype)
    if choice in ("vqgan", "vqgan_plus"):
        kw = dict(
            dtype=dtype,
            in_channels=in_channels,
            hidden_channels=ldcfg(config, "hidden_channels", 256),
            num_downsamples=ldcfg(config, "num_downsamples", 3),
            vq_num_embeddings=ldcfg(config, "vq_num_embeddings", 512),
            internal_dim=ldcfg(config, "internal_dim", 256),
            codebook_levels=ldcfg(config, "codebook_levels", 3),
            vq_embedding_dim=ldcfg(config, "vq_embedding_dim", 4),
            commitment_weight=ldcfg(config, "commitment_weight", 0.25),
            quant_decode=str(ldcfg(config, "quant_decode", "")) == "int8",
            quant_encode=str(ldcfg(config, "quant_encode", "")) == "int8",
        )
        if choice == "vqgan_plus":
            from .vqgan_plus import VQGANPlus
            return VQGANPlus(**kw)
        if bool(ldcfg(config, "ring_attention", False)) and ring_axis_size > 1:
            kw.update(ring_axis="model", ring_axis_size=ring_axis_size)
        return VQVAE(**kw)
    raise ValueError(f"Unknown codec choice: {choice}")
