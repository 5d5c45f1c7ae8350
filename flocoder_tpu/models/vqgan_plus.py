"""VQGAN+ codec: purely-convolutional encoder/decoder + RVQ, NHWC linen.

Reference: flocoder/vqgan_plus.py — symmetric two-resblocks-per-stage
encoder/decoder with no attention (:53-135), the same ResidualVQ bottleneck
as the VQVAE (:359-370), LeCAM discriminator regularization (:260-262), and
the GaussianBlur/spectral-norm discriminators (implemented in
models/discriminator.py). Channel-multiplier selection by num_downsamples
mirrors vqgan_plus.py:332-343.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.rvq import rvq_apply, rvq_init
from .codecs import _conv, gn_groups

__all__ = ["VQGANPlus", "VQGANPlusEncoder", "VQGANPlusDecoder",
           "VQGANPlusResidualBlock", "lecam_loss", "multipliers_for"]


def multipliers_for(num_downsamples: int) -> Tuple[int, ...]:
    """(reference: vqgan_plus.py:332-343)."""
    if num_downsamples == 3:
        return (1, 2, 4)
    if num_downsamples == 4:
        return (1, 1, 2, 4)
    if num_downsamples == 5:
        return (1, 1, 2, 2, 4)
    return tuple([1] + [2 ** min(i, 2) for i in range(num_downsamples - 1)])


# canonical definition lives in metrics (wired into the GAN step via
# metrics.discriminator_loss_lecam); re-exported here for API parity with
# the reference's vqgan_plus module (vqgan_plus.py:260-262)
from ..metrics import lecam_loss  # noqa: E402,F401


class VQGANPlusResidualBlock(nn.Module):
    """conv3×3(stride)→GN→SiLU→conv3×3→GN → +skip → SiLU
    (reference: vqgan_plus.py:11-50)."""
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32
    # W8A8 int8 convs for inference (ops/quant.py); param tree unchanged
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        g = gn_groups(8, self.out_channels)
        h = _conv(self.quant, self.out_channels, (3, 3), "Conv_0", self.dtype,
                  strides=self.stride, padding=1)(x)
        h = nn.GroupNorm(num_groups=g, dtype=self.dtype, epsilon=1e-5)(h)
        h = nn.silu(h)
        h = _conv(self.quant, self.out_channels, (3, 3), "Conv_1", self.dtype,
                  padding=1)(h)
        h = nn.GroupNorm(num_groups=g, dtype=self.dtype, epsilon=1e-5)(h)
        if self.stride != 1 or c_in != self.out_channels:
            x = _conv(self.quant, self.out_channels, (1, 1), "Conv_2",
                      self.dtype, strides=self.stride)(x)
            x = nn.GroupNorm(num_groups=g, dtype=self.dtype, epsilon=1e-5)(x)
        return nn.silu(h + x)


class VQGANPlusEncoder(nn.Module):
    """(reference: vqgan_plus.py:53-89) + the 1×1→GN→SiLU→3×3 compression to
    vq_embedding_dim (vqgan_plus.py:376-381)."""
    base_channels: int = 128
    channel_multipliers: Sequence[int] = (1, 2, 4)
    latent_channels: int = 256
    vq_embedding_dim: int = 8
    dtype: Any = jnp.float32
    # W8A8 int8 convs for the inference-only pre-encode pass (ops/quant.py);
    # the compression head (→vq_embedding_dim) stays in self.dtype.
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        h = _conv(self.quant, self.base_channels, (3, 3), "Conv_0",
                  self.dtype, padding=1)(x)
        for mult in self.channel_multipliers:
            ch = self.base_channels * mult
            h = VQGANPlusResidualBlock(ch, stride=2, dtype=self.dtype,
                                       quant=self.quant)(h)
            h = VQGANPlusResidualBlock(ch, stride=1, dtype=self.dtype,
                                       quant=self.quant)(h)
        h = _conv(self.quant, self.latent_channels, (3, 3), "Conv_1",
                  self.dtype, padding=1)(h)
        h = nn.GroupNorm(num_groups=gn_groups(8, self.latent_channels), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        # compression head
        h = nn.Conv(self.vq_embedding_dim, (1, 1), dtype=self.dtype,
                    name="Conv_2")(h)
        h = nn.GroupNorm(num_groups=gn_groups(8, self.vq_embedding_dim), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(self.vq_embedding_dim, (3, 3), padding=1,
                       dtype=self.dtype, name="Conv_3")(h)


class VQGANPlusDecoder(nn.Module):
    """(reference: vqgan_plus.py:90-135): init conv from latents, per stage
    nearest-2× upsample + two resblocks, final upsample + output conv."""
    out_channels: int = 3
    base_channels: int = 128
    channel_multipliers: Sequence[int] = (1, 2, 4)
    vq_embedding_dim: int = 8
    dtype: Any = jnp.float32
    # W8A8 int8 convs for serving (ops/quant.py); the output head stays in
    # self.dtype to protect final pixel values.
    quant: bool = False

    @nn.compact
    def __call__(self, z):
        rev = list(reversed(self.channel_multipliers))
        ch0 = self.base_channels * rev[0]
        h = _conv(self.quant, ch0, (3, 3), "Conv_0", self.dtype,
                  padding=1)(z)
        h = nn.GroupNorm(num_groups=gn_groups(8, ch0), epsilon=1e-5, dtype=self.dtype)(h)
        h = nn.silu(h)
        for mult in rev[1:]:
            ch = self.base_channels * mult
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = VQGANPlusResidualBlock(ch, dtype=self.dtype,
                                       quant=self.quant)(h)
            h = VQGANPlusResidualBlock(ch, dtype=self.dtype,
                                       quant=self.quant)(h)
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="Conv_1")(h)


class VQGANPlus:
    """Codec-interface wrapper (same functional contract as
    models.codecs.VQVAE) (reference: vqgan_plus.py:315-438)."""

    def __init__(self, in_channels=3, hidden_channels=128, num_downsamples=4,
                 vq_num_embeddings=1024, internal_dim=256, codebook_levels=4,
                 vq_embedding_dim=8, commitment_weight=0.25,
                 dtype=jnp.float32, quant_decode=False, quant_encode=False):
        self.in_channels = in_channels
        self.num_downsamples = num_downsamples
        self.codebook_levels = codebook_levels
        self.vq_num_embeddings = vq_num_embeddings
        self.vq_embedding_dim = vq_embedding_dim
        self.commitment_weight = commitment_weight
        mults = multipliers_for(num_downsamples)
        self.encoder = VQGANPlusEncoder(
            base_channels=hidden_channels, channel_multipliers=mults,
            latent_channels=internal_dim, vq_embedding_dim=vq_embedding_dim,
            dtype=dtype, quant=quant_encode)
        self.decoder = VQGANPlusDecoder(
            out_channels=in_channels, base_channels=hidden_channels,
            channel_multipliers=mults, vq_embedding_dim=vq_embedding_dim,
            dtype=dtype, quant=quant_decode)

    def init(self, rng, sample) -> dict:
        k_e, k_d, k_vq = jax.random.split(rng, 3)
        enc = self.encoder.init(k_e, sample)
        z = self.encoder.apply(enc, sample)
        dec = self.decoder.init(k_d, z)
        vq = rvq_init(k_vq, self.codebook_levels, self.vq_num_embeddings,
                      self.vq_embedding_dim)
        return {"encoder": enc, "decoder": dec, "vq": vq}

    def encode(self, params, x, **_):
        return self.encoder.apply(params["encoder"], x)

    def quantize(self, params, z, train: bool = False, rng=None,
                 axis_name=None):
        b, h, w, c = z.shape
        z_q, idx, loss, new_vq = rvq_apply(
            params["vq"], z.reshape(-1, c), train=train, rng=rng,
            commitment_weight=self.commitment_weight, axis_name=axis_name)
        return (z_q.reshape(b, h, w, c), idx.reshape(b, h, w, -1), loss,
                new_vq)

    def decode(self, params, z_q, **_):
        return self.decoder.apply(params["decoder"], z_q)

    def forward(self, params, x, train: bool = False, rng=None,
                axis_name=None, **_):
        z = self.encode(params, x)
        z_q, idx, commit_loss, new_vq = self.quantize(
            params, z, train=train, rng=rng, axis_name=axis_name)
        recon = self.decode(params, z_q)
        return recon, commit_loss, idx, new_vq

    def latent_shape(self, image_size: int) -> Tuple[int, int, int]:
        s = image_size // (2 ** self.num_downsamples)
        return (s, s, self.vq_embedding_dim)
