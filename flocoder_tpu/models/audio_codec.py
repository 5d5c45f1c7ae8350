"""DAC-style neural audio codec — 1-D conv RVQ autoencoder, NLC linen.

Closes the reference's README.md:144 TODO "Add audio example, e.g. using
DAC" (the Descript audio codec, arXiv:2306.06546) as a first-class codec
family: Snake-activated residual encoder with strided downsampling, the
SAME first-party residual-VQ bottleneck as the image codecs (ops/rvq.py —
EMA codebooks, k-means init, rotation trick, psum'd stats under DP), and a
transposed-conv Snake decoder. Trained with the DAC recipe's reconstruction
terms (multi-scale log-mel + STFT losses, ops/audio.py) — the adversarial
terms are an extension point, not required for the example pipeline.

TPU-first: NLC layout (time is the single spatial axis — XLA tiles 1-D
convs onto the MXU exactly like 2-D ones), static crop lengths, explicit
RNG keys, and a fold/unfold pair that reshapes (B, T', D) latent sequences
into square (B, H, W, D) latent images so the ENTIRE existing flow stack
(pre-encode → train_flow → generate) runs on audio unchanged — the audio
twin of the reference's square⇄rect MIDI layout trick (pianoroll.py:23-33).
"""
from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.rvq import rvq_apply, rvq_init

__all__ = ["Snake", "ResidualUnit1D", "DACEncoder", "DACDecoder", "DACCodec",
           "fold_latents", "unfold_latents"]


class Snake(nn.Module):
    """Snake activation x + sin²(αx)/α with per-channel learnable α
    (BigVGAN/DAC periodic inductive bias; α parameterized in log space so it
    stays positive)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        log_alpha = self.param("log_alpha", nn.initializers.zeros, (c,))
        alpha = jnp.exp(log_alpha).astype(x.dtype)
        return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


class ResidualUnit1D(nn.Module):
    """snake → dilated conv(k=7) → snake → conv(k=1), residual add."""
    dim: int
    dilation: int = 1
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Snake()(x)
        h = nn.Conv(self.dim, (7,), kernel_dilation=(self.dilation,),
                    padding="SAME", dtype=self.dtype)(h)
        h = Snake()(h)
        # zero-init output projection: each unit starts as identity, so the
        # 12-unit residual chain can't amplify activations at init (without
        # this, encoder-output std ≈ 13 and the decoder's tanh saturates —
        # the role DAC's weight norm plays, done the flax way; same
        # convention as models/hdit.py's zero-init projections)
        h = nn.Conv(self.dim, (1,), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros)(h)
        return x + h


class DACEncoder(nn.Module):
    """(B, T, 1) waveform → (B, T/prod(strides), vq_embedding_dim) latents.
    Per stage: 3 dilated residual units then a snake + strided conv that
    doubles channels (DAC encoder topology)."""
    strides: Sequence[int] = (2, 4, 8, 8)
    base_channels: int = 32
    vq_embedding_dim: int = 8
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.base_channels
        h = nn.Conv(c, (7,), padding="SAME", dtype=self.dtype)(x)
        for s in self.strides:
            for d in (1, 3, 9):
                h = ResidualUnit1D(c, dilation=d, dtype=self.dtype)(h)
            c *= 2
            h = Snake()(h)
            h = nn.Conv(c, (2 * s,), strides=(s,), padding="SAME",
                        dtype=self.dtype)(h)
        h = Snake()(h)
        h = nn.Conv(self.vq_embedding_dim, (3,), padding="SAME",
                    dtype=self.dtype)(h)
        return h.astype(jnp.float32)


class DACDecoder(nn.Module):
    """(B, T', D) latents → (B, T, 1) waveform in [-1, 1] (tanh head).
    Per stage: snake + transposed conv halving channels, then 3 residual
    units (DAC decoder topology, mirrored from the encoder)."""
    strides: Sequence[int] = (2, 4, 8, 8)   # encoder order; applied reversed
    base_channels: int = 32
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, z):
        c = self.base_channels * (2 ** len(self.strides))
        h = nn.Conv(c, (7,), padding="SAME", dtype=self.dtype)(z)
        for s in reversed(tuple(self.strides)):
            c //= 2
            h = Snake()(h)
            h = nn.ConvTranspose(c, (2 * s,), strides=(s,), padding="SAME",
                                 dtype=self.dtype)(h)
            for d in (1, 3, 9):
                h = ResidualUnit1D(c, dilation=d, dtype=self.dtype)(h)
        h = Snake()(h)
        h = nn.Conv(1, (7,), padding="SAME", dtype=self.dtype)(h)
        return jnp.tanh(h.astype(jnp.float32))


def fold_latents(z: jax.Array) -> jax.Array:
    """(B, T', D) latent sequence → (B, H, W, D) square latent image,
    H = W = √T' (row-major time). The flow stack then treats audio latents
    exactly like image latents — pick crop_len so T' is a perfect square."""
    b, t, d = z.shape
    h = int(math.isqrt(t))
    if h * h != t:
        raise ValueError(f"latent length {t} is not a perfect square; choose "
                         f"crop_len = (H²)·prod(strides)")
    return z.reshape(b, h, h, d)


def unfold_latents(z: jax.Array) -> jax.Array:
    """(B, H, W, D) latent image → (B, H·W, D) sequence (fold inverse)."""
    b, h, w, d = z.shape
    return z.reshape(b, h * w, d)


class DACCodec:
    """DAC-family audio codec with the codec-zoo contract (codecs.py:
    encode/quantize/decode/forward; params carry an ops.rvq.RVQState under
    "vq" so EMA updates stay jit/psum-compatible like VQVAE's).

    ``decode`` accepts either (B, T', D) sequences or (B, H, W, D) folded
    latent images (unfolded internally), so generate_samples / evaluation
    drive it exactly like an image codec and get waveforms back.
    """

    is_audio = True

    def __init__(self, sample_rate: int = 16000,
                 strides: Sequence[int] = (2, 4, 8, 8),
                 base_channels: int = 32, vq_embedding_dim: int = 8,
                 codebook_levels: int = 4, vq_num_embeddings: int = 512,
                 commitment_weight: float = 0.25, dtype=jnp.float32):
        self.sample_rate = int(sample_rate)
        self.strides = tuple(int(s) for s in strides)
        self.hop = int(np.prod(self.strides))
        self.in_channels = 1
        self.vq_embedding_dim = vq_embedding_dim
        self.codebook_levels = codebook_levels
        self.vq_num_embeddings = vq_num_embeddings
        self.commitment_weight = commitment_weight
        self.encoder = DACEncoder(strides=self.strides,
                                  base_channels=base_channels,
                                  vq_embedding_dim=vq_embedding_dim,
                                  dtype=dtype)
        self.decoder = DACDecoder(strides=self.strides,
                                  base_channels=base_channels, dtype=dtype)

    def init(self, rng, sample) -> dict:
        if sample.ndim == 2:
            sample = sample[..., None]
        k_enc, k_dec, k_vq = jax.random.split(rng, 3)
        enc = self.encoder.init(k_enc, sample)
        z = self.encoder.apply(enc, sample)
        dec = self.decoder.init(k_dec, z)
        vq = rvq_init(k_vq, self.codebook_levels, self.vq_num_embeddings,
                      self.vq_embedding_dim)
        return {"encoder": enc, "decoder": dec, "vq": vq}

    def encode(self, params, x, **_):
        if x.ndim == 2:
            x = x[..., None]
        return self.encoder.apply(params["encoder"], x)

    def quantize(self, params, z, train: bool = False, rng=None,
                 axis_name=None):
        """Latents (B,T',D) or folded (B,H,W,D) → (z_q, indices (...,L),
        commit_loss, new_vq) — same contract as VQVAE.quantize."""
        shape = z.shape
        flat = z.reshape(-1, shape[-1])
        z_q, idx, loss, new_vq = rvq_apply(
            params["vq"], flat, train=train, rng=rng,
            commitment_weight=self.commitment_weight, axis_name=axis_name)
        return (z_q.reshape(shape), idx.reshape(*shape[:-1], -1), loss,
                new_vq)

    def decode(self, params, z, **_):
        if z.ndim == 4:   # folded latent image from the flow stack
            z = unfold_latents(z)
        return self.decoder.apply(params["decoder"], z)

    def forward(self, params, x, train: bool = False, rng=None,
                axis_name=None):
        """Full autoencode → (recon, commit_loss, indices, new_vq_state)."""
        k_q = rng
        z = self.encode(params, x)
        z_q, idx, commit_loss, new_vq = self.quantize(
            params, z, train=train, rng=k_q, axis_name=axis_name)
        recon = self.decode(params, z_q)
        return recon, commit_loss, idx, new_vq

    # -- flow-stack integration ----------------------------------------------
    def latent_shape(self, crop_len: int) -> Tuple[int, int, int]:
        """Folded (H, W, D) latent-image shape for a waveform crop length —
        the audio analog of image codecs' latent_shape(image_size)."""
        t = int(crop_len) // self.hop
        h = int(math.isqrt(t))
        if h * h != t:
            raise ValueError(
                f"crop_len {crop_len} gives latent length {t}, not a perfect "
                f"square; use crop_len = H²·{self.hop} (e.g. "
                f"{8 * 8 * self.hop} → 8×8)")
        return (h, h, self.vq_embedding_dim)
