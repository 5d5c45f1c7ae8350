"""Waveform discriminators for the DAC codec's adversarial stage.

HiFi-GAN/DAC-style pair (VERDICT r4 #3 — the mel/STFT-only recipe leaves
phase unpinned, measured as ~0 dB waveform SNR at the quality-run scale):

- **Multi-period discriminator (MPD)**: for each period p the waveform
  (B, T, 1) is reshaped to a (B, T/p, p, 1) "image" and judged by a stack
  of 2-D convs with (5, 1) kernels striding over time only — each column
  is one phase offset of the period, so periodic artifacts (the classic
  vocoder failure) show up as column-correlated patterns. TPU-first: the
  reshape turns the strided 1-D problem into dense NHWC convs that XLA
  tiles straight onto the MXU; no gather/transpose traffic.
- **Multi-scale discriminator (MSD)**: 1-D conv stacks on the raw
  waveform and avg-pooled 2×/4× versions — catches broadband/envelope
  artifacts the period views miss.

Both return per-stage feature maps for the feature-matching loss, the same
(logits, features) contract as the image PatchDiscriminator
(models/discriminator.py), so the GAN step machinery is shared. Plain
convs + LeakyReLU (no weight norm — its optimization role is covered by
the zero-init residual convention used across this codebase and Adam;
divergence from DAC documented here).

Reference pattern: the VQGAN adversarial stage at
/root/reference/train_vqgan.py:213-246 (same warmup→GAN two-phase
skeleton, new domain — the reference has no audio family at all).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PeriodDiscriminator", "ScaleDiscriminator", "DACDiscriminator"]


class PeriodDiscriminator(nn.Module):
    """One period view: (B, T, 1) → folded (B, T//p, p, 1) → conv stack.
    Kernel (5,1)/stride (3,1) over time, channels doubling per stage
    (HiFi-GAN MPD topology scaled by ``base_channels``)."""
    period: int
    base_channels: int = 32
    n_layers: int = 4
    max_channels: int = 512
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, list]:
        b, t, _ = x.shape
        p = self.period
        pad = (-t) % p
        if pad:
            # reflect-pad so the fold is exact (T must divide by p);
            # static shapes — pad amount is a Python int at trace time
            x = jnp.concatenate([x, x[:, t - pad:, :][:, ::-1, :]], axis=1)
        h = x.reshape(b, (t + pad) // p, p, 1).astype(self.dtype)
        feats = []
        c = self.base_channels
        for _ in range(self.n_layers):
            h = nn.Conv(min(c, self.max_channels), (5, 1), strides=(3, 1),
                        padding="SAME", dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
            c *= 4
        h = nn.Conv(min(c, self.max_channels), (5, 1), padding="SAME",
                    dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.1)
        feats.append(h)
        logits = nn.Conv(1, (3, 1), padding="SAME", dtype=self.dtype)(h)
        return logits.astype(jnp.float32), feats


class ScaleDiscriminator(nn.Module):
    """One scale view: avg-pool the waveform ``pool``×, then a 1-D conv
    stack (kernel 15 stem, grouped 41-kernels, HiFi-GAN MSD topology
    scaled by ``base_channels``)."""
    pool: int = 1
    base_channels: int = 32
    n_layers: int = 4
    max_channels: int = 512
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, list]:
        h = x.astype(self.dtype)
        if self.pool > 1:
            h = nn.avg_pool(h, (self.pool,), strides=(self.pool,),
                            padding="SAME")
        h = nn.Conv(self.base_channels, (15,), padding="SAME",
                    dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.1)
        feats = [h]
        c = self.base_channels
        for _ in range(self.n_layers):
            c = min(c * 4, self.max_channels)
            groups = max(1, min(4, c // 16))
            h = nn.Conv(c, (41,), strides=(4,), padding="SAME",
                        feature_group_count=groups, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.1)
            feats.append(h)
        h = nn.Conv(min(2 * c, self.max_channels), (5,), padding="SAME",
                    dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.1)
        feats.append(h)
        logits = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype)(h)
        return logits.astype(jnp.float32), feats


class DACDiscriminator(nn.Module):
    """The full adversarial ensemble: MPD over ``periods`` + MSD over
    ``scales`` pooling octaves. ``__call__(x: (B,T,1))`` →
    (list of per-discriminator logits, list of per-discriminator feature
    lists) — consumed by training/audio.py:make_audio_gan_step."""
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    scales: int = 3
    base_channels: int = 32
    n_layers: int = 4
    max_channels: int = 512
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[list, list]:
        if x.ndim == 2:
            x = x[..., None]
        logits, feats = [], []
        for p in self.periods:
            l, f = PeriodDiscriminator(
                p, self.base_channels, self.n_layers, self.max_channels,
                self.dtype, name=f"mpd_{p}")(x)
            logits.append(l)
            feats.append(f)
        for s in range(self.scales):
            l, f = ScaleDiscriminator(
                2 ** s, self.base_channels, self.n_layers,
                self.max_channels, self.dtype, name=f"msd_{2 ** s}")(x)
            logits.append(l)
            feats.append(f)
        return logits, feats
