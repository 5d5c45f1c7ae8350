"""Audio signal ops: STFT, mel filterbanks, multi-scale spectral losses.

Supports the DAC-style audio codec (models/audio_codec.py) — the reference's
README.md:144 TODO "Add audio example, e.g. using DAC". Everything here is
jit-friendly and static-shaped: framing is a strided gather, the mel
filterbank is a host-built constant matmul (MXU-friendly), and the losses
follow the Descript-audio-codec recipe (multi-scale log-mel L1 + STFT
spectral-convergence/log-magnitude terms) without any torch/librosa
dependency.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["stft", "mel_filterbank", "multiscale_stft_loss",
           "multiscale_mel_loss"]


def _hann(win: int) -> np.ndarray:
    # periodic Hann (matches torch.stft / librosa defaults)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win) / win)


def stft(x: jax.Array, n_fft: int, hop: int | None = None) -> jax.Array:
    """Magnitude STFT of (B, T) → (B, frames, n_fft//2 + 1), fp32.

    Center-padded (reflect) like torch.stft(center=True); window = periodic
    Hann of length n_fft. Framing is one gather with a static index matrix —
    XLA lowers it to a cheap dynamic-slice loop-free pattern.
    """
    if x.ndim == 3 and x.shape[-1] == 1:
        x = x[..., 0]
    assert x.ndim == 2, f"stft expects (B, T), got {x.shape}"
    hop = hop or n_fft // 4
    x = x.astype(jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    t = x.shape[1]
    n_frames = 1 + (t - n_fft) // hop
    idx = (np.arange(n_fft)[None, :] +
           hop * np.arange(n_frames)[:, None])  # (frames, n_fft), static
    frames = x[:, idx] * jnp.asarray(_hann(n_fft), jnp.float32)
    return jnp.abs(jnp.fft.rfft(frames, axis=-1))


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(n_fft//2+1, n_mels) triangular HTK-mel filterbank, host-built once
    (lru-cached) and folded into the jitted loss as a constant matmul."""
    fmax = fmax or sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    lower = hz_pts[:-2][None, :]   # (1, n_mels)
    center = hz_pts[1:-1][None, :]
    upper = hz_pts[2:][None, :]
    f = fft_freqs[:, None]         # (n_bins, 1)
    up = (f - lower) / np.maximum(center - lower, 1e-10)
    down = (upper - f) / np.maximum(upper - center, 1e-10)
    fb = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def multiscale_stft_loss(x: jax.Array, y: jax.Array,
                         fft_sizes=(2048, 512)) -> jax.Array:
    """DAC-style multi-resolution STFT loss between waveforms (B, T):
    mean over scales of [spectral convergence + log-magnitude L1]."""
    total = 0.0
    for n_fft in fft_sizes:
        sx = stft(x, n_fft)
        sy = stft(y, n_fft)
        sc = jnp.linalg.norm(sx - sy) / jnp.maximum(jnp.linalg.norm(sx), 1e-6)
        logmag = jnp.mean(jnp.abs(jnp.log(sx + 1e-5) - jnp.log(sy + 1e-5)))
        total = total + sc + logmag
    return total / len(fft_sizes)


def multiscale_mel_loss(x: jax.Array, y: jax.Array, sample_rate: int,
                        fft_sizes=(512, 1024, 2048),
                        n_mels=(40, 80, 160)) -> jax.Array:
    """Multi-scale log-mel L1 (the DAC reconstruction loss family): mean
    over (n_fft, n_mels) pairs of |log-mel(x) − log-mel(y)|."""
    total = 0.0
    for n_fft, nm in zip(fft_sizes, n_mels):
        nm = min(nm, n_fft // 2)  # keep filters non-degenerate at tiny n_fft
        fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, nm))
        mx = jnp.log(stft(x, n_fft) @ fb + 1e-5)
        my = jnp.log(stft(y, n_fft) @ fb + 1e-5)
        total = total + jnp.mean(jnp.abs(mx - my))
    return total / len(fft_sizes)
