"""Fréchet Inception Distance, fully on device.

Reference: flocoder/metrics.py:265-308 uses torchmetrics
``FrechetInceptionDistance(feature=2048)`` (InceptionV3 CUDA forward). Here
the statistics pipeline (feature means/covariances and the matrix sqrt via
Newton–Schulz iteration) is pure jitted JAX, and the feature extractor is
pluggable:

- default: a random-projection multi-scale pooled feature ("rp2048"),
  deterministic given a seed — NOT Inception features, so absolute values are
  not comparable to published FIDs, but monotone under the same distortions
  and self-consistent for tracking training progress (this environment has no
  network egress to fetch Inception weights; drop-in weights can be supplied
  later via ``feature_fn``).
- any callable ``feature_fn(images_uint8_nhwc) -> (N, D) features``.

``fid_score`` / ``fid_score_chunked`` mirror the reference's API
(metrics.py:291, :265).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["frechet_distance", "fid_score", "fid_score_chunked",
           "make_random_projection_features", "sqrtm_newton_schulz"]


def sqrtm_newton_schulz(A: jax.Array, n_iters: int = 20) -> jax.Array:
    """Matrix square root of a PSD matrix via the Newton–Schulz iteration
    (on-device replacement for scipy.linalg.sqrtm)."""
    dim = A.shape[0]
    norm = jnp.linalg.norm(A)
    Y = A / norm
    Z = jnp.eye(dim, dtype=A.dtype)
    I = jnp.eye(dim, dtype=A.dtype)

    def body(carry, _):
        Y, Z = carry
        T = 0.5 * (3.0 * I - Z @ Y)
        return (Y @ T, T @ Z), None

    (Y, Z), _ = jax.lax.scan(body, (Y, Z), None, length=n_iters)
    return Y * jnp.sqrt(norm)


@jax.jit
def frechet_distance(mu1, cov1, mu2, cov2) -> jax.Array:
    """FID between two Gaussians: |μ1−μ2|² + tr(C1 + C2 − 2·sqrt(C1 C2)).

    Covariances are regularized by a trace-relative ridge: with fewer samples
    than feature dims (the usual eval case — e.g. 256 samples, 2048-d
    features) the covariances are rank-deficient and the Newton–Schulz
    iteration on C1·C2 diverges to NaN with only an absolute 1e-6 ridge.
    The relative ridge biases FID slightly but identically for both inputs.
    """
    diff = mu1 - mu2
    dim = cov1.shape[0]
    scale = 0.5 * (jnp.trace(cov1) + jnp.trace(cov2)) / dim
    off = (1e-3 * scale + 1e-8) * jnp.eye(dim, dtype=cov1.dtype)
    c1, c2 = cov1 + off, cov2 + off
    covmean = sqrtm_newton_schulz(c1 @ c2)
    tr = jnp.trace(c1) + jnp.trace(c2) - 2.0 * jnp.trace(covmean)
    return jnp.dot(diff, diff) + tr


def _stats(feats: jax.Array):
    mu = feats.mean(axis=0)
    centered = feats - mu
    cov = (centered.T @ centered) / (feats.shape[0] - 1)
    return mu, cov


def make_random_projection_features(dim: int = 2048, seed: int = 0,
                                    image_size: int = 128) -> Callable:
    """Deterministic random-feature extractor: multi-scale average pooling of
    pixels followed by a fixed Gaussian projection + tanh nonlinearity. A
    stand-in for the Inception feature map (see module docstring)."""
    def feature_fn(images: jax.Array) -> jax.Array:
        x = images.astype(jnp.float32)
        if x.max() > 2.0:
            x = x / 127.5 - 1.0
        b = x.shape[0]
        feats = []
        for s in (8, 4, 2):
            pooled = jax.image.resize(x, (b, s, s, x.shape[-1]), "linear")
            feats.append(pooled.reshape(b, -1))
        flat = jnp.concatenate(feats, axis=1)
        key = jax.random.PRNGKey(seed)
        W = jax.random.normal(key, (flat.shape[1], dim)) / jnp.sqrt(flat.shape[1])
        return jnp.tanh(flat @ W)
    return feature_fn


def fid_score(real: jax.Array, fake: jax.Array,
              feature_fn: Optional[Callable] = None) -> jax.Array:
    """FID between two image batches (NHWC, [-1,1] or uint8 range)
    (reference API: metrics.py:291-308; gray inputs are channel-repeated
    there — handled by the feature_fn operating on any channel count)."""
    if feature_fn is None:
        feature_fn = make_random_projection_features()
    f_real = feature_fn(real)
    f_fake = feature_fn(fake)
    mu1, c1 = _stats(f_real)
    mu2, c2 = _stats(f_fake)
    return frechet_distance(mu1, c1, mu2, c2)


def fid_score_chunked(real, fake, feature_fn: Optional[Callable] = None,
                      chunk_size: int = 128) -> jax.Array:
    """Chunked feature extraction to bound memory (reference:
    metrics.py:265-288), exact same statistics as unchunked."""
    if feature_fn is None:
        feature_fn = make_random_projection_features()

    def feats(x):
        outs = [feature_fn(x[i:i + chunk_size])
                for i in range(0, x.shape[0], chunk_size)]
        return jnp.concatenate(outs, axis=0)

    mu1, c1 = _stats(feats(real))
    mu2, c2 = _stats(feats(fake))
    return frechet_distance(mu1, c1, mu2, c2)
