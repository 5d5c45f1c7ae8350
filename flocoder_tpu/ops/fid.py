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
import numpy as np

__all__ = ["frechet_distance", "fid_score", "fid_score_chunked",
           "make_random_projection_features", "sqrtm_newton_schulz",
           "default_feature_fn", "feature_backend_name"]


_HI = jax.lax.Precision.HIGHEST


def sqrtm_newton_schulz(A: jax.Array, n_iters: int = 20) -> jax.Array:
    """Matrix square root of a PSD matrix via the Newton–Schulz iteration
    (on-device replacement for scipy.linalg.sqrtm).

    Matmuls are forced to fp32 HIGHEST: XLA's TPU default is bf16-mixed,
    under which the iteration diverges to NaN (observed as FID_px=nan in
    on-chip evals; CPU tests pin highest globally and never saw it)."""
    dim = A.shape[0]
    norm = jnp.linalg.norm(A)
    Y = A / norm
    Z = jnp.eye(dim, dtype=A.dtype)
    I = jnp.eye(dim, dtype=A.dtype)

    def body(carry, _):
        Y, Z = carry
        T = 0.5 * (3.0 * I - jnp.matmul(Z, Y, precision=_HI))
        return (jnp.matmul(Y, T, precision=_HI),
                jnp.matmul(T, Z, precision=_HI)), None

    (Y, Z), _ = jax.lax.scan(body, (Y, Z), None, length=n_iters)
    return Y * jnp.sqrt(norm)


@partial(jax.jit, static_argnames=("n_sqrt_iters",))
def frechet_distance(mu1, cov1, mu2, cov2, eps_rel: float = 1e-3,
                     n_sqrt_iters: int = 20) -> jax.Array:
    """FID between two Gaussians: |μ1−μ2|² + tr(C1 + C2 − 2·sqrt(C1 C2)).

    Covariances are regularized by a trace-relative ridge (``eps_rel``): with
    fewer samples than feature dims (the usual eval case — e.g. 256 samples,
    2048-d features) the covariances are rank-deficient and the Newton–Schulz
    iteration on C1·C2 diverges to NaN with only an absolute 1e-6 ridge.
    The relative ridge biases FID slightly but identically for both inputs;
    pass eps_rel=0.0 for the exact torchmetrics/scipy formula when the
    covariances are full-rank (parity verified in tests/test_fid_parity.py
    against scipy.linalg.sqrtm and the torchmetrics eigenvalue formulation,
    reference: metrics.py:265-308).

    n_sqrt_iters: Newton–Schulz diverges in fp32 past ~20 iterations on
    rank-deficient inputs (measured: fine at 20, -7e6 at 25, NaN at 30 for a
    16-sample 256-dim case) — keep ≤20 unless inputs are full-rank.
    """
    diff = mu1 - mu2
    dim = cov1.shape[0]
    scale = 0.5 * (jnp.trace(cov1) + jnp.trace(cov2)) / dim
    off = (eps_rel * scale + 1e-10) * jnp.eye(dim, dtype=cov1.dtype)
    c1, c2 = cov1 + off, cov2 + off
    covmean = sqrtm_newton_schulz(jnp.matmul(c1, c2, precision=_HI),
                                  n_iters=n_sqrt_iters)
    tr = jnp.trace(c1) + jnp.trace(c2) - 2.0 * jnp.trace(covmean)
    return jnp.dot(diff, diff) + tr


def _stats(feats: jax.Array):
    mu = feats.mean(axis=0)
    centered = feats - mu
    cov = jnp.matmul(centered.T, centered,
                     precision=_HI) / (feats.shape[0] - 1)
    return mu, cov


def make_random_projection_features(dim: int = 2048, seed: int = 0,
                                    image_size: int = 128) -> Callable:
    """Deterministic random-feature extractor: multi-scale average pooling of
    pixels followed by a fixed Gaussian projection + tanh nonlinearity. A
    stand-in for the Inception feature map (see module docstring).

    Input contract: uint8 in [0,255], or float in [-1,1]. Float values
    outside [-1,1] are clipped — a float image in 0-255 range would collapse
    to near-constant features and a meaningless FID, so that case warns.

    The projection matrix is drawn from numpy's Philox bit generator
    (VERDICT r3 #4a): NEP 19 freezes the Philox bit stream across numpy
    versions and platforms, which removes the likeliest drift source (a
    jax PRNG draw could change with the default key implementation). The
    distribution layer (Generator.standard_normal's algorithm) is not
    itself covered by that policy, so the actual stability CONTRACT is the
    pinned checksum of the C=3 projection in tests/test_fid_parity.py —
    any drift, from numpy or otherwise, fails CI."""
    def feature_fn(images: jax.Array) -> jax.Array:
        x = images.astype(jnp.float32)
        if images.dtype == jnp.uint8:
            x = x / 127.5 - 1.0
        else:
            # float inputs must be in [-1, 1]; clip outliers so a few
            # extreme pixels can't saturate the projection (a max()>2
            # range auto-rescale heuristic here once crushed whole batches —
            # see compute_sample_metrics note). A whole image in 0-255
            # float range indicates a caller bug → loud warning, since
            # clipping it would yield a meaningless near-constant FID.
            try:
                if float(jnp.max(jnp.abs(x))) > 8.0:
                    import warnings
                    warnings.warn(
                        "fid feature_fn: float input range looks like "
                        "0-255; pass uint8 or rescale to [-1,1] "
                        "(values are clipped to [-1,1])")
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError):
                pass  # under jit: cannot inspect, keep the clip contract
            x = jnp.clip(x, -1.0, 1.0)
        b = x.shape[0]
        feats = []
        for s in (8, 4, 2):
            pooled = jax.image.resize(x, (b, s, s, x.shape[-1]), "linear")
            feats.append(pooled.reshape(b, -1))
        flat = jnp.concatenate(feats, axis=1)
        W = _projection_matrix(flat.shape[1], dim, seed)
        return jnp.tanh(flat @ W)
    feature_fn.backend_name = f"rp{dim}"
    return feature_fn


def _projection_matrix(in_dim: int, out_dim: int, seed: int) -> jax.Array:
    """Fixed Gaussian projection from numpy Philox. The Philox bit stream
    is frozen by NEP 19; the standard_normal transform on top of it is not,
    so cross-version stability is ENFORCED by the pinned checksum in
    tests/test_fid_parity.py rather than assumed (ADVICE r4)."""
    rng = np.random.Generator(np.random.Philox(seed))
    W = rng.standard_normal((in_dim, out_dim), dtype=np.float64)
    return jnp.asarray(W / np.sqrt(in_dim), jnp.float32)


def default_feature_fn(image_size: int = 128) -> Callable:
    """The feature backend used when none is supplied: the flax FID-Inception
    extractor when converted weights exist on disk
    (``weights/fid_inception.npz`` — reference-comparable FID,
    metrics.py:265-308), else the deterministic random-projection stand-in.
    The returned fn carries ``backend_name`` so every logged FID can be
    stamped with the backend that produced it."""
    import os
    if os.path.exists("weights/fid_inception.npz"):
        from ..models.inception import make_inception_feature_fn
        return make_inception_feature_fn()
    return make_random_projection_features(image_size=image_size)


def feature_backend_name(feature_fn: Optional[Callable]) -> str:
    if feature_fn is None:
        return getattr(default_feature_fn(), "backend_name", "unknown")
    return getattr(feature_fn, "backend_name", "custom")


def fid_score(real: jax.Array, fake: jax.Array,
              feature_fn: Optional[Callable] = None,
              eps_rel: float = 1e-3) -> jax.Array:
    """FID between two image batches — NHWC, float strictly in [-1,1] or
    uint8 in [0,255]; float 0-255 inputs are NOT auto-rescaled (the default
    backend clips floats to [-1,1] and warns). (Reference API:
    metrics.py:291-308; gray inputs are channel-repeated there — handled by
    the feature_fn operating on any channel count.)"""
    if feature_fn is None:
        feature_fn = default_feature_fn()
    f_real = feature_fn(real)
    f_fake = feature_fn(fake)
    mu1, c1 = _stats(f_real)
    mu2, c2 = _stats(f_fake)
    return frechet_distance(mu1, c1, mu2, c2, eps_rel=eps_rel)


def fid_score_chunked(real, fake, feature_fn: Optional[Callable] = None,
                      chunk_size: int = 128,
                      eps_rel: float = 1e-3) -> jax.Array:
    """Chunked feature extraction to bound memory (reference:
    metrics.py:265-288), exact same statistics as unchunked."""
    if feature_fn is None:
        feature_fn = default_feature_fn()

    def feats(x):
        outs = [feature_fn(x[i:i + chunk_size])
                for i in range(0, x.shape[0], chunk_size)]
        return jnp.concatenate(outs, axis=0)

    mu1, c1 = _stats(feats(real))
    mu2, c2 = _stats(feats(fake))
    return frechet_distance(mu1, c1, mu2, c2, eps_rel=eps_rel)
