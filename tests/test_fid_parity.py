"""FID comparability (VERDICT r1 item 2): prove the FID statistics machinery
matches the reference's math exactly, and the flax FID-Inception port matches
a torch oracle with converted weights.

Reference: flocoder/metrics.py:265-308 (torchmetrics
FrechetInceptionDistance(feature=2048) — scipy-sqrtm / eigenvalue Gaussian
Fréchet formula on InceptionV3 pool3 features).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from flocoder_tpu.ops.fid import (fid_score, frechet_distance,
                                  sqrtm_newton_schulz)

torch = pytest.importorskip("torch")
scipy_linalg = pytest.importorskip("scipy.linalg")


def _gauss_stats(feats):
    mu = feats.mean(axis=0)
    c = feats - mu
    cov = c.T @ c / (feats.shape[0] - 1)
    return mu, cov


@pytest.fixture(scope="module")
def fixed_features():
    rng = np.random.default_rng(0)
    d = 48
    # full-rank, distinct distributions
    a = rng.standard_normal((4096, d)).astype(np.float64)
    mix = rng.standard_normal((d, d)) * 0.3 + np.eye(d)
    b = rng.standard_normal((4096, d)).astype(np.float64) @ mix + 0.5
    return a, b


def test_frechet_matches_scipy_sqrtm(fixed_features):
    """Our eps_rel=0 Fréchet vs the classic scipy formula (what pytorch-fid
    computes)."""
    a, b = fixed_features
    mu1, c1 = _gauss_stats(a)
    mu2, c2 = _gauss_stats(b)
    want = (np.dot(mu1 - mu2, mu1 - mu2) + np.trace(c1) + np.trace(c2)
            - 2.0 * np.trace(scipy_linalg.sqrtm(c1 @ c2).real))
    got = float(frechet_distance(jnp.asarray(mu1, jnp.float32),
                                 jnp.asarray(c1, jnp.float32),
                                 jnp.asarray(mu2, jnp.float32),
                                 jnp.asarray(c2, jnp.float32),
                                 eps_rel=0.0))
    assert abs(got - want) / abs(want) < 1e-4, (got, want)


def test_frechet_matches_torchmetrics_eigval_formula(fixed_features):
    """torchmetrics' _compute_fid uses sqrt of eigenvalues of c1@c2; match it
    (reference consumes torchmetrics: metrics.py:265-308)."""
    a, b = fixed_features
    mu1, c1 = _gauss_stats(a)
    mu2, c2 = _gauss_stats(b)
    t = lambda x: torch.from_numpy(np.asarray(x))
    eig = torch.linalg.eigvals(t(c1) @ t(c2))
    want = float(((t(mu1) - t(mu2)).square().sum()
                  + t(c1).trace() + t(c2).trace()
                  - 2 * eig.sqrt().real.sum()))
    got = float(frechet_distance(jnp.asarray(mu1, jnp.float32),
                                 jnp.asarray(c1, jnp.float32),
                                 jnp.asarray(mu2, jnp.float32),
                                 jnp.asarray(c2, jnp.float32),
                                 eps_rel=0.0))
    assert abs(got - want) / abs(want) < 1e-4, (got, want)


def test_newton_schulz_sqrtm_accuracy():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((32, 32))
    a = (m @ m.T + 0.1 * np.eye(32)).astype(np.float32)
    s = np.asarray(sqrtm_newton_schulz(jnp.asarray(a), n_iters=30))
    assert np.abs(s @ s - a).max() < 1e-3


def test_identical_distributions_give_zero():
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((2048, 32)).astype(np.float32)
    mu, c = _gauss_stats(feats)
    got = float(frechet_distance(jnp.asarray(mu), jnp.asarray(c),
                                 jnp.asarray(mu), jnp.asarray(c),
                                 eps_rel=0.0))
    assert abs(got) < 1e-3


@pytest.mark.slow
def test_inception_port_matches_torch_oracle():
    """Full-forward parity: flax InceptionV3Features with weights converted
    from a randomly-initialized torch FID-Inception (converter exercised on
    torchvision's real state_dict naming). Proves the port is reference-grade
    the moment pretrained weights are converted."""
    from oracles.torch_inception import FIDInceptionV3
    from flocoder_tpu.models.inception import (InceptionV3Features,
                                               convert_torch_inception)
    torch.manual_seed(0)
    oracle = FIDInceptionV3(fid=True).eval()
    # randomize BN stats so mean/var mapping bugs can't hide behind 0/1
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.7, 1.3)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    variables = convert_torch_inception(oracle.state_dict())

    x = np.random.default_rng(3).standard_normal((1, 299, 299, 3)).astype(
        np.float32) * 0.5
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(InceptionV3Features(fid_variant=True).apply(
        variables, jnp.asarray(x)))
    assert got.shape == (1, 2048)
    err = np.abs(got - want).max()
    scale = np.abs(want).max() + 1e-8
    assert err / scale < 1e-3, f"max|Δ|={err} scale={scale}"


def test_fid_score_inception_backend_exercised():
    """fid_score with the flax Inception feature_fn end-to-end (random-init
    weights — VERDICT r1 item 2 'done' criterion), small images upsampled by
    the built-in 299² pipeline."""
    from flocoder_tpu.models.inception import make_inception_feature_fn
    fn = make_inception_feature_fn(weights_path="/nonexistent.npz", jit=False)
    assert fn.backend_name == "fid_inception_random_init"
    rng = np.random.default_rng(4)
    real = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    fake = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    feats = fn(real[:2])
    assert feats.shape == (2, 2048)
    # tiny-batch FID via the shared-feature path: rank-deficient, relies on
    # the trace-relative ridge to stay finite
    val = float(fid_score(jnp.asarray(real), jnp.asarray(fake),
                          feature_fn=fn))
    assert np.isfinite(val) and val >= 0


def test_rp_projection_pinned_across_machines():
    """VERDICT r3 #4a: the rp2048 projection is drawn from numpy Philox
    (stream-stable across numpy versions/platforms) — pin its checksum so
    rp-backend FIDs stay comparable across rounds and machines."""
    from flocoder_tpu.ops.fid import _projection_matrix
    W = np.asarray(_projection_matrix(252, 2048, 0))  # C=3 flat dim
    assert W.shape == (252, 2048)
    assert float(W.sum()) == pytest.approx(-3.1959626, abs=1e-4)
    assert float(np.abs(W).sum()) == pytest.approx(25929.716, abs=0.1)
    assert float(W[0, 0]) == pytest.approx(-0.01297514, abs=1e-7)
    assert float(W[-1, -1]) == pytest.approx(0.01977510, abs=1e-7)


def test_self_fid_sanity_suite():
    """VERDICT r3 #4b: FID(X, X) ≈ 0 with the rp backend, and FID grows
    monotonically with the noise level separating the two batches."""
    from flocoder_tpu.ops.fid import make_random_projection_features
    fn = make_random_projection_features(image_size=32)
    rng = np.random.default_rng(11)
    X = jnp.asarray(np.clip(rng.standard_normal((64, 32, 32, 3)) * 0.4,
                            -1, 1), jnp.float32)
    # the default trace-relative ridge (eps_rel=1e-3, needed for rank-
    # deficient 64-sample/2048-dim covariances) biases FID(X,X) to ~0.012;
    # gate well under the smallest distinguishable noise level (~3+)
    self_fid = float(fid_score(X, X, feature_fn=fn))
    assert abs(self_fid) < 0.05, self_fid
    # and the bias vanishes with the ridge off
    self_fid_exact = float(fid_score(X, X, feature_fn=fn, eps_rel=0.0))
    assert abs(self_fid_exact) < 5e-3, self_fid_exact
    vals = []
    for sigma in (0.05, 0.15, 0.4):
        noisy = jnp.clip(X + sigma * jnp.asarray(
            rng.standard_normal(X.shape), jnp.float32), -1, 1)
        vals.append(float(fid_score(X, noisy, feature_fn=fn)))
    assert vals[0] < vals[1] < vals[2], vals
    assert all(np.isfinite(v) and v >= 0 for v in vals)


def test_converter_verify_only_entrypoint():
    """tools/convert_all_weights.py --verify-only exists and routes to the
    parity suites (VERDICT r3 #4c) — checked without spawning the heavy
    subprocess run."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "convert_all_weights",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "convert_all_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.verify_only)
    assert set(mod.CONVERTERS) == {"sd_vae", "vgg16", "resnet50",
                                   "fid_inception"}


def test_backend_stamp_helpers():
    from flocoder_tpu.ops.fid import (default_feature_fn,
                                      feature_backend_name,
                                      make_random_projection_features)
    fn = make_random_projection_features(dim=64)
    assert feature_backend_name(fn) == "rp64"
    d = default_feature_fn()
    assert feature_backend_name(d) in ("rp2048", "fid_inception")
