"""OT pairing tests: permutation validity + greedy semantics (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.ops.ot import (
    compute_ot_pairing, compute_ot_pairing_blocked, compute_ot_pairing_greedy,
    compute_ot_pairing_parallel, compute_ot_pairing_sinkhorn, pairwise_sqdist,
)
from flocoder_tpu.ops.sinkhorn import sinkhorn_divergence, sinkhorn_loss_chunked


def _greedy_reference(source, target):
    """Direct numpy transcription of the reference algorithm (ot.py:63-78)."""
    B = source.shape[0]
    s = source.reshape(B, -1)
    t = target.reshape(B, -1)
    d = ((s[:, None, :] - t[None, :, :]) ** 2).sum(-1) ** 0.5
    indices, used = np.zeros(B, dtype=int), np.zeros(B, dtype=bool)
    for i in range(B):
        row = d[i].copy()
        row[used] = np.inf
        j = row.argmin()
        indices[i] = j
        used[j] = True
    return indices


def test_pairwise_sqdist_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 5)).astype(np.float32)
    b = rng.normal(size=(6, 5)).astype(np.float32)
    d = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    expected = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, expected, rtol=1e-4, atol=1e-5)


def test_greedy_is_valid_permutation():
    rng = jax.random.PRNGKey(0)
    s = jax.random.normal(rng, (32, 4, 4, 2))
    t = jax.random.normal(jax.random.PRNGKey(1), (32, 4, 4, 2))
    idx = np.asarray(compute_ot_pairing_greedy(s, t))
    assert sorted(idx.tolist()) == list(range(32))


def test_greedy_matches_reference_semantics():
    rng = np.random.default_rng(42)
    s = rng.normal(size=(16, 8)).astype(np.float32)
    t = rng.normal(size=(16, 8)).astype(np.float32)
    ours = np.asarray(compute_ot_pairing_greedy(jnp.asarray(s), jnp.asarray(t)))
    ref = _greedy_reference(s, t)
    np.testing.assert_array_equal(ours, ref)


def test_greedy_identity_on_identical_clouds():
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1) * 10
    idx = np.asarray(compute_ot_pairing_greedy(x, x))
    np.testing.assert_array_equal(idx, np.arange(8))


def test_parallel_is_valid_permutation():
    for B, shape in [(7, (3,)), (32, (4, 4, 2)), (256, (16,))]:
        s = jax.random.normal(jax.random.PRNGKey(B), (B,) + shape)
        t = jax.random.normal(jax.random.PRNGKey(B + 1), (B,) + shape)
        idx = np.asarray(compute_ot_pairing_parallel(s, t))
        assert sorted(idx.tolist()) == list(range(B)), B


def test_parallel_identity_on_identical_clouds():
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1) * 10
    idx = np.asarray(compute_ot_pairing_parallel(x, x))
    np.testing.assert_array_equal(idx, np.arange(8))


def test_parallel_cost_within_2pct_of_greedy_oracle():
    """The VERDICT r2 acceptance gate: mean transport cost of the parallel
    assignment within 2% of the sequential greedy oracle (it is typically
    LOWER — propose-accept resolves mutually-nearest pairs first)."""
    rng = np.random.default_rng(0)
    for B, D in [(64, 32), (256, 1024), (512, 64)]:
        s = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        t = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
        d = np.asarray(pairwise_sqdist(s, t))
        ig = np.asarray(compute_ot_pairing_greedy(s, t))
        ip = np.asarray(compute_ot_pairing_parallel(s, t))
        cg = d[np.arange(B), ig].mean()
        cp = d[np.arange(B), ip].mean()
        assert cp <= cg * 1.02, (B, cp / cg)


def test_sinkhorn_pairing_valid_permutation():
    rng = jax.random.PRNGKey(2)
    s = jax.random.normal(rng, (16, 6))
    t = jax.random.normal(jax.random.PRNGKey(3), (16, 6))
    idx = np.asarray(compute_ot_pairing_sinkhorn(s, t))
    assert sorted(idx.tolist()) == list(range(16))


def test_pairing_reduces_transport_cost():
    rng = jax.random.PRNGKey(4)
    s = jax.random.normal(rng, (64, 10))
    t = jax.random.normal(jax.random.PRNGKey(5), (64, 10))
    idx = compute_ot_pairing(s, t)
    base = float(jnp.mean(jnp.sum((s - t) ** 2, -1)))
    paired = float(jnp.mean(jnp.sum((s - t[idx]) ** 2, -1)))
    assert paired < base


def test_sinkhorn_divergence_properties():
    rng = jax.random.PRNGKey(6)
    x = jax.random.normal(rng, (64, 8))
    y = jax.random.normal(jax.random.PRNGKey(7), (64, 8)) + 2.0
    d_same = float(sinkhorn_divergence(x, x))
    d_diff = float(sinkhorn_divergence(x, y))
    assert d_same < 1e-2
    assert d_diff > 1.0  # clouds separated by distance 2 in 8-d
    # symmetric-ish
    d_rev = float(sinkhorn_divergence(y, x))
    np.testing.assert_allclose(d_diff, d_rev, rtol=1e-2)


def test_sinkhorn_chunked_matches_unchunked_scale():
    rng = jax.random.PRNGKey(8)
    x = jax.random.normal(rng, (64, 4))
    y = jax.random.normal(jax.random.PRNGKey(9), (64, 4)) + 1.0
    full = float(sinkhorn_divergence(x, y))
    chunked = float(sinkhorn_loss_chunked(x, y, chunk_size=32))
    assert abs(full - chunked) / max(full, 1e-6) < 0.5


def test_blocked_is_valid_permutation_and_stays_in_block():
    rng = jax.random.PRNGKey(10)
    s = jax.random.normal(rng, (128, 12))
    t = jax.random.normal(jax.random.PRNGKey(11), (128, 12))
    idx = np.asarray(compute_ot_pairing_blocked(s, t, block=32))
    assert sorted(idx.tolist()) == list(range(128))
    # every row's match lives inside its own aligned 32-block
    rows = np.arange(128)
    assert (idx // 32 == rows // 32).all()


def test_blocked_equals_per_block_parallel():
    rng = jax.random.PRNGKey(12)
    s = jax.random.normal(rng, (96, 8))
    t = jax.random.normal(jax.random.PRNGKey(13), (96, 8))
    idx = np.asarray(compute_ot_pairing_blocked(s, t, block=48))
    for g in range(2):
        lo = g * 48
        sub = np.asarray(
            compute_ot_pairing_parallel(s[lo:lo + 48], t[lo:lo + 48]))
        np.testing.assert_array_equal(idx[lo:lo + 48], sub + lo)


def test_blocked_degenerates_to_full_and_rejects_misaligned():
    import pytest
    rng = jax.random.PRNGKey(14)
    s = jax.random.normal(rng, (64, 6))
    t = jax.random.normal(jax.random.PRNGKey(15), (64, 6))
    np.testing.assert_array_equal(
        np.asarray(compute_ot_pairing_blocked(s, t, block=64)),
        np.asarray(compute_ot_pairing_parallel(s, t)))
    np.testing.assert_array_equal(
        np.asarray(compute_ot_pairing(s, t, block=32)),
        np.asarray(compute_ot_pairing_blocked(s, t, block=32)))
    with pytest.raises(ValueError):
        compute_ot_pairing_blocked(s, t, block=48)


def test_blocked_cost_between_full_pairing_and_unpaired():
    rng = jax.random.PRNGKey(16)
    s = jax.random.normal(rng, (256, 16))
    t = jax.random.normal(jax.random.PRNGKey(17), (256, 16))
    cost = lambda idx: float(jnp.mean(jnp.sum((s - t[idx]) ** 2, -1)))
    full = cost(compute_ot_pairing_parallel(s, t))
    blocked = cost(compute_ot_pairing_blocked(s, t, block=64))
    base = float(jnp.mean(jnp.sum((s - t) ** 2, -1)))
    assert full <= blocked * 1.02  # full-batch coupling is at least as good
    assert blocked < base          # but blocks still beat no pairing by far
