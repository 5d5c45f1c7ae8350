"""Neighborhood attention tests: NATTEN-style clamped-window semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.ops.neighborhood_attention import (
    na2d, na2d_reference, window_starts)


def test_window_starts_clamped():
    s = np.asarray(window_starts(8, 7))
    # centers clamp at borders: every query sees exactly 7 neighbors
    np.testing.assert_array_equal(s, [0, 0, 0, 0, 1, 1, 1, 1])


def _naive_na2d(q, k, v, ks, heads):
    """O(N·k²) loop oracle with clamped windows."""
    B, H, W, C = q.shape
    dh = C // heads
    out = np.zeros_like(q)
    scale = dh ** -0.5
    qh = q.reshape(B, H, W, heads, dh)
    kh = k.reshape(B, H, W, heads, dh)
    vh = v.reshape(B, H, W, heads, dh)
    for b in range(B):
        for i in range(H):
            si = min(max(i - ks // 2, 0), H - ks)
            for j in range(W):
                sj = min(max(j - ks // 2, 0), W - ks)
                kwin = kh[b, si:si + ks, sj:sj + ks].reshape(-1, heads, dh)
                vwin = vh[b, si:si + ks, sj:sj + ks].reshape(-1, heads, dh)
                for h in range(heads):
                    logits = kwin[:, h] @ (qh[b, i, j, h] * scale)
                    w = np.exp(logits - logits.max())
                    w = w / w.sum()
                    out[b, i, j, h * dh:(h + 1) * dh] = w @ vwin[:, h]
    return out


def test_na2d_matches_naive_oracle():
    rng = np.random.default_rng(0)
    B, H, W, C, ks, heads = 2, 6, 5, 8, 3, 2
    q = rng.normal(size=(B, H, W, C)).astype(np.float32)
    k = rng.normal(size=(B, H, W, C)).astype(np.float32)
    v = rng.normal(size=(B, H, W, C)).astype(np.float32)
    ours = np.asarray(na2d_reference(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), kernel_size=ks,
                                     heads=heads))
    oracle = _naive_na2d(q, k, v, ks, heads)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_na2d_equals_full_attention_when_window_covers():
    """With kernel_size >= image size, NA == full softmax attention."""
    rng = np.random.default_rng(1)
    B, H, W, C, heads = 1, 4, 4, 8, 2
    q = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    na = np.asarray(na2d_reference(q, k, v, kernel_size=4, heads=heads))
    dh = C // heads
    qh = np.asarray(q).reshape(B, H * W, heads, dh) * dh ** -0.5
    kh = np.asarray(k).reshape(B, H * W, heads, dh)
    vh = np.asarray(v).reshape(B, H * W, heads, dh)
    logits = np.einsum("bnhd,bmhd->bhnm", qh, kh)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    full = np.einsum("bhnm,bmhd->bnhd", w, vh).reshape(B, H, W, C)
    np.testing.assert_allclose(na, full, atol=1e-4)


def test_na2d_locality():
    """Changing a far-away key must not change a query's output."""
    rng = np.random.default_rng(2)
    B, H, W, C, ks, heads = 1, 9, 9, 4, 3, 1
    q = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    k = rng.normal(size=(B, H, W, C)).astype(np.float32)
    v = rng.normal(size=(B, H, W, C)).astype(np.float32)
    out1 = np.asarray(na2d_reference(q, jnp.asarray(k), jnp.asarray(v),
                                     kernel_size=ks, heads=heads))
    k2, v2 = k.copy(), v.copy()
    k2[0, 8, 8] += 100.0
    v2[0, 8, 8] += 100.0
    out2 = np.asarray(na2d_reference(q, jnp.asarray(k2), jnp.asarray(v2),
                                     kernel_size=ks, heads=heads))
    # query at (0,0) has window rows/cols [0,3) — untouched by (8,8)
    np.testing.assert_allclose(out1[0, 0, 0], out2[0, 0, 0], atol=1e-6)
    # query at (8,8) IS affected (magnitude depends on q·k sign, so small bar)
    assert np.abs(out1[0, 8, 8] - out2[0, 8, 8]).max() > 1e-3
    # and nothing outside the bottom-right 3x3-reach region changed
    assert np.abs(out1[0, :7, :7] - out2[0, :7, :7]).max() < 1e-6


def test_na2d_differentiable():
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(rng, (1, 5, 5, 4))
    g = jax.grad(lambda q: jnp.sum(na2d_reference(q, q, q, kernel_size=3,
                                                  heads=2)))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_na2d_dispatcher_cpu_fallback():
    q = jnp.ones((1, 4, 4, 4))
    out = na2d(q, q, q, kernel_size=3, heads=1)
    assert out.shape == q.shape


def test_banded_matches_reference_fwd_and_grad():
    from flocoder_tpu.ops.neighborhood_attention import na2d_banded
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    a = na2d_banded(q, k, v, kernel_size=5, heads=2)
    b = na2d_reference(q, k, v, kernel_size=5, heads=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    ga = jax.grad(lambda q: jnp.sum(
        na2d_banded(q, k, v, kernel_size=5, heads=2) ** 2))(q)
    gb = jax.grad(lambda q: jnp.sum(
        na2d_reference(q, k, v, kernel_size=5, heads=2) ** 2))(q)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)
