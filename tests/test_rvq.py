"""Residual-VQ tests: quantization correctness, EMA updates, kmeans init,
dead-code reseeding (SURVEY.md §4 strategy (a))."""
import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.ops.rvq import RVQState, rvq_init, rvq_apply, rvq_lookup


def _state(levels=2, K=8, D=4, seed=0):
    return rvq_init(jax.random.PRNGKey(seed), levels, K, D)


def test_eval_quantize_shapes():
    st = _state()
    z = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    zq, idx, loss, st2 = rvq_apply(st, z, train=False)
    assert zq.shape == z.shape
    assert idx.shape == (32, 2)
    assert float(loss) >= 0
    # state unchanged at eval
    np.testing.assert_array_equal(np.asarray(st2.codebooks), np.asarray(st.codebooks))


def test_quantize_is_nearest_code_level0():
    st = _state(levels=1, K=4, D=2)
    cb = np.asarray(st.codebooks[0])
    z = jnp.asarray(cb[[2, 0, 3]] + 0.001)  # near codes 2,0,3
    zq, idx, _, _ = rvq_apply(st, z, train=False)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), [2, 0, 3])
    np.testing.assert_allclose(np.asarray(zq), cb[[2, 0, 3]], atol=1e-5)


def test_lookup_roundtrip():
    st = _state(levels=3, K=16, D=4)
    z = jax.random.normal(jax.random.PRNGKey(2), (64, 4))
    zq, idx, _, _ = rvq_apply(st, z, train=False)
    rec = rvq_lookup(st, idx.reshape(-1, 3))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(zq), atol=1e-5)


def test_train_kmeans_init_and_ema():
    st = _state(levels=2, K=4, D=3)
    assert not bool(st.initted)
    z = jax.random.normal(jax.random.PRNGKey(3), (256, 3)) * 2.0
    zq, idx, loss, st2 = rvq_apply(st, z, train=True, rng=jax.random.PRNGKey(4))
    assert bool(st2.initted)
    # after kmeans init, codebook should be inside the data range
    assert float(jnp.abs(st2.codebooks).max()) < 8.0
    # EMA stats positive
    assert float(st2.ema_counts.sum()) > 0
    # second train step improves or keeps reconstruction error reasonable
    zq2, _, _, st3 = rvq_apply(st2, z, train=True, rng=jax.random.PRNGKey(5))
    err1 = float(jnp.mean((z - zq) ** 2))
    err2 = float(jnp.mean((z - zq2) ** 2))
    assert err2 <= err1 * 1.5


def test_residual_levels_reduce_error():
    z = jax.random.normal(jax.random.PRNGKey(6), (512, 4))
    errs = []
    for L in (1, 2, 4):
        st = rvq_init(jax.random.PRNGKey(7), L, 16, 4)
        _, _, _, st = rvq_apply(st, z, train=True, rng=jax.random.PRNGKey(8))
        zq, _, _, _ = rvq_apply(st, z, train=False)
        errs.append(float(jnp.mean((z - zq) ** 2)))
    assert errs[2] < errs[0], f"more levels should reduce error: {errs}"


def test_rotation_trick_gradients_flow():
    st = _state(levels=1, K=8, D=4)
    z = jax.random.normal(jax.random.PRNGKey(9), (16, 4))

    def loss_fn(z):
        zq, _, commit, _ = rvq_apply(st, z, train=False, rotation_trick=True)
        return jnp.sum(zq ** 2) + commit

    g = jax.grad(loss_fn)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_straight_through_gradient_identity():
    st = _state(levels=1, K=8, D=4)
    z = jax.random.normal(jax.random.PRNGKey(10), (16, 4))
    g = jax.grad(lambda z: jnp.sum(
        rvq_apply(st, z, train=False, rotation_trick=False)[0]))(z)
    # STE: d(zq)/dz = I → grad of sum is all ones
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-5)


def test_train_under_jit():
    st = _state(levels=2, K=8, D=4)
    z = jax.random.normal(jax.random.PRNGKey(11), (64, 4))

    @jax.jit
    def step(st, z, rng):
        return rvq_apply(st, z, train=True, rng=rng)

    zq, idx, loss, st2 = step(st, z, jax.random.PRNGKey(12))
    assert bool(st2.initted)
    zq2, _, _, st3 = step(st2, z, jax.random.PRNGKey(13))
    assert np.isfinite(float(loss))
