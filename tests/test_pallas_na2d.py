"""Pallas NA2D kernel vs the gather oracle (interpret mode on CPU; the same
kernel compiles with Mosaic on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.ops.pallas.na2d import na2d_pallas
from flocoder_tpu.ops.neighborhood_attention import na2d_reference


@pytest.mark.parametrize("shape", [
    (2, 16, 16, 32, 7, 4),
    (1, 8, 8, 8, 3, 2),
    (1, 16, 12, 8, 5, 1),  # non-square
])
def test_pallas_matches_reference(shape):
    B, H, W, C, ks, heads = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    ours = na2d_pallas(q, k, v, ks, heads, None)
    ref = na2d_reference(q, k, v, kernel_size=ks, heads=heads)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_custom_vjp_matches_reference_grad():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    g1 = jax.grad(lambda q: jnp.sum(na2d_pallas(q, q, q, 3, 2, None) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(
        na2d_reference(q, q, q, kernel_size=3, heads=2) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_handwritten_bwd_matches_reference_grads_production_shape():
    """Separate dq/dk/dv vs the gather-oracle autodiff at the codec's real
    config (k=7, 8 heads) on a 16² map (VERDICT r1 item 6)."""
    import numpy as np
    from flocoder_tpu.ops.neighborhood_attention import na2d_reference
    rng = np.random.default_rng(5)
    B, H, W, C = 2, 16, 16, 32
    q, k, v, g = (jnp.asarray(rng.standard_normal((B, H, W, C))
                              .astype(np.float32)) for _ in range(4))

    def loss_p(q, k, v):
        return jnp.sum(na2d_pallas(q, k, v, 7, 8, None) * g)

    def loss_r(q, k, v):
        return jnp.sum(na2d_reference(q, k, v, kernel_size=7, heads=8) * g)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3, err_msg=name)
