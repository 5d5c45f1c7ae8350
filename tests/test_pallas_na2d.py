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
