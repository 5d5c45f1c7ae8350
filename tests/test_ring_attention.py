"""Sequence-parallel ring attention (parallel/ring_attention.py) vs the
plain full-softmax formulation used at the U-Net bottleneck
(reference role: unet.py:99-122 global attention)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.parallel.mesh import make_mesh
from flocoder_tpu.parallel.ring_attention import (make_ring_self_attention,
                                                  ring_attention_local)


def full_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    return out


def _qkv(rng, b=2, n=64, h=4, d=16):
    return tuple(jnp.asarray(rng.standard_normal((b, n, h, d)),
                             jnp.float32) for _ in range(3))


@pytest.mark.parametrize("n_model", [2, 8])
def test_ring_matches_full_attention(n_model):
    mesh = make_mesh(n_data=1, n_model=n_model)
    q, k, v = _qkv(np.random.default_rng(0))
    ring = make_ring_self_attention(mesh, axis="model")
    out_ring = jax.jit(ring)(q, k, v)
    out_full = full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               atol=1e-5, rtol=1e-5)


def test_ring_with_data_parallel_batch():
    """('data','model') mesh: batch over data, tokens over model — the
    combined DP+SP layout."""
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = _qkv(np.random.default_rng(1), b=4, n=32)
    ring = make_ring_self_attention(mesh, axis="model")
    out = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(full_attention(q, k, v)),
                               atol=1e-5, rtol=1e-5)


def test_ring_gradients_match():
    mesh = make_mesh(n_data=1, n_model=4)
    q, k, v = _qkv(np.random.default_rng(2), b=1, n=32, h=2, d=8)
    ring = make_ring_self_attention(mesh, axis="model")
    g_ring = jax.jit(jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) ** 2),
                              argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.grad(lambda q, k, v: jnp.sum(full_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=2e-4, rtol=1e-4)


def test_ring_local_single_device_degenerate():
    """axis_size=1 ring (inside a trivial shard_map-free call) reduces to
    plain attention."""
    q, k, v = _qkv(np.random.default_rng(3), b=1, n=16, h=2, d=8)

    def one(q, k, v):
        return ring_attention_local(q, k, v, axis_name="model", axis_size=1)

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(n_data=1, n_model=1)
    # out is marked varying over the (size-1) ring axis by the ppermute
    spec = P(None, "model", None, None)
    out = shard_map(one, mesh=mesh,
                    in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(full_attention(q, k, v)),
                               atol=1e-5, rtol=1e-5)
