"""Fused compress-conv + RVQ-encode Pallas kernel vs the unfused path."""
import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.ops.pallas.fused_vq import fused_compress_vq
from flocoder_tpu.ops.rvq import rvq_init, rvq_apply


def test_fused_matches_unfused_exact_on_cpu():
    rng = np.random.default_rng(0)
    N, Din, D, L, K = 300, 16, 4, 3, 8
    z = jnp.asarray(rng.standard_normal((N, Din)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((Din, D)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.1)
    st = rvq_init(jax.random.PRNGKey(0), L, K, D)
    zq_f, idx_f = fused_compress_vq(z, w, b, st.codebooks, tile_n=128)
    zq_r, idx_r, _, _ = rvq_apply(st, z @ w + b, train=False,
                                  rotation_trick=False)
    np.testing.assert_allclose(np.asarray(zq_f), np.asarray(zq_r), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_r))


def test_fused_handles_non_tile_multiple():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((77, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    b = jnp.zeros((4,))
    st = rvq_init(jax.random.PRNGKey(1), 2, 16, 4)
    zq, idx = fused_compress_vq(z, w, b, st.codebooks, tile_n=64)
    assert zq.shape == (77, 4) and idx.shape == (77, 2)
