"""Codec tests: interface contract, VQVAE roundtrip shapes, SD-VAE topology."""
import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.models.codecs import (NoOpAE, SimpleResizeAE, VQVAE,
                                        setup_codec, gn_groups)
from flocoder_tpu.config import Config


def test_gn_groups():
    assert gn_groups(8, 64) == 8
    assert gn_groups(8, 16) == 8
    assert gn_groups(8, 12) == 1    # no divisor in [8, 12) → LayerNorm-ish
    assert gn_groups(8, 7) == 1     # same fallback (reference: codecs.py:42)
    assert gn_groups(2, 4) == 2
    assert gn_groups(3, 12) == 3


def test_noop_and_resize_contract():
    noop = NoOpAE()
    x = jnp.ones((2, 8, 8, 3))
    assert noop.decode({}, noop.encode({}, x)).shape == x.shape
    ae = SimpleResizeAE(latent_shape=(4, 4, 4), image_size=8)
    z = ae.encode({}, x)
    assert z.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(z[..., 3]),
                               np.asarray(z[..., :3].mean(-1)), atol=1e-6)
    assert ae.decode({}, z).shape == (2, 8, 8, 3)


def test_vqvae_roundtrip_shapes_and_training():
    codec = VQVAE(in_channels=3, hidden_channels=8, num_downsamples=2,
                  vq_num_embeddings=8, internal_dim=8, codebook_levels=2,
                  vq_embedding_dim=4, use_attention=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 16, 3)).astype(np.float32))
    params = codec.init(jax.random.PRNGKey(0), x)
    z = codec.encode(params, x)
    assert z.shape == (2, 4, 4, 4)  # 16 / 2^2
    zq, idx, loss, new_vq = codec.quantize(params, z, train=True,
                                           rng=jax.random.PRNGKey(1))
    assert zq.shape == z.shape and idx.shape == (2, 4, 4, 2)
    assert bool(new_vq.initted)
    recon = codec.decode(params, zq)
    assert recon.shape == x.shape
    r2, commit, idx2, nv = codec.forward(params, x, train=True,
                                         rng=jax.random.PRNGKey(2))
    assert r2.shape == x.shape and np.isfinite(float(commit))
    assert codec.latent_shape(16) == (4, 4, 4)


def test_sd_vae_topology_small():
    from flocoder_tpu.models.sd_vae import SDVAE
    vae = SDVAE(image_size=32, channels=(8, 16, 16, 16),
                weights_path="/nonexistent")
    x = jnp.zeros((1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), x)
    z = vae.encode(params, x)
    assert z.shape == (1, 4, 4, 4)  # 32 / 8, posterior mean only
    rec = vae.decode(params, z)
    assert rec.shape == (1, 32, 32, 3)
    assert vae.latent_shape(128) == (16, 16, 4)


def test_setup_codec_dispatch():
    cfg = Config({"codec": {"choice": "noop", "in_channels": 3}})
    assert isinstance(setup_codec(cfg), NoOpAE)
    cfg = Config({"codec": {"choice": "resize", "latent_shape": [3, 8, 8],
                            "image_size": 16}})
    assert isinstance(setup_codec(cfg), SimpleResizeAE)
    cfg = Config({"codec": {"choice": "vqgan", "in_channels": 1,
                            "hidden_channels": 8, "num_downsamples": 2,
                            "internal_dim": 8, "vq_embedding_dim": 4,
                            "codebook_levels": 2, "vq_num_embeddings": 8,
                            "commitment_weight": 0.5}})
    c = setup_codec(cfg)
    assert isinstance(c, VQVAE) and c.in_channels == 1
