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


def test_gan_step_bf16_disc_and_vgg():
    """The GAN step with the whole net stack in bf16 compute (codec + disc +
    VGG perceptual follow codec.bf16 — train_vqgan.py wiring): one step runs,
    losses finite, params updated. Guards the GaussianBlur kernel-dtype fix
    (fp32-only blur used to TypeError under a bf16 discriminator)."""
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.discriminator import (
        VQGANPlusPatchDiscriminator, init_discriminator, make_disc_apply)
    from flocoder_tpu.models.perceptual import make_perceptual_fn
    from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                             make_vqgan_optimizers,
                                             make_vqgan_gan_step)
    B, S = 4, 16
    cfg = config_from_dict({"codec": {
        "choice": "vqgan", "in_channels": 3, "hidden_channels": 8,
        "num_downsamples": 2, "internal_dim": 8, "vq_embedding_dim": 4,
        "codebook_levels": 2, "vq_num_embeddings": 8,
        "commitment_weight": 0.5, "image_size": S,
        "lambda_gen": 0.05, "lambda_mse": 0.5, "lambda_perc": 1e-3,
        "lambda_vq": 0.25}})
    codec = VQVAE(in_channels=3, hidden_channels=8, num_downsamples=2,
                  internal_dim=8, vq_embedding_dim=4, codebook_levels=2,
                  vq_num_embeddings=8, dtype=jnp.bfloat16)
    sample = jnp.zeros((2, S, S, 3))
    params = codec.init(jax.random.PRNGKey(0), sample)
    disc = VQGANPlusPatchDiscriminator(in_channels=3, dtype=jnp.bfloat16)
    disc_vars = init_discriminator(disc, jax.random.PRNGKey(1), sample)
    tx_g, tx_d = make_vqgan_optimizers(1e-4)
    state = create_vqgan_state(params, tx_g, disc_vars, tx_d)
    step = make_vqgan_gan_step(
        codec, tx_g, disc, make_disc_apply(disc, update_stats=True),
        make_disc_apply(disc, update_stats=False), tx_d, cfg,
        make_perceptual_fn(S, weights_path="/nonexistent",
                           dtype=jnp.bfloat16))
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, S, S, 3)).astype(np.float32) * 0.5)
    new_state, aux, idx = step(state, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(aux["total"])) and np.isfinite(float(aux["d_loss"]))
    # params are fp32 master copies and actually moved
    enc0 = jax.tree_util.tree_leaves(state.params["encoder"])[0]
    enc1 = jax.tree_util.tree_leaves(new_state.params["encoder"])[0]
    assert enc0.dtype == jnp.float32
    assert float(np.abs(np.asarray(enc1 - enc0)).max()) > 0


def test_gan_step_share_real_features():
    """codec.share_real_features=true reuses the D step's real-image feature
    maps as the G step's feature-matching targets (one fewer disc forward,
    training/vqgan.py). Same rng/state → identical recon, so the mse/vq
    components must match the reference-exact variant bit-for-bit; the g_loss
    may differ only via the one-Adam-step-stale targets."""
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.discriminator import (
        VQGANPlusPatchDiscriminator, init_discriminator, make_disc_apply)
    from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                             make_vqgan_optimizers,
                                             make_vqgan_gan_step)
    B, S = 4, 16
    base = {"codec": {
        "choice": "vqgan", "in_channels": 3, "hidden_channels": 8,
        "num_downsamples": 2, "internal_dim": 8, "vq_embedding_dim": 4,
        "codebook_levels": 2, "vq_num_embeddings": 8,
        "commitment_weight": 0.5, "image_size": S,
        "lambda_gen": 0.05, "lambda_mse": 0.5, "lambda_vq": 0.25}}
    codec = VQVAE(in_channels=3, hidden_channels=8, num_downsamples=2,
                  internal_dim=8, vq_embedding_dim=4, codebook_levels=2,
                  vq_num_embeddings=8)
    sample = jnp.zeros((2, S, S, 3))
    params = codec.init(jax.random.PRNGKey(0), sample)
    disc = VQGANPlusPatchDiscriminator(in_channels=3)
    disc_vars = init_discriminator(disc, jax.random.PRNGKey(1), sample)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, S, S, 3)).astype(np.float32) * 0.5)

    def run(share):
        cfg_d = {"codec": dict(base["codec"], share_real_features=share)}
        cfg = config_from_dict(cfg_d)
        tx_g, tx_d = make_vqgan_optimizers(1e-4)
        state = create_vqgan_state(params, tx_g, disc_vars, tx_d)
        step = make_vqgan_gan_step(
            codec, tx_g, disc, make_disc_apply(disc, update_stats=True),
            make_disc_apply(disc, update_stats=False), tx_d, cfg,
            donate=False)
        new_state, aux, _ = step(state, x, jax.random.PRNGKey(3))
        return new_state, aux

    s_ref, a_ref = run(False)
    s_sh, a_sh = run(True)
    for k in ("mse", "vq", "d_loss"):
        assert float(a_ref[k]) == float(a_sh[k]), k
    assert np.isfinite(float(a_sh["total"]))
    assert np.isfinite(float(a_sh["g_loss"]))
    enc0 = jax.tree_util.tree_leaves(params["encoder"])[0]
    enc1 = jax.tree_util.tree_leaves(s_sh.params["encoder"])[0]
    assert float(np.abs(np.asarray(enc1 - enc0)).max()) > 0
