"""Audio adversarial stage tests (VERDICT r4 #3): the multi-period +
multi-scale waveform discriminators (models/audio_disc.py) and the DAC GAN
step (training/audio.py:make_audio_gan_step). The reference has no audio
family; the adversarial pattern mirrored here is its VQGAN GAN phase
(/root/reference/train_vqgan.py:213-246)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flocoder_tpu.config import config_from_dict
from flocoder_tpu.models.audio_codec import DACCodec
from flocoder_tpu.models.audio_disc import (DACDiscriminator,
                                            PeriodDiscriminator,
                                            ScaleDiscriminator)
from flocoder_tpu.training.audio import (make_audio_gan_step,
                                         make_audio_optimizer)
from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                         make_vqgan_optimizers)


def _wav(b=2, t=256, seed=0):
    rng = np.random.default_rng(seed)
    t_ax = np.arange(t) / 8000.0
    out = [np.sin(2 * np.pi * rng.uniform(100, 900) * t_ax) * 0.5
           for _ in range(b)]
    return jnp.asarray(np.stack(out).astype(np.float32))[..., None]


def _tiny_codec():
    return DACCodec(sample_rate=8000, strides=(2, 4, 4), base_channels=8,
                    vq_embedding_dim=4, codebook_levels=2,
                    vq_num_embeddings=16)


def _tiny_disc():
    return DACDiscriminator(periods=(2, 3), scales=2, base_channels=4,
                            n_layers=2, max_channels=32)


def _gan_cfg():
    return config_from_dict({"codec": {
        "sample_rate": 8000, "fft_sizes": [64], "n_mels": [8],
        "lambda_gen": 1.0, "lambda_feat": 2.0}})


# --------------------------------------------------------------------------
# discriminator shapes / contracts
# --------------------------------------------------------------------------

def test_period_disc_folds_and_strides_time():
    d = PeriodDiscriminator(period=3, base_channels=4, n_layers=2,
                            max_channels=16)
    x = _wav(2, 256)
    vars_ = d.init(jax.random.PRNGKey(0), x)
    logits, feats = d.apply(vars_, x)
    # logits keep the folded layout: (B, T', period, 1)
    assert logits.shape[0] == 2 and logits.shape[2] == 3
    assert logits.shape[3] == 1
    assert len(feats) == 3  # n_layers + pre-logits stage
    # time axis shrinks by stride 3 per strided layer
    assert feats[1].shape[1] < feats[0].shape[1]


def test_period_disc_pads_non_divisible_lengths():
    d = PeriodDiscriminator(period=5, base_channels=4, n_layers=2,
                            max_channels=16)
    x = _wav(1, 253)  # 253 % 5 != 0 → reflect pad to 255
    vars_ = d.init(jax.random.PRNGKey(0), x)
    logits, _ = d.apply(vars_, x)
    assert logits.shape[2] == 5
    assert np.isfinite(np.asarray(logits)).all()


def test_scale_disc_pools():
    d1 = ScaleDiscriminator(pool=1, base_channels=4, n_layers=2,
                            max_channels=16)
    d4 = ScaleDiscriminator(pool=4, base_channels=4, n_layers=2,
                            max_channels=16)
    x = _wav(2, 256)
    l1, _ = d1.apply(d1.init(jax.random.PRNGKey(0), x), x)
    l4, _ = d4.apply(d4.init(jax.random.PRNGKey(0), x), x)
    assert l1.shape[1] == 4 * l4.shape[1]  # pooled view is 4× shorter


def test_ensemble_contract():
    disc = _tiny_disc()
    x = _wav(2, 256)
    vars_ = disc.init(jax.random.PRNGKey(1), x)
    logits, feats = disc.apply(vars_, x)
    assert len(logits) == 4  # 2 periods + 2 scales
    assert len(feats) == 4
    assert all(np.isfinite(np.asarray(l)).all() for l in logits)
    # distinct waveforms get distinct judgments (not a constant function)
    logits_b, _ = disc.apply(vars_, _wav(2, 256, seed=9))
    assert any(float(jnp.abs(a - b).max()) > 1e-6
               for a, b in zip(logits, logits_b))


# --------------------------------------------------------------------------
# the GAN step
# --------------------------------------------------------------------------

def _gan_fixture():
    codec, disc, cfg = _tiny_codec(), _tiny_disc(), _gan_cfg()
    x = _wav(2, 256)
    params = codec.init(jax.random.PRNGKey(0), x)
    d_vars = disc.init(jax.random.PRNGKey(1), x)
    tx_g = make_audio_optimizer(1e-3)
    _, tx_d = make_vqgan_optimizers(1e-3, d_lr_scale=1.0)
    state = create_vqgan_state(params, tx_g, {"params": d_vars["params"]},
                               tx_d)
    step = make_audio_gan_step(codec, tx_g, disc, tx_d, cfg, donate=False)
    return codec, state, step, x


def test_gan_step_runs_and_updates_both_players():
    _, state, step, x = _gan_fixture()
    new_state, aux, idx = step(state, x, jax.random.PRNGKey(2))
    for k in ("total", "d_loss", "gen", "feat", "mel", "wave_l1"):
        assert k in aux and np.isfinite(float(aux[k])), k
    # generator moved
    g0 = jax.tree_util.tree_leaves(state.params["encoder"])[0]
    g1 = jax.tree_util.tree_leaves(new_state.params["encoder"])[0]
    assert float(jnp.abs(g0 - g1).max()) > 0
    # discriminator moved
    d0 = jax.tree_util.tree_leaves(state.disc_vars["params"])[0]
    d1 = jax.tree_util.tree_leaves(new_state.disc_vars["params"])[0]
    assert float(jnp.abs(d0 - d1).max()) > 0
    # RVQ EMA folded
    assert int(new_state.step) == 1
    assert idx.shape[-1] == 2  # codebook_levels


def test_gan_step_adversarial_terms_nonzero_gradient():
    """lambda_gen/feat actually reach the generator: a step with the
    adversarial weights zeroed produces different generator params."""
    codec, disc, x = _tiny_codec(), _tiny_disc(), _wav(2, 256)
    params = codec.init(jax.random.PRNGKey(0), x)
    d_vars = disc.init(jax.random.PRNGKey(1), x)
    tx_g = make_audio_optimizer(1e-3)
    _, tx_d = make_vqgan_optimizers(1e-3, d_lr_scale=1.0)

    def run(lg, lf):
        cfg = config_from_dict({"codec": {
            "sample_rate": 8000, "fft_sizes": [64], "n_mels": [8],
            "lambda_gen": lg, "lambda_feat": lf}})
        st = create_vqgan_state(params, tx_g,
                                {"params": d_vars["params"]}, tx_d)
        step = make_audio_gan_step(codec, tx_g, disc, tx_d, cfg,
                                   donate=False)
        new_st, aux, _ = step(st, x, jax.random.PRNGKey(2))
        return new_st, aux

    st_on, aux_on = run(1.0, 2.0)
    st_off, aux_off = run(0.0, 0.0)
    # recon terms identical (same rng/params), totals differ by adv terms
    assert abs(float(aux_on["mel"]) - float(aux_off["mel"])) < 1e-6
    assert float(aux_on["total"]) != pytest.approx(float(aux_off["total"]))
    a = jax.tree_util.tree_leaves(st_on.params["decoder"])[1]
    b = jax.tree_util.tree_leaves(st_off.params["decoder"])[1]
    assert float(jnp.abs(a - b).max()) > 0


def test_gan_step_under_mesh_matches_single_device():
    """shard_map GAN step (batch over 'data', grads pmean'd, RVQ psum'd) is
    numerically the single-device step on the same full batch."""
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    codec, disc, cfg = _tiny_codec(), _tiny_disc(), _gan_cfg()
    x = _wav(8, 256)
    params = codec.init(jax.random.PRNGKey(0), x[:2])
    d_vars = disc.init(jax.random.PRNGKey(1), x[:2])
    tx_g = make_audio_optimizer(1e-3)
    _, tx_d = make_vqgan_optimizers(1e-3, d_lr_scale=1.0)

    def fresh():
        return create_vqgan_state(params, tx_g,
                                  {"params": d_vars["params"]}, tx_d)

    single = make_audio_gan_step(codec, tx_g, disc, tx_d, cfg, donate=False)
    s1, a1, _ = single(fresh(), x, jax.random.PRNGKey(3))

    mesh = make_mesh(n_model=1)
    assert mesh.size > 1, "conftest should provide 8 virtual devices"
    sharded = make_audio_gan_step(codec, tx_g, disc, tx_d, cfg, mesh=mesh,
                                  donate=False)
    s2, a2, _ = sharded(fresh(), shard_batch(mesh, x),
                        jax.random.PRNGKey(3))
    # per-shard batches see different RVQ noise draws than the full batch,
    # so compare the loss and params to a loose-but-meaningful tolerance
    assert float(a2["d_loss"]) == pytest.approx(float(a1["d_loss"]),
                                                rel=0.2)
    l1 = jax.tree_util.tree_leaves(s1.params["decoder"])[0]
    l2 = jax.tree_util.tree_leaves(s2.params["decoder"])[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=5e-3)


def test_gan_training_improves_discrimination():
    """A few alternating steps move the D toward separating real from
    fake (hinge loss decreases from its 2.0 untrained value)."""
    _, state, step, x = _gan_fixture()
    d_losses = []
    key = jax.random.PRNGKey(5)
    for i in range(8):
        key, k = jax.random.split(key)
        state, aux, _ = step(state, x, k)
        d_losses.append(float(aux["d_loss"]))
    assert d_losses[-1] < d_losses[0], d_losses
    assert all(np.isfinite(v) for v in d_losses)
