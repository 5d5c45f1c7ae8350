"""Audio codec (DAC-family) training: jitted two-phase (recon → GAN) steps.

The DAC recipe's reconstruction terms (multi-scale log-mel L1 + multi-scale
STFT + waveform L1 + RVQ commitment) in ONE XLA executable per step —
forward, losses, Adam and the RVQ EMA codebook fold together, mirroring
training/vqgan.py's warmup step. The ADVERSARIAL phase
(make_audio_gan_step, VERDICT r4 #3) adds HiFi-GAN/DAC-style multi-period
+ multi-scale waveform discriminators (models/audio_disc.py) with hinge
losses and feature matching, reusing the image GAN step's structure
(warmup→GAN phases, alternating Adams, the single-forward vjp trick) —
the same two-phase skeleton as the reference's VQGAN trainer
(/root/reference/train_vqgan.py:213-246), new domain. Rationale: the
phase-insensitive mel/STFT objectives leave waveform SNR near 0 dB
(eval_out/quality/audio.json round-4 finding); the period/scale waveform
discriminators are exactly the instrument that pins phase.

Under a >1-device mesh the steps run in shard_map with the batch sharded
over the data axes, grads pmean'd and RVQ stats psum'd — identical
distribution contract to the image codecs (SURVEY §2d).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..metrics import feature_matching_loss, hinge_d_loss
from ..ops.audio import multiscale_mel_loss, multiscale_stft_loss
from .vqgan import (VQGANState, create_vqgan_state, _default_donate,
                    _g_trainable, _mesh_wrap, _resolve_axis)

__all__ = ["make_audio_optimizer", "make_audio_train_step",
           "make_audio_gan_step", "make_audio_eval_step",
           "audio_codec_losses"]


def make_audio_optimizer(learning_rate: float, grad_clip: float = 1.0):
    return optax.chain(optax.clip_by_global_norm(grad_clip),
                       optax.adam(learning_rate, b1=0.8, b2=0.99))


def _loss_cfg(config):
    # tolerate both the attribute-style Config and a plain dict
    cc = (config.codec if hasattr(config, "codec")
          else config.get("codec", {}) if hasattr(config, "get") else {})
    get = (cc.get if hasattr(cc, "get") else lambda k, d: d)
    return {
        "lambda_wave": float(get("lambda_wave", 1.0)),
        "lambda_mel": float(get("lambda_mel", 15.0)),
        "lambda_stft": float(get("lambda_stft", 1.0)),
        "lambda_vq": float(get("lambda_vq", 1.0)),
        "sample_rate": int(get("sample_rate", 16000)),
        "fft_sizes": tuple(get("fft_sizes", [512, 1024, 2048])),
        "n_mels": tuple(get("n_mels", [40, 80, 160])),
    }


def audio_codec_losses(recon, target, commit_loss, cfg) -> dict:
    """The DAC loss bundle on (B, T, 1) waveforms. ``cfg`` from _loss_cfg."""
    x = target[..., 0] if target.ndim == 3 else target
    y = recon[..., 0] if recon.ndim == 3 else recon
    losses = {
        "wave_l1": jnp.mean(jnp.abs(x - y)),
        "mel": multiscale_mel_loss(x, y, cfg["sample_rate"],
                                   fft_sizes=cfg["fft_sizes"],
                                   n_mels=cfg["n_mels"]),
        "stft": multiscale_stft_loss(x, y, fft_sizes=cfg["fft_sizes"][:2]),
        "vq": commit_loss,
    }
    losses["total"] = (cfg["lambda_wave"] * losses["wave_l1"]
                       + cfg["lambda_mel"] * losses["mel"]
                       + cfg["lambda_stft"] * losses["stft"]
                       + cfg["lambda_vq"] * losses["vq"])
    return losses


def make_audio_train_step(codec, tx, config,
                          axis_name: Optional[str] = None,
                          donate: Optional[bool] = None, mesh=None):
    """(state, batch (B,T,1), rng) → (state, aux, idx). State is a
    VQGANState with disc fields None (create via
    training.vqgan.create_vqgan_state(params, tx))."""
    if donate is None:
        donate = _default_donate()
    axis_name = _resolve_axis(mesh, axis_name)
    cfg = _loss_cfg(config)

    def loss_fn(g_params, vq_state, batch, rng):
        params = {**g_params, "vq": vq_state}
        recon, commit, idx, new_vq = codec.forward(
            params, batch, train=True, rng=rng, axis_name=axis_name)
        losses = audio_codec_losses(recon, batch, commit, cfg)
        return losses["total"], (losses, idx, new_vq)

    def step_fn(state: VQGANState, batch, rng):
        (_, (losses, idx, new_vq)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(_g_trainable(state.params),
                                   state.params["vq"], batch, rng)
        aux = dict(losses)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
        updates, opt_g = tx.update(grads, state.opt_g,
                                   _g_trainable(state.params))
        g_new = optax.apply_updates(_g_trainable(state.params), updates)
        # disc fields pass through untouched so the recon (warmup) phase
        # composes with the GAN phase over one state (train_audio_codec.py)
        new_state = VQGANState(params={**g_new, "vq": new_vq}, opt_g=opt_g,
                               disc_vars=state.disc_vars,
                               opt_d=state.opt_d,
                               step=state.step + 1)
        return new_state, aux, idx

    if mesh is not None:
        return _mesh_wrap(step_fn, mesh, axis_name, donate)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_audio_gan_step(codec, tx_g, disc, tx_d, config,
                        axis_name: Optional[str] = None,
                        donate: Optional[bool] = None, mesh=None):
    """Adversarial phase: D step then G step in one executable (the audio
    twin of training/vqgan.py:make_vqgan_gan_step, VERDICT r4 #3).

    ``disc`` is a models/audio_disc.DACDiscriminator (plain-conv ensemble,
    no mutable stats — ``state.disc_vars = {"params": ...}``). One codec
    forward per step with its vjp captured; the D step trains all
    period/scale discriminators on (real, stop-grad fake) with a summed
    hinge loss; the G step adds ``lambda_gen``·(non-saturating hinge over
    every discriminator head) + ``lambda_feat``·feature-matching to the
    reconstruction bundle and pulls gradients back through the saved vjp.
    The G step's discriminator forward uses the JUST-UPDATED D (reference
    ordering, train_vqgan.py:236-246); its feature-matching targets reuse
    the D step's real-waveform features — stop-gradient constants one Adam
    step stale, saving one full ensemble forward (the image path's
    ``share_real_features`` semantics, made the default here since the
    audio ensemble is 8 discriminators deep)."""
    if donate is None:
        donate = _default_donate()
    axis_name = _resolve_axis(mesh, axis_name)
    cfg = _loss_cfg(config)
    cc = (config.codec if hasattr(config, "codec")
          else config.get("codec", {}) if hasattr(config, "get") else {})
    get = (cc.get if hasattr(cc, "get") else lambda k, d: d)
    lambda_gen = float(get("lambda_gen", 1.0))
    lambda_feat = float(get("lambda_feat", 2.0))

    def _ens_hinge_d(real_logits, fake_logits):
        losses = [hinge_d_loss(r, f) for r, f in zip(real_logits,
                                                     fake_logits)]
        return sum(losses) / len(losses)

    def _ens_gen(fake_logits):
        # non-saturating hinge generator loss, averaged over heads
        losses = [-jnp.mean(l) for l in fake_logits]
        return sum(losses) / len(losses)

    def _ens_feat(real_feats, fake_feats):
        losses = [feature_matching_loss(rf, ff)
                  for rf, ff in zip(real_feats, fake_feats)]
        return sum(losses) / len(losses)

    def step_fn(state: VQGANState, batch, rng):
        x = batch if batch.ndim == 3 else batch[..., None]
        g_params = _g_trainable(state.params)

        def forward_fn(gp):
            recon, commit, idx, new_vq = codec.forward(
                {**gp, "vq": state.params["vq"]}, x, train=True, rng=rng,
                axis_name=axis_name)
            return (recon, commit), (idx, new_vq)

        (recon, commit), vjp_fn, (idx, new_vq) = jax.vjp(
            forward_fn, g_params, has_aux=True)
        fake = jax.lax.stop_gradient(recon)

        # ---- D step ------------------------------------------------------
        def d_loss_fn(d_params):
            real_logits, real_feats = disc.apply({"params": d_params}, x)
            fake_logits, _ = disc.apply({"params": d_params}, fake)
            return _ens_hinge_d(real_logits, fake_logits), real_feats

        (d_loss, real_feats), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc_vars["params"])
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
            d_loss = jax.lax.pmean(d_loss, axis_name)
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d,
                                       state.disc_vars["params"])
        d_params_new = optax.apply_updates(state.disc_vars["params"],
                                           d_updates)

        # ---- G step (just-updated D; stop-grad real feature targets) -----
        real_feats = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                            real_feats)

        def g_loss_on_outputs(recon, commit):
            losses = audio_codec_losses(recon, x, commit, cfg)
            fake_logits, fake_feats = disc.apply(
                {"params": d_params_new}, recon)
            losses["gen"] = _ens_gen(fake_logits)
            losses["feat"] = _ens_feat(real_feats, fake_feats)
            losses["total"] = (losses["total"]
                               + lambda_gen * losses["gen"]
                               + lambda_feat * losses["feat"])
            return losses["total"], losses

        (total, losses), (d_recon, d_commit) = jax.value_and_grad(
            g_loss_on_outputs, argnums=(0, 1), has_aux=True)(recon, commit)
        (g_grads,) = vjp_fn((d_recon, d_commit))
        aux = dict(losses)
        aux["d_loss"] = d_loss
        if axis_name is not None:
            g_grads = jax.lax.pmean(g_grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, g_params)
        g_new = optax.apply_updates(g_params, g_updates)
        new_state = VQGANState(params={**g_new, "vq": new_vq}, opt_g=opt_g,
                               disc_vars={"params": d_params_new},
                               opt_d=opt_d, step=state.step + 1)
        return new_state, aux, idx

    if mesh is not None:
        return _mesh_wrap(step_fn, mesh, axis_name, donate)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_audio_eval_step(codec, config):
    """(params, batch) → (recon, losses, idx) — no state updates."""
    cfg = _loss_cfg(config)

    def eval_fn(params, batch):
        recon, commit, idx, _ = codec.forward(params, batch, train=False)
        losses = audio_codec_losses(recon, batch, commit, cfg)
        return recon, losses, idx

    return jax.jit(eval_fn)
