"""Audio codec (DAC-family) training: one jitted reconstruction step.

The DAC recipe's reconstruction terms (multi-scale log-mel L1 + multi-scale
STFT + waveform L1 + RVQ commitment) in ONE XLA executable per step —
forward, losses, Adam and the RVQ EMA codebook fold together, mirroring
training/vqgan.py's warmup step (the adversarial phase is an extension
point; the reference TODO asks for the audio *example*, and the
spectral-loss recipe trains a clean codec for the latent-flow pipeline).

Under a >1-device mesh the step runs in shard_map with the batch sharded
over the data axes, grads pmean'd and RVQ stats psum'd — identical
distribution contract to the image codecs (SURVEY §2d).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.audio import multiscale_mel_loss, multiscale_stft_loss
from .vqgan import (VQGANState, create_vqgan_state, _default_donate,
                    _g_trainable, _mesh_wrap, _resolve_axis)

__all__ = ["make_audio_optimizer", "make_audio_train_step",
           "make_audio_eval_step", "audio_codec_losses"]


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
        new_state = VQGANState(params={**g_new, "vq": new_vq}, opt_g=opt_g,
                               disc_vars=None, opt_d=None,
                               step=state.step + 1)
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
