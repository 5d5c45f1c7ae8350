#!/usr/bin/env python3
"""Train the DAC-style audio codec (reference README.md:144 TODO "Add audio
example, e.g. using DAC" — the reference ships no audio path; this is the
audio twin of train_vqgan.py).

Usage:
    ./train_audio_codec.py --config-name audio_dac.yaml [key=value ...]

Data: .wav files under ``config.data`` (class label = first-level subdir),
or the synthetic chord dataset when the path doesn't exist (data=synthetic
runs anywhere). One jitted step per batch (training/audio.py): forward +
multi-scale mel/STFT losses + Adam + RVQ EMA fold. Validation dumps
original/reconstruction WAV pairs so progress is audible, not just a number.

Downstream: tools/preencode_audio.py encodes a WAV corpus into folded
latent images; train_flow.py / generate_samples.py then run on audio
latents unchanged (models/audio_codec.py fold/unfold).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def train_audio_codec(config):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import ldcfg
    from flocoder_tpu.data.audio_io import (AudioFolderDataset,
                                            SyntheticAudioDataset, save_wav)
    from flocoder_tpu.data.datasets import Loader
    from flocoder_tpu.models.codecs import setup_codec
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.checkpoint import (save_checkpoint,
                                                  load_checkpoint,
                                                  load_into_tree,
                                                  flatten_tree)
    from flocoder_tpu.training.audio import (make_audio_optimizer,
                                             make_audio_train_step,
                                             make_audio_gan_step,
                                             make_audio_eval_step)
    from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                             make_vqgan_optimizers)
    from flocoder_tpu.utils import logging as wblog
    from flocoder_tpu.utils.codebook_analysis import (CodebookUsageTracker,
                                                      analyze_codebooks)
    from flocoder_tpu.utils.rng import make_training_key

    mesh = make_mesh()
    cc = config.codec
    if str(cc.get("choice", "dac")) != "dac":
        raise SystemExit("train_audio_codec.py trains codec.choice=dac")
    sample_rate = int(cc.get("sample_rate", 16000))
    crop_len = int(cc.get("crop_len", 8192))
    batch_size = int(cc.get("batch_size", 32))
    epochs = int(cc.get("epochs", 200))
    lr = float(cc.get("learning_rate", 1e-4))
    no_wandb = bool(ldcfg(config, "no_wandb", False))
    seed = int(ldcfg(config, "seed", 0))
    data_path = os.path.expanduser(str(config.data))

    def make_ds(split, seed_off):
        if os.path.isdir(data_path):
            # per-split subdirs when present; otherwise one corpus serves
            # both (random crops differ by loader seed)
            root = (os.path.join(data_path, split)
                    if os.path.isdir(os.path.join(data_path, split))
                    else data_path)
            return AudioFolderDataset(root, crop_len=crop_len,
                                      sample_rate=sample_rate)
        return SyntheticAudioDataset(
            n=int(ldcfg(config, "synthetic_n", 256)), crop_len=crop_len,
            sample_rate=sample_rate,
            n_classes=int(ldcfg(config, "n_classes", 4)), seed=seed_off)

    train_ds = make_ds("train", seed)
    val_ds = make_ds("val", seed + 10_000)
    train_loader = Loader(train_ds, batch_size, shuffle=True,
                          num_workers=int(ldcfg(config, "num_workers", 4)),
                          seed=seed)
    val_loader = Loader(val_ds, batch_size, shuffle=True, num_workers=1,
                        seed=seed + 1)
    print(f"audio data: {len(train_ds)} train / {len(val_ds)} val clips, "
          f"crop {crop_len} @ {sample_rate} Hz")

    codec = setup_codec(config)
    rng = jax.random.PRNGKey(seed)
    rng, k_init = jax.random.split(rng)
    sample = jnp.zeros((2, crop_len, 1))
    params = codec.init(k_init, sample)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(
        {"e": params["encoder"], "d": params["decoder"]}))
    print(f"codec params: {n_params/1e6:.2f}M  latent "
          f"{codec.latent_shape(crop_len)} (folded), hop {codec.hop}")

    resume = ldcfg(config, "load_checkpoint", None)
    if resume and os.path.exists(str(resume)):
        ck = load_checkpoint(str(resume))
        params = load_into_tree(params, flatten_tree(ck["model_state_dict"]),
                                strict=False)
        print(f"resumed codec from {resume} (epoch {ck['epoch']})")

    tx = make_audio_optimizer(lr)
    step_mesh = mesh if mesh.size > 1 else None
    if step_mesh is not None:
        print(f"multi-chip audio codec training: shard_map over {mesh.shape}")

    # adversarial stage (codec.gan, default on — VERDICT r4 #3: mel/STFT
    # alone leave phase unpinned): two-phase warmup→GAN like train_vqgan.py,
    # with HiFi-GAN/DAC-style multi-period + multi-scale waveform
    # discriminators (models/audio_disc.py). gan=false reproduces the
    # recon-only recipe.
    use_gan = bool(cc.get("gan", True))
    gan_warmup_epochs = int(cc.get("gan_warmup_epochs", 50))
    gan_step = None
    if use_gan:
        from flocoder_tpu.models.audio_disc import DACDiscriminator
        disc = DACDiscriminator(
            periods=tuple(cc.get("disc_periods", [2, 3, 5, 7, 11])),
            scales=int(cc.get("disc_scales", 3)),
            base_channels=int(cc.get("disc_base_channels", 16)))
        rng, k_disc = jax.random.split(rng)
        d_vars = disc.init(k_disc, sample)
        n_d = sum(p.size for p in jax.tree_util.tree_leaves(d_vars))
        print(f"waveform discriminators: {len(disc.periods)} periods + "
              f"{disc.scales} scales, {n_d/1e6:.2f}M params, GAN phase "
              f"from epoch {gan_warmup_epochs + 1}")
        _, tx_d = make_vqgan_optimizers(
            lr, d_lr_scale=float(cc.get("d_lr_scale", 1.0)))
        state = create_vqgan_state(params, tx, {"params": d_vars["params"]},
                                   tx_d)
        gan_step = make_audio_gan_step(codec, tx, disc, tx_d, config,
                                       mesh=step_mesh)
    else:
        state = create_vqgan_state(params, tx)
    train_step = make_audio_train_step(codec, tx, config, mesh=step_mesh)
    eval_step = make_audio_eval_step(codec, config)

    use_wandb = not no_wandb
    if use_wandb:
        wblog.init(project=str(cc.get("project_name", "flocoder-audio")),
                   name=ldcfg(config, "run_name", None), config=dict(config))

    cb_tracker = CodebookUsageTracker(
        num_levels=int(cc.get("codebook_levels", 4)),
        codebook_size=int(cc.get("vq_num_embeddings", 512)))
    output_dir = f"output_dac_{os.path.basename(data_path)}"
    os.makedirs(output_dir, exist_ok=True)

    key = make_training_key(seed + 1, ldcfg(config, "rng_impl", None))
    t0 = time.time()
    for epoch in range(1, epochs + 1):
        gan_phase = use_gan and epoch > gan_warmup_epochs
        step_fn = gan_step if gan_phase else train_step
        ep_aux = []
        t_ep = time.time()
        for batch in train_loader:
            key, k = jax.random.split(key)
            x = shard_batch(mesh, batch["target"])
            state, aux, idx = step_fn(state, x, k)
            ep_aux.append(aux)
            cb_tracker.update_counts(
                "train", np.asarray(idx).reshape(-1, idx.shape[-1]))
        means = {k: float(np.mean([float(a[k]) for a in ep_aux]))
                 for k in ep_aux[0]} if ep_aux else {}
        sps = len(ep_aux) * batch_size / max(time.time() - t_ep, 1e-9)
        phase = "GAN" if gan_phase else "recon"
        print(f"epoch {epoch}/{epochs} [{phase}] " +
              "  ".join(f"{k} {v:.4f}" for k, v in means.items()) +
              f"  {sps:.0f} clips/s")
        if use_wandb:
            wblog.log({f"train/{k}": v for k, v in means.items()}
                      | {"epoch": epoch, "clips_per_sec": sps})

        if epoch % int(ldcfg(config, "eval_every", 5)) == 0 or epoch == 1:
            vb = next(iter(val_loader))
            x = jnp.asarray(vb["target"])
            recon, vlosses, idx = eval_step(state.params, x)
            cb_tracker.update_counts(
                "val", np.asarray(idx).reshape(-1, idx.shape[-1]))
            vmeans = {k: float(v) for k, v in vlosses.items()}
            print("  val: " + "  ".join(f"{k} {v:.4f}"
                                        for k, v in vmeans.items()))
            if use_wandb:
                wblog.log({f"val/{k}": v for k, v in vmeans.items()}
                          | {"epoch": epoch})
            for i in range(min(2, x.shape[0])):  # audible progress
                save_wav(os.path.join(output_dir,
                                      f"ep{epoch:04d}_{i}_orig.wav"),
                         np.asarray(x[i]), sample_rate)
                save_wav(os.path.join(output_dir,
                                      f"ep{epoch:04d}_{i}_recon.wav"),
                         np.asarray(recon[i]), sample_rate)

        if epoch % 10 == 0:
            analyze_codebooks(cb_tracker, state.params["vq"], epoch,
                              use_wandb=use_wandb, output_dir=output_dir)
            cb_tracker.reset_all()

        if epoch % int(cc.get("ckpt_every", 50)) == 0 or epoch == epochs:
            path = save_checkpoint(state.params, epoch=epoch,
                                   ckpt_dir="checkpoints", prefix="dac_",
                                   config=config, keep=5)
            print(f"  checkpoint -> {path}")
    print(f"done in {time.time()-t0:.0f}s")
    if use_wandb:
        wblog.finish()
    return state


def main():
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from flocoder_tpu.config import parse_cli
    config = parse_cli(default_config=None,
                       config_dir=os.path.join(os.path.dirname(
                           os.path.abspath(__file__)), "configs"))
    print("Config:", dict(config))
    train_audio_codec(config)


if __name__ == "__main__":
    main()
