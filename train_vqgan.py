#!/usr/bin/env python3
"""Train the VQGAN codec (reference: train_vqgan.py).

Usage:
    ./train_vqgan.py --config-name flowers_vqgan.yaml [key=value ...]

Two-phase schedule (reference: train_vqgan.py:194-246): reconstruction-only
warmup for ``codec.warmup_epochs``, then adversarial training with an
alternating jitted D+G step (training/vqgan.py). Validation with demo recon
grids and (for MIDI) note metrics; codebook usage accumulation with analysis
windows (reference: :129-132, :287-288, :329-336); checkpoints every 50
epochs.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def train_vqgan(config):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import ldcfg
    from flocoder_tpu.data.datasets import create_image_loaders
    from flocoder_tpu.metrics import get_discriminator_stats
    from flocoder_tpu.models.codecs import setup_codec
    from flocoder_tpu.models.discriminator import (
        VQGANPlusPatchDiscriminator, init_discriminator, make_disc_apply)
    from flocoder_tpu.models.perceptual import make_perceptual_fn
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.checkpoint import (save_checkpoint,
                                                  load_checkpoint,
                                                  load_into_tree,
                                                  flatten_tree)
    from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                             make_vqgan_optimizers,
                                             make_vqgan_warmup_step,
                                             make_vqgan_gan_step,
                                             make_vqgan_eval_step, VQGANState)
    from flocoder_tpu.utils import logging as wblog
    from flocoder_tpu.utils.rng import make_training_key
    from flocoder_tpu.utils.codebook_analysis import (CodebookUsageTracker,
                                                      analyze_codebooks)
    from flocoder_tpu.utils.viz import save_img_grid

    mesh = make_mesh()
    cc = config.codec
    image_size = int(cc.get("image_size", ldcfg(config, "image_size", 128)))
    batch_size = int(cc.get("batch_size", 64))
    epochs = int(cc.get("epochs", 2000))
    warmup_epochs = int(cc.get("warmup_epochs", 5))
    lr = float(cc.get("learning_rate", 1e-4))
    in_channels = int(cc.get("in_channels", 3))
    no_wandb = bool(ldcfg(config, "no_wandb", False))
    seed = int(ldcfg(config, "seed", 0))
    data_path = os.path.expanduser(str(config.data))
    is_midi = any(s in data_path.lower() for s in ("pop909", "midi"))

    train_loader, val_loader = create_image_loaders(
        batch_size, image_size, data_path,
        num_workers=int(ldcfg(config, "num_workers", 4)),
        is_midi=is_midi, config=config, seed=seed)

    # quant_* flags are INFERENCE-only (W8A8 int8 has round() in the
    # forward, which would zero training gradients) — strip them so a
    # shared recipe that serves with +quant=int8 still trains full-precision
    if "codec" in config:
        config.codec.pop("quant_decode", None)
        config.codec.pop("quant_encode", None)
    codec = setup_codec(config)
    rng = jax.random.PRNGKey(seed)
    rng, k_init = jax.random.split(rng)
    sample = jnp.zeros((2, image_size, image_size, in_channels))
    params = codec.init(k_init, sample)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(
        {"e": params["encoder"], "d": params["decoder"]}))
    print(f"codec params: {n_params/1e6:.2f}M  latent "
          f"{codec.latent_shape(image_size)}")

    resume = ldcfg(config, "load_checkpoint", None)
    if resume and os.path.exists(str(resume)):
        ck = load_checkpoint(str(resume))
        params = load_into_tree(params, flatten_tree(ck["model_state_dict"]),
                                strict=False)
        print(f"resumed codec from {resume} (epoch {ck['epoch']})")

    # discriminator choice: 'patch' (the variant the reference trains with,
    # metrics.py:220) or 'vqgan_plus' (the full VQGANPlusDiscriminator,
    # vqgan_plus.py:191-229, paired with LeCAM via lecam_weight)
    disc_choice = str(ldcfg(config, "discriminator", "patch"))
    # discriminator + perceptual net follow the codec's compute dtype:
    # params fp32, compute bf16 when codec.bf16 is set (codec-SCOPED, like
    # setup_codec — flow.bf16 must not leak into codec training) — the
    # D-step/G-pullback disc passes are a material share of the GAN step
    # (benchmarks/gan_profile.py)
    net_dtype = (jnp.bfloat16
                 if ("codec" in config
                     and bool(config.codec.get("bf16", False)))
                 else jnp.float32)
    if disc_choice == "vqgan_plus":
        from flocoder_tpu.models.discriminator import VQGANPlusDiscriminator
        disc = VQGANPlusDiscriminator(in_channels=in_channels,
                                      dtype=net_dtype)
    else:
        disc = VQGANPlusPatchDiscriminator(in_channels=in_channels,
                                           dtype=net_dtype)
    rng, k_disc = jax.random.split(rng)
    disc_vars = init_discriminator(disc, k_disc, sample)
    disc_apply_train = make_disc_apply(disc, update_stats=True)
    disc_apply_eval = make_disc_apply(disc, update_stats=False)

    tx_g, tx_d = make_vqgan_optimizers(lr)
    state = create_vqgan_state(params, tx_g, disc_vars, tx_d)

    perceptual_fn = None
    if float(cc.get("lambda_perc", 0)) > 0 and in_channels == 3:
        perceptual_fn = make_perceptual_fn(image_size, dtype=net_dtype)

    # multi-chip: build the steps under shard_map over the mesh — batch
    # sharded over the data axes, grads pmean'd over ICI, RVQ codebook EMA
    # stats psum'd (SURVEY §2d); a 1-device mesh keeps the plain-jit build.
    # `codec.tp > 1` instead reserves a 'model' mesh axis and runs the steps
    # as plain jit with tensor-parallel param placement (GSPMD inserts the
    # collectives; parallel/mesh.py:tp_param_shardings) — for codecs whose
    # activations outgrow one chip's HBM.
    tp = int(ldcfg(config, "tp", 1))
    if tp > 1:
        from flocoder_tpu.parallel.mesh import make_mesh as _mm, shard_state_tp
        mesh = _mm(n_model=tp)
        state = shard_state_tp(mesh, state)
        step_mesh = None
        print(f"tensor-parallel codec training: GSPMD over {mesh.shape}")
    else:
        step_mesh = mesh if mesh.size > 1 else None
    if step_mesh is not None:
        print(f"multi-chip codec training: shard_map over {mesh.shape}")
    # codec.grad_accum=G: microbatch gradient accumulation — effective batch
    # G× beyond activation HBM (training/vqgan.py docstrings)
    grad_accum = max(int(ldcfg(config, "grad_accum", 1)), 1)
    warmup_step = make_vqgan_warmup_step(codec, tx_g, config, perceptual_fn,
                                         mesh=step_mesh,
                                         grad_accum=grad_accum)
    gan_step = make_vqgan_gan_step(codec, tx_g, disc, disc_apply_train,
                                   disc_apply_eval, tx_d, config,
                                   perceptual_fn,
                                   lecam_weight=float(
                                       ldcfg(config, "lecam_weight", 0.0)),
                                   mesh=step_mesh,
                                   grad_accum=grad_accum)
    eval_step = make_vqgan_eval_step(codec, config, perceptual_fn)

    use_wandb = not no_wandb
    if use_wandb:
        wblog.init(project=str(cc.get("project_name", "flocoder-vqgan")),
                   name=ldcfg(config, "run_name", None), config=dict(config))

    cb_tracker = CodebookUsageTracker(
        num_levels=int(cc.get("codebook_levels", 4)),
        codebook_size=int(cc.get("vq_num_embeddings", 96)))
    output_dir = f"output_vqgan_{os.path.basename(data_path)}"
    os.makedirs(output_dir, exist_ok=True)

    # rng_impl=rbg routes the decoder's NoiseInjection / dropout draws
    # through the hardware RngBitGenerator (−15% codec fwd, utils/rng.py)
    key = make_training_key(seed + 1, ldcfg(config, "rng_impl", None))
    for epoch in range(1, epochs + 1):
        gan_phase = epoch > warmup_epochs
        step_fn = gan_step if gan_phase else warmup_step
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
        phase = "GAN" if gan_phase else "warmup"
        print(f"epoch {epoch}/{epochs} [{phase}] " +
              "  ".join(f"{k} {v:.4f}" for k, v in means.items()) +
              f"  {sps:.0f} samples/s")
        if use_wandb:
            wblog.log({f"train/{k}": v for k, v in means.items()}
                      | {"epoch": epoch, "samples_per_sec": sps})

        # ---- validation (reference: train_vqgan.py:274-327) ---------------
        if epoch % 5 == 0 or epoch == 1:
            vb = next(iter(val_loader))
            x = jnp.asarray(vb["target"])
            recon, vlosses, idx = eval_step(state.params, x)
            cb_tracker.update_counts("val",
                                     np.asarray(idx).reshape(-1, idx.shape[-1]))
            vmeans = {k: float(v) for k, v in vlosses.items()}
            print("  val: " + "  ".join(f"{k} {v:.4f}"
                                        for k, v in vmeans.items()))
            if use_wandb:
                wblog.log({f"val/{k}": v for k, v in vmeans.items()}
                          | {"epoch": epoch})
            n_demo = min(10, x.shape[0])
            demo = np.concatenate([np.asarray(x[:n_demo]),
                                   np.asarray(recon[:n_demo])], axis=0)
            save_img_grid(demo, epoch, tag="recon", use_wandb=use_wandb,
                          output_dir=output_dir, ncols=n_demo)
            if is_midi:
                from flocoder_tpu.data.pianoroll import calc_note_metrics
                nm, nm_images = calc_note_metrics(
                    np.asarray(recon), np.asarray(x),
                    keep_gray=in_channels == 1, return_images=True)
                if use_wandb:
                    wblog.log({f"note_metrics/{k}": v for k, v in nm.items()}
                              | {"epoch": epoch})
                # TP/FP/FN diagnostic grids (reference: train_vqgan.py:306-310)
                for k, img in nm_images.items():
                    save_img_grid(img[:n_demo], epoch, tag=f"metric_{k}",
                                  use_wandb=use_wandb, output_dir=output_dir,
                                  ncols=n_demo)

        if epoch % 10 == 0:
            analyze_codebooks(cb_tracker, state.params["vq"], epoch,
                              use_wandb=use_wandb, output_dir=output_dir)
            cb_tracker.reset_all()

        if epoch % int(cc.get("ckpt_every", 50)) == 0 or epoch == epochs:
            path = save_checkpoint(state.params, epoch=epoch,
                                   ckpt_dir="checkpoints", prefix="vqgan_",
                                   config=config, keep=5)
            print(f"  checkpoint -> {path}")
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
    train_vqgan(config)


if __name__ == "__main__":
    main()
