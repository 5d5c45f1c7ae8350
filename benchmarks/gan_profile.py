"""Decompose the 128² VQGAN GAN step's 700 ms (bench.py `_bench_vqgan_gan_step`
config) into its constituent costs so optimization effort lands where the time
is: codec fwd+bwd, discriminator forwards/backwards, VGG perceptual, optimizer
folds. Timing uses the value-fetch barrier discipline (docs/BENCH_NOTES.md
"axon timing trap"). Run on TPU:

    python benchmarks/gan_profile.py
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flocoder_tpu.config import config_from_dict  # noqa: E402
from flocoder_tpu.models.codecs import VQVAE
from flocoder_tpu.models.discriminator import (
    VQGANPlusPatchDiscriminator, init_discriminator, make_disc_apply)
from flocoder_tpu.models.perceptual import make_perceptual_fn
from flocoder_tpu.metrics import (compute_vqgan_losses, get_total_vqgan_loss,
                                  hinge_d_loss, perceptual_loss)
from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                         make_vqgan_optimizers,
                                         make_vqgan_gan_step)

B, S = 64, 128
DTYPE = jnp.bfloat16


def timed(name, fn, *args, reps=3, inner=2):
    """Every benched fn must return a SCALAR — the only reliable completion
    barrier on the axon tunnel is a value fetch (docs/BENCH_NOTES.md 'the
    axon timing trap'; block_until_ready under-reports wildly there)."""
    out = fn(*args)
    float(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        float(out)
        times.append((time.perf_counter() - t0) / inner)
    ms = sorted(times)[len(times) // 2] * 1e3
    print(f"{name:55s} {ms:8.2f} ms")
    return ms


def _tree_scalar(tree):
    return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
               for x in jax.tree_util.tree_leaves(tree)
               if jnp.issubdtype(x.dtype, jnp.floating))


def main():
    cfg = config_from_dict({"codec": {
        "choice": "vqgan", "in_channels": 3, "hidden_channels": 256,
        "num_downsamples": 3, "internal_dim": 128, "vq_embedding_dim": 4,
        "codebook_levels": 4, "vq_num_embeddings": 96,
        "commitment_weight": 0.5, "image_size": S,
        "lambda_gen": 0.05, "lambda_l1": 0.2, "lambda_mse": 0.5,
        "lambda_perc": 1.0e-3, "lambda_spec": 5.0e-4, "lambda_vq": 0.25,
    }})
    codec = VQVAE(in_channels=3, hidden_channels=256, num_downsamples=3,
                  internal_dim=128, vq_embedding_dim=4, codebook_levels=4,
                  vq_num_embeddings=96, dtype=DTYPE)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, S, S, 3))
    params = codec.init(rng, sample)
    disc = VQGANPlusPatchDiscriminator(in_channels=3, dtype=DTYPE)
    disc_vars = init_discriminator(disc, jax.random.PRNGKey(1), sample)
    perc = make_perceptual_fn(S, dtype=DTYPE)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, S, S, 3)).astype(np.float32) * 0.5)
    key = jax.random.PRNGKey(3)

    # Steady-state VQ: codec.init leaves vq.initted=False, and every
    # train-mode quantize on an un-initted state runs the k-means init
    # branch — real training does that exactly once. Advance the state so
    # every probe below measures the post-init path.
    lat_hw0 = S // (2 ** 3)
    z0 = jnp.asarray(np.random.default_rng(4).standard_normal(
        (B, lat_hw0, lat_hw0, 4)).astype(np.float32))
    _, _, _, vq_initted = codec.quantize(params, z0, train=True, rng=key)
    params = {**params, "vq": vq_initted}
    del z0

    disc_train = make_disc_apply(disc, update_stats=True)
    disc_eval = make_disc_apply(disc, update_stats=False)

    # 1. codec forward only
    @jax.jit
    def codec_fwd(params, x, rng):
        recon, commit, idx, new_vq = codec.forward(params, x, train=True,
                                                   rng=rng)
        return recon.sum()
    timed("codec fwd", codec_fwd, params, x, key)

    # 2. codec fwd+bwd (mse-only loss; grads wrt encoder+decoder, the RVQ
    # state updates via EMA not the optimizer — mirrors training/vqgan.py)
    @jax.jit
    def codec_fwdbwd(params, x, rng):
        def loss(gp):
            recon, commit, idx, _ = codec.forward(
                {**gp, "vq": params["vq"]}, x, train=True, rng=rng)
            return jnp.mean((recon - x) ** 2) + commit
        return _tree_scalar(jax.grad(loss)({"encoder": params["encoder"],
                                            "decoder": params["decoder"]}))
    timed("codec fwd+bwd (mse only)", codec_fwdbwd, params, x, key)

    # 3. disc forward (eval, no stats)
    @jax.jit
    def disc_fwd(dv, x):
        logits, feats = disc_eval(dv, x)
        return logits.sum()
    timed("disc fwd (eval)", disc_fwd, disc_vars, x)

    # 4. D step core: 2 train forwards + bwd wrt disc params
    @jax.jit
    def d_fwdbwd(dv, real, fake):
        def d_loss_fn(d_params):
            v = {**dv, "params": d_params}
            (rp, rf), nv = disc_train(v, real)
            (fp, _), nv = disc_train(nv | {"params": d_params}, fake)
            return hinge_d_loss(rp, fp)
        return _tree_scalar(jax.grad(d_loss_fn)(dv["params"]))
    timed("D step fwd+bwd (2 forwards, grads wrt D)", d_fwdbwd,
          disc_vars, x, x)

    # 5. VGG perceptual fwd (recon+target) + bwd wrt recon
    @jax.jit
    def perc_fwdbwd(recon, target):
        return _tree_scalar(jax.grad(
            lambda r: perceptual_loss(perc, r, target))(recon))
    timed("VGG perceptual fwd+bwd (wrt recon)", perc_fwdbwd, x, x)

    # 6. disc fwd+bwd wrt input (G adversarial pullback, fake branch)
    @jax.jit
    def disc_input_grad(dv, x):
        def g(xx):
            logits, feats = disc_eval(dv, xx)
            return -logits.mean() + sum(f.mean() for f in feats)
        return _tree_scalar(jax.grad(g)(x))
    timed("disc fwd+bwd wrt input (G pullback)", disc_input_grad,
          disc_vars, x)

    # 6b. spectral loss fwd+bwd wrt recon (fp32 complex fft2 at 128² — the
    # one loss term that can't ride the MXU)
    from flocoder_tpu.metrics import spectral_loss

    @jax.jit
    def spec_fwdbwd(recon, target):
        return _tree_scalar(jax.grad(
            lambda r: spectral_loss(target, r))(recon))
    timed("spectral loss fwd+bwd (wrt recon)", spec_fwdbwd, x, x)

    # 6c. RVQ quantize with train=True (EMA stats + dead-code reseed)
    lat_hw = S // (2 ** 3)
    z_lat = jnp.asarray(np.random.default_rng(5).standard_normal(
        (B, lat_hw, lat_hw, 4)).astype(np.float32))

    @jax.jit
    def rvq_train(params, z, rng):
        z_q, idx, loss, new_vq = codec.quantize(params, z, train=True,
                                                rng=rng)
        return loss + _tree_scalar(new_vq.codebooks)
    timed("RVQ quantize train=True (EMA+reseed)", rvq_train, params,
          z_lat, key)

    # 7. full GAN step (the bench headline)
    tx_g, tx_d = make_vqgan_optimizers(1e-4)
    state = create_vqgan_state(params, tx_g, disc_vars, tx_d)
    step = make_vqgan_gan_step(codec, tx_g, disc, disc_train, disc_eval,
                               tx_d, cfg, perc)

    # 7a. optimizer folds alone (adamw G + D update/apply on frozen grads)
    g_train = {"encoder": params["encoder"], "decoder": params["decoder"]}
    fake_g_grads = jax.tree_util.tree_map(jnp.ones_like, g_train)
    opt_g0 = tx_g.init(g_train)

    @jax.jit
    def opt_fold(gp, grads, opt):
        upd, opt = tx_g.update(grads, opt, gp)
        return _tree_scalar(jax.tree_util.tree_map(jnp.add, gp, upd))
    timed("optimizer fold (G adamw update+apply)", opt_fold, g_train,
          fake_g_grads, opt_g0)
    # free the probe buffers — the full step barely fits HBM at 128² B=64
    # (an extra Adam state + grads-sized tree here OOMs it)
    del g_train, fake_g_grads, opt_g0, z_lat
    jax.clear_caches()  # drop the probe executables' device allocations too

    def run_step(state, x, key):
        new_state, aux, _ = step(state, x, key)
        return new_state, aux

    state, aux = run_step(state, x, key)
    float(aux["total"])
    times = []
    for r in range(4):
        t0 = time.perf_counter()
        state, aux = run_step(state, x, jax.random.PRNGKey(10 + r))
        state, aux = run_step(state, x, jax.random.PRNGKey(20 + r))
        float(aux["total"])
        times.append((time.perf_counter() - t0) / 2)
    ms = sorted(times[1:])[1] * 1e3
    print(f"{'FULL GAN step (bench headline)':55s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
