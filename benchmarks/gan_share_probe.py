"""Time the full 128² VQGAN GAN step with codec.share_real_features on/off.

One variant per process — holding both step executables live OOMs the v5e
chip's HBM at this config (B=64, hidden=256). Run on TPU:

    python benchmarks/gan_share_probe.py off
    python benchmarks/gan_share_probe.py on

Timing uses the value-fetch barrier discipline (docs/BENCH_NOTES.md
"the axon timing trap").
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from flocoder_tpu.config import config_from_dict
from flocoder_tpu.models.codecs import VQVAE
from flocoder_tpu.models.discriminator import (
    VQGANPlusPatchDiscriminator, init_discriminator, make_disc_apply)
from flocoder_tpu.models.perceptual import make_perceptual_fn
from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                         make_vqgan_optimizers,
                                         make_vqgan_gan_step)

B, S = 64, 128
DTYPE = jnp.bfloat16


def main():
    share = len(sys.argv) > 1 and sys.argv[1] == "on"
    cfg = config_from_dict({"codec": {
        "choice": "vqgan", "in_channels": 3, "hidden_channels": 256,
        "num_downsamples": 3, "internal_dim": 128, "vq_embedding_dim": 4,
        "codebook_levels": 4, "vq_num_embeddings": 96,
        "commitment_weight": 0.5, "image_size": S,
        "lambda_gen": 0.05, "lambda_l1": 0.2, "lambda_mse": 0.5,
        "lambda_perc": 1.0e-3, "lambda_spec": 5.0e-4, "lambda_vq": 0.25,
        "share_real_features": share,
    }})
    codec = VQVAE(in_channels=3, hidden_channels=256, num_downsamples=3,
                  internal_dim=128, vq_embedding_dim=4, codebook_levels=4,
                  vq_num_embeddings=96, dtype=DTYPE)
    sample = jnp.zeros((2, S, S, 3))
    params = codec.init(jax.random.PRNGKey(0), sample)
    disc = VQGANPlusPatchDiscriminator(in_channels=3, dtype=DTYPE)
    disc_vars = init_discriminator(disc, jax.random.PRNGKey(1), sample)
    perc = make_perceptual_fn(S, dtype=DTYPE)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, S, S, 3)).astype(np.float32) * 0.5)

    tx_g, tx_d = make_vqgan_optimizers(1e-4)
    state = create_vqgan_state(params, tx_g, disc_vars, tx_d)
    step = make_vqgan_gan_step(
        codec, tx_g, disc, make_disc_apply(disc, update_stats=True),
        make_disc_apply(disc, update_stats=False), tx_d, cfg, perc)

    state, aux, _ = step(state, x, jax.random.PRNGKey(9))
    float(aux["total"])  # compile + barrier
    times = []
    for r in range(5):
        t0 = time.perf_counter()
        state, aux, _ = step(state, x, jax.random.PRNGKey(10 + r))
        state, aux, _ = step(state, x, jax.random.PRNGKey(20 + r))
        float(aux["total"])
        times.append((time.perf_counter() - t0) / 2)
    ms = sorted(times[1:])[1] * 1e3
    print(f"share_real_features={share}: {ms:8.2f} ms/step "
          f"({B / ms * 1e3:6.1f} samples/s)  total={float(aux['total']):.4f}")


if __name__ == "__main__":
    main()
