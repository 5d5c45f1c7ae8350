"""Quantify the RNG share of the 128² codec training forward (the GAN step's
dominant cost — benchmarks/gan_profile.py: fwd 213 ms of the 672 ms step).

Training forwards draw big random tensors: NoiseInjection normals at every
decoder scale (~19M values/image → 1.2B at B=64) plus encoder dropout masks.
The default threefry PRNG computes those on the VPU; the 'rbg' impl uses the
hardware RngBitGenerator. This probe times the codec fwd (a) train=True with
threefry keys, (b) train=True with rbg keys, (c) deterministic (no RNG), with
value-fetch barriers (docs/BENCH_NOTES.md timing discipline).

    python -m benchmarks.rng_probe
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from flocoder_tpu.models.codecs import VQVAE

B, S = 64, 128
DTYPE = jnp.bfloat16


def timed(name, fn, *args, reps=3, inner=2):
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


def main():
    codec = VQVAE(in_channels=3, hidden_channels=256, num_downsamples=3,
                  internal_dim=128, vq_embedding_dim=4, codebook_levels=4,
                  vq_num_embeddings=96, dtype=DTYPE)
    params = codec.init(jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)))
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (B, S, S, 3)).astype(np.float32) * 0.5)

    @jax.jit
    def fwd_train(params, x, rng):
        recon, commit, idx, _ = codec.forward(params, x, train=True, rng=rng)
        return recon.astype(jnp.float32).sum()

    @jax.jit
    def fwd_eval(params, x):
        recon, commit, idx, _ = codec.forward(params, x, train=False)
        return recon.astype(jnp.float32).sum()

    timed("codec fwd train=True, threefry", fwd_train, params, x,
          jax.random.PRNGKey(3))
    timed("codec fwd train=True, rbg", fwd_train, params, x,
          jax.random.key(3, impl="rbg"))
    timed("codec fwd deterministic (no RNG)", fwd_eval, params, x)


if __name__ == "__main__":
    main()
