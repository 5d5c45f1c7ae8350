#!/usr/bin/env python3
"""On-hardware validation of the Pallas fused compression-tail + RVQ kernel
(docs/ROADMAP.md pending item): numerics vs the unfused XLA chain on the
real chip, then chained-dependency throughput of both paths.

  python benchmarks/fused_vq_check.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.models.codecs import VQVAE

    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    B = 64
    vq = VQVAE(in_channels=3, hidden_channels=64, num_downsamples=3,
               internal_dim=256, vq_embedding_dim=4, codebook_levels=3,
               vq_num_embeddings=512)
    px = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, 128, 128, 3)).astype(np.float32))
    params = vq.init(jax.random.PRNGKey(0), px[:8])

    fused = jax.jit(lambda p, x: vq.encode_quantize_fused(p, x))
    unfused = jax.jit(lambda p, x: vq.quantize(p, vq.encode(p, x),
                                               train=False))

    zf = fused(params, px)
    zu = unfused(params, px)
    zf, zu = jax.block_until_ready((zf, zu))
    idx_f, idx_u = np.asarray(zf[1]), np.asarray(zu[1])
    idx_match = (idx_f == idx_u).mean()
    # Exact correctness is proven by benchmarks/fused_probe.py stage 2
    # (shared-h picks: 100% agreement, zero distance gap vs an fp64
    # oracle). Against the DEFAULT-precision XLA path the encoder body
    # carries bf16-mixed conv noise that flips ~1-3% of near-tie picks —
    # XLA default-vs-highest drifts by the same amount (probe stage 5),
    # so ≥95% here just confirms both paths compute the same function.
    print(f"on-chip fused-vs-unfused index agreement = "
          f"{idx_match * 100:.2f}% (baseline XLA precision drift ~97%)")
    assert idx_match > 0.95, f"RVQ index disagreement: {idx_match}"

    def timed_chained(step, x0, warmup=3, iters=30, reps=3):
        # value-fetch barrier + sacrificial first rep (block_until_ready
        # acks early on this tunnel — docs/BENCH_NOTES.md timing trap)
        x = x0
        for _ in range(warmup):
            x = step(x)
        float(jnp.mean(x))
        times = []
        for _ in range(reps + 1):
            x = x0
            t0 = time.perf_counter()
            for _ in range(iters):
                x = step(x)
            float(jnp.mean(x))
            times.append((time.perf_counter() - t0) / iters)
        times = sorted(times[1:])
        return times[len(times) // 2]

    # chain: decode path isn't under test; mix the quantized latent back
    # into the pixels so iterations are data-dependent
    up = 2 ** 3
    def mk_step(f):
        def step(x):
            zq = f(params, x)[0]
            bump = jnp.repeat(jnp.repeat(zq[..., :3], up, 1), up, 2)
            return px + 1e-3 * bump
        return jax.jit(step)

    tf = timed_chained(mk_step(fused), px)
    tu = timed_chained(mk_step(unfused), px)
    print(f"encode+quantize 128²: fused {tf * 1e3:7.3f} ms "
          f"({B / tf:.0f} samples/s)   unfused {tu * 1e3:7.3f} ms "
          f"({B / tu:.0f} samples/s)   speedup {tu / tf:5.2f}×")


if __name__ == "__main__":
    main()
