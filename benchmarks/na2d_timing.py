#!/usr/bin/env python3
"""NA2D kernel acceptance (VERDICT r1 item 6): Pallas vs XLA-banded at 16²
and 32², forward and forward+backward, fp32 and bf16.

Acceptance bar (SURVEY §7): the Pallas kernel must beat the banded XLA
formulation at BOTH resolutions for fwd and fwd+bwd, else banded stays the
default and the kernel is demoted.

Timing: chained data dependency — each iteration's input mixes in the
previous output, so the device cannot pipeline independent dispatches and
one final block_until_ready times the true serialized execution
(docs/BENCH_NOTES.md measurement notes).

  python benchmarks/na2d_timing.py
"""
from __future__ import annotations

import time

import numpy as np


def timed_chained(step, x0, warmup=3, iters=50, reps=3):
    """step: x -> x (same shape). Chain through iters; VALUE-fetch barrier
    (block_until_ready can ack early on the axon tunnel) and a sacrificial
    first rep (one-time program load) — docs/BENCH_NOTES.md timing trap."""
    import jax.numpy as jnp
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


def main():
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.ops.neighborhood_attention import na2d_banded
    from flocoder_tpu.ops.pallas.na2d import na2d_pallas

    B, heads, ks = 16, 8, 7
    for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        for H, C in ((16, 512), (32, 256)):
            q = jnp.asarray(np.random.default_rng(0).standard_normal(
                (B, H, H, C)).astype(np.float32)).astype(dt)

            # fwd: out feeds the next call's q/k/v. The q + 1e-3·out mix
            # keeps values bounded across 50 chained calls (identical
            # epsilon-cost for both variants).
            fwd_b = jax.jit(lambda x: q + 1e-3 * na2d_banded(
                x, x, x, ks, heads))
            fwd_p = jax.jit(lambda x: q + 1e-3 * na2d_pallas(
                x, x, x, ks, heads, None))
            tb = timed_chained(fwd_b, q)
            tp = timed_chained(fwd_p, q)
            print(f"[{tag} {H}²x{C}] fwd:      banded {tb * 1e3:7.3f} ms   "
                  f"pallas {tp * 1e3:7.3f} ms   speedup {tb / tp:5.2f}×")

            # fwd+bwd: gradient (same shape as input) feeds the next call
            _gb = jax.grad(lambda x: jnp.sum(
                na2d_banded(x, x, x, ks, heads) ** 2))
            _gp = jax.grad(lambda x: jnp.sum(
                na2d_pallas(x, x, x, ks, heads, None) ** 2))
            gb = jax.jit(lambda x: q + 1e-3 * _gb(x))
            gp = jax.jit(lambda x: q + 1e-3 * _gp(x))
            tb = timed_chained(gb, q, iters=30)
            tp = timed_chained(gp, q, iters=30)
            print(f"[{tag} {H}²x{C}] fwd+bwd:  banded {tb * 1e3:7.3f} ms   "
                  f"pallas {tp * 1e3:7.3f} ms   speedup {tb / tp:5.2f}×")


if __name__ == "__main__":
    main()
