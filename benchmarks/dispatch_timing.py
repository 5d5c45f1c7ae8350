#!/usr/bin/env python3
"""Host-dispatch amortization: steps_per_call=1 vs K on the real chip.

Measures the full host loop — micro-batch stacking, device transfer, and
dispatch — not just the jitted step, since the host loop is what the
multi-step scan exists to amortize (docs/BENCH_NOTES.md tpu_demo notes:
the 1-core host capped e2e training at 3.5-4.7k samples/s while the step
itself ran at 60k+).

  python benchmarks/dispatch_timing.py
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    B, H, C, DIM, n_classes = 256, 16, 4, 16, 102
    mesh = make_mesh()
    model = Unet(dim=DIM, dim_mults=(1, 2, 4, 8), channels=C,
                 n_classes=n_classes, dtype=jnp.bfloat16)
    params = {"model": model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, H, H, C)), jnp.zeros((8,)),
        {"class_cond": jnp.zeros((8,), jnp.int32), "mask_cond": None})}
    tx = make_flow_optimizer(1e-4)
    apply_fn = lambda p, x, t, c: model.apply(p, x, t, c)

    # a pool of host-side micro-batches, as a Loader would yield them
    rng = np.random.default_rng(0)
    pool = [{"target": rng.standard_normal((B, H, H, C)).astype(np.float32),
             "class_cond": rng.integers(0, n_classes, B).astype(np.int32)}
            for _ in range(16)]

    for K in (1, 4, 8, 16):
        step = make_flow_train_step(apply_fn, tx, donate=False,
                                    steps_per_call=K)
        state = create_flow_state(params, tx)
        key = jax.random.PRNGKey(1)

        def dispatch_once(i, state, key):
            chunk = [pool[(i * K + j) % len(pool)] for j in range(K)]
            if K == 1:
                hb = chunk[0]
                axis = 0
            else:
                hb = {k: np.stack([c[k] for c in chunk])
                      for k in chunk[0]}
                axis = 1
            key, k = jax.random.split(key)
            state, aux = step(state, shard_batch(mesh, hb, axis=axis), k)
            return state, key, aux

        # compile + warm
        for i in range(2):
            state, key, aux = dispatch_once(i, state, key)
        float(aux["loss"])
        # trial 0 sacrificial (one-time program load); value-fetch barriers
        # (docs/BENCH_NOTES.md round-2 timing trap)
        times = []
        for trial in range(4):
            n_disp = max(32 // K, 4)
            t0 = time.perf_counter()
            for i in range(n_disp):
                state, key, aux = dispatch_once(i + trial * n_disp, state,
                                                key)
            float(aux["loss"])
            times.append((time.perf_counter() - t0) / (n_disp * K))
        times = sorted(times[1:])
        t_step = times[len(times) // 2]
        print(f"K={K:2d}: {t_step * 1e3:7.2f} ms/step "
              f"({B / t_step:8.0f} samples/s incl. host loop)")


if __name__ == "__main__":
    main()
