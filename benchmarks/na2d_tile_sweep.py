#!/usr/bin/env python3
"""NA2D tile_h sweep (docs/ROADMAP.md nice-to-have): time the Pallas kernel
at the production codec shapes (16² and 32², B=16, 8 heads, k=7) for every
row-band height that divides H, fwd and fwd+bwd, bf16 and fp32.

The kernel picks tile_h via ``_pick_tile_h`` (first of 8,4,2,1 dividing H);
this sweep monkeypatches that choice to map the landscape and prints the
winner per shape so the heuristic can be updated if it's wrong.

Timing discipline: chained data dependency + value-fetch barrier +
sacrificial first rep (docs/BENCH_NOTES.md axon timing trap).

  python benchmarks/na2d_tile_sweep.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_chained(step, x0, warmup=3, iters=30, reps=3):
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
    import flocoder_tpu.ops.pallas.na2d as na2d_mod

    B, heads, ks = 16, 8, 7
    print(f"device: {jax.devices()[0].device_kind}")
    results = {}
    for H, C in ((16, 256), (32, 128)):
        for dtype in (jnp.bfloat16, jnp.float32):
            dn = dtype.__name__
            key = jax.random.PRNGKey(0)
            x0 = jax.random.normal(key, (B, H, H, C), dtype)

            candidates = [t for t in (1, 2, 4, 8, 16, 32) if H % t == 0
                          and t <= H]
            for tile in candidates:
                na2d_mod._pick_tile_h = lambda _H, _t=tile: _t

                @jax.jit
                def fwd_step(x, _t=tile):
                    o = na2d_mod.na2d_pallas(x, x, x, ks, heads)
                    return x + 0.01 * o.astype(x.dtype)

                @jax.jit
                def fwdbwd_step(x, _t=tile):
                    def loss(q):
                        o = na2d_mod.na2d_pallas(q, q, q, ks, heads)
                        return jnp.sum(o.astype(jnp.float32) ** 2)
                    g = jax.grad(loss)(x)
                    return x + (0.01 * g).astype(x.dtype)

                try:
                    tf = timed_chained(fwd_step, x0) * 1e6
                    tb = timed_chained(fwdbwd_step, x0) * 1e6
                except Exception as e:  # noqa: BLE001 — sweep survives compile fails
                    print(f"  {H}² {dn} tile_h={tile}: FAILED ({e})")
                    continue
                results[(H, dn, tile)] = (tf, tb)
                print(f"  {H}² {dn} tile_h={tile:2d}: fwd {tf:8.1f} µs   "
                      f"fwd+bwd {tb:8.1f} µs")
            best_f = min((v[0], t) for (h, d, t), v in results.items()
                         if h == H and d == dn)
            best_b = min((v[1], t) for (h, d, t), v in results.items()
                         if h == H and d == dn)
            print(f"  --> {H}² {dn}: best fwd tile_h={best_f[1]} "
                  f"({best_f[0]:.1f} µs), best fwd+bwd tile_h={best_b[1]} "
                  f"({best_b[0]:.1f} µs)")


if __name__ == "__main__":
    main()
