#!/usr/bin/env python3
"""OT-pairing acceptance (VERDICT r2 #4): parallel propose-accept vs the
sequential greedy oracle, standalone and inside the flow train step.

Acceptance bar: OT share of the train step < 5% (from 14% round-2,
docs/ROADMAP.md) with assignment cost within 2% of greedy (cost parity is
asserted in tests/test_ot.py; this script measures time on hardware).

Timing discipline: scan-inside-jit with VALUE-fetch barriers and a
sacrificial first rep (docs/BENCH_NOTES.md axon timing trap).

  python benchmarks/ot_timing.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(body, K=8, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(rng):
        keys = jax.random.split(rng, K)
        _, outs = jax.lax.scan(body, jnp.int32(0), keys)
        return outs

    float(run(jax.random.PRNGKey(0))[-1])
    times = []
    for r in range(reps + 1):
        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(100 + r))[-1])
        times.append((time.perf_counter() - t0) / K)
    times = sorted(times[1:])
    return times[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.ops.ot import (compute_ot_pairing_greedy,
                                     compute_ot_pairing_parallel)

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")

    # ---- standalone pairing, production shapes ----------------------------
    for B, D in ((256, 1024), (1024, 1024), (2048, 1024)):
        src = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B, D)).astype(np.float32))

        def make_body(fn):
            def body(carry, key):
                s = src + jax.random.normal(key, src.shape) * 1e-3
                t = src[::-1] + jax.random.normal(
                    jax.random.fold_in(key, 1), src.shape) * 1e-3
                idx = fn(s, t)
                return idx[0], jnp.sum(idx).astype(jnp.float32)
            return body

        tg = timed_scan(make_body(compute_ot_pairing_greedy))
        tp = timed_scan(make_body(compute_ot_pairing_parallel))
        print(f"B={B:5d} D={D}: greedy {tg*1e3:7.3f} ms   "
              f"parallel {tp*1e3:7.3f} ms   speedup {tg/tp:5.2f}x")

    # ---- inside the flow train step (B=256, K=60, headline config) --------
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    B, H, C, DIM, K = 256, 16, 4, 16, 60
    model = Unet(dim=DIM, dim_mults=(1, 2, 4, 8), channels=C, n_classes=102,
                 dtype=jnp.bfloat16)
    params = {"model": model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, H, H, C)), jnp.zeros((8,)),
        {"class_cond": jnp.zeros((8,), jnp.int32), "mask_cond": None})}
    tx = make_flow_optimizer(1e-4)
    rng = np.random.default_rng(0)
    batch = {"target": jnp.asarray(rng.standard_normal(
        (K, B, H, H, C)).astype(np.float32)),
        "class_cond": jnp.asarray(rng.integers(0, 102, (K, B)).astype(
            np.int32))}
    for label, kwargs in (("no-OT   ", dict(use_ot=False)),
                          ("greedy  ", dict(ot_method="greedy")),
                          ("parallel", dict(ot_method="parallel"))):
        step = make_flow_train_step(
            lambda p, x, t, c: model.apply(p, x, t, c), tx,
            steps_per_call=K, **kwargs)
        state = create_flow_state(params, tx)
        state, aux = step(state, batch, jax.random.PRNGKey(0))
        float(aux["loss"])
        times = []
        for trial in range(4):
            t0 = time.perf_counter()
            for r in range(2):
                state, aux = step(state, batch, jax.random.PRNGKey(10 + r))
            float(aux["loss"])
            times.append((time.perf_counter() - t0) / (2 * K))
        per = sorted(times[1:])[1]
        print(f"train step [{label}]: {per*1e3:6.3f} ms/step "
              f"({B/per:8.0f} samples/s)")


if __name__ == "__main__":
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    main()
