#!/usr/bin/env python3
"""Flow-train-step MFU scaling with model width (hardware probe).

The headline flow config (reference BASELINE.md: dim=16 U-Net on 16×16×4
latents, B=256) is a 2.6M-param model — overhead/bandwidth-bound by
construction, so its MFU reads ~0.1% no matter how good the step is
(docs/BENCH_NOTES.md). This sweep widens ONLY the U-Net base width and
re-times the identical production train step (parallel-OT + CFG dropout +
EMA + Adam, K steps per dispatch) to show where the step becomes MXU-bound
and what utilization it reaches — i.e. the framework's flow-training
ceiling is set by model size, not by the step machinery.

Timing discipline: value-fetch barriers + sacrificial first trial
(docs/BENCH_NOTES.md 'timing trap'). One process per run; TPU only.

Usage: python benchmarks/flow_dim_sweep.py [dims...]   (default 16 32 64 128)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def bench_dim(dim: int, B: int = 256, K: int | None = None,
              trials: int = 4, n_disp: int = 3):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    from bench import _chip_peak_flops, _chip_peak_hbm, _cost_of

    H, C, n_classes = 16, 4, 102
    # fewer steps per dispatch at large widths: bounds compile time and the
    # K×B scan-batch HBM footprint while keeping ≥8 steps inside the
    # executable (enough to amortize dispatch)
    if K is None:
        K = 60 if dim <= 32 else (20 if dim <= 64 else 8)
    model = Unet(dim=dim, dim_mults=(1, 2, 4, 8), channels=C,
                 n_classes=n_classes, dtype=jnp.bfloat16)
    mesh = make_mesh()
    params = {"model": model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, H, H, C)), jnp.zeros((8,)),
        {"class_cond": jnp.zeros((8,), jnp.int32), "mask_cond": None})}
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    tx = make_flow_optimizer(1e-4)
    state = create_flow_state(params, tx)
    step = make_flow_train_step(lambda p, x, t, c: model.apply(p, x, t, c),
                                tx, steps_per_call=K)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "target": rng.standard_normal((K, B, H, H, C)).astype(np.float32),
        "class_cond": rng.integers(0, n_classes, (K, B)).astype(np.int32),
    }, axis=1)

    cost = _cost_of(step, state, batch, jax.random.PRNGKey(0))
    flops = float(cost.get("flops", -1.0))
    flops = flops / K if flops > 0 else None
    nbytes = float(cost.get("bytes accessed", -1.0))
    nbytes = nbytes / K if nbytes > 0 else None

    state, aux = step(state, batch, jax.random.PRNGKey(0))   # compile
    float(aux["loss"])
    times = []
    for trial in range(trials):
        t0 = time.perf_counter()
        for r in range(n_disp):
            state, aux = step(state, batch,
                              jax.random.PRNGKey(10 + n_disp * trial + r))
        float(aux["loss"])          # value fetch = true completion barrier
        times.append((time.perf_counter() - t0) / (n_disp * K))
    times = sorted(times[1:]) if len(times) > 1 else times
    per_step = times[len(times) // 2]

    peak_f, kind = _chip_peak_flops()
    peak_b = _chip_peak_hbm()
    row = {
        "dim": dim, "params_M": round(n_params / 1e6, 2), "B": B, "K": K,
        "ms_per_step": round(per_step * 1e3, 3),
        "samples_per_sec": round(B / per_step, 1),
        "gflops_per_step": round(flops / 1e9, 2) if flops else None,
        "mfu_pct": (round(flops / per_step / peak_f * 100, 2)
                    if flops else None),
        "hbm_util_pct": (round(nbytes / per_step / peak_b * 100, 1)
                         if nbytes else None),
        "chip": kind,
    }
    del state, batch, params, step
    return row


def main():
    dims = [int(a) for a in sys.argv[1:]] or [16, 32, 64, 128]
    rows = []
    for dim in dims:
        row = bench_dim(dim)
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
