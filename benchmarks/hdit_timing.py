#!/usr/bin/env python3
"""HDiT flow-train-step hardware probe (v5e).

Times the PRODUCTION flow train step with the HDiT velocity field at the
reference branch's exact printed spec (reference train_flow.py:294-299:
levels (2,256,768)/(4,512,1536), global d_head=64, patch 4) on 16×16×4
SD-class latents, B=256 — the same workload as the dim-sweep rows
(benchmarks/flow_dim_sweep.py), so the two tables compare directly. The
claim under test: at small latents a token-matmul transformer reaches far
higher MXU utilization than a conv U-Net of similar size (docs/BENCH_NOTES
"Flow-step MFU vs model width").

Timing discipline: value-fetch barriers + sacrificial first trial
(docs/BENCH_NOTES.md 'timing trap'). One process per run; TPU only.

Usage: python benchmarks/hdit_timing.py [patch_size] [K]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def bench_hdit(patch: int = 4, K: int = 20, B: int = 256,
               trials: int = 4, n_disp: int = 3):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.models.hdit import (HDiT, LevelSpec, MappingSpec,
                                          GlobalAttentionSpec,
                                          NeighborhoodAttentionSpec)
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    from bench import _chip_peak_flops, _chip_peak_hbm, _cost_of

    H, C, n_classes = 16, 4, 102
    # patch 4 → 4×4 tokens (the reference spec); patch 2 → 8×8 tokens with
    # Pallas NA at the outer level (the finer-grid variant the recipe
    # comment suggests)
    outer = (GlobalAttentionSpec(64) if patch == 4
             else NeighborhoodAttentionSpec(64, 7))
    model = HDiT(levels=(LevelSpec(2, 256, 768, outer),
                         LevelSpec(4, 512, 1536, GlobalAttentionSpec(64))),
                 mapping=MappingSpec(2, 256, 768), channels=C,
                 patch_size=patch, n_classes=n_classes,
                 dtype=jnp.bfloat16)
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
    return {
        "arch": "hdit", "patch": patch,
        "params_M": round(n_params / 1e6, 2), "B": B, "K": K,
        "ms_per_step": round(per_step * 1e3, 3),
        "samples_per_sec": round(B / per_step, 1),
        "gflops_per_step": round(flops / 1e9, 2) if flops else None,
        "mfu_pct": (round(flops / per_step / peak_f * 100, 2)
                    if flops else None),
        "hbm_util_pct": (round(nbytes / per_step / peak_b * 100, 1)
                         if nbytes else None),
        "chip": kind,
    }


def main():
    patch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    print(json.dumps(bench_hdit(patch=patch, K=K)), flush=True)


if __name__ == "__main__":
    main()
