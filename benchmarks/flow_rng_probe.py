#!/usr/bin/env python3
"""Flow-train-step RNG probe: threefry vs hardware RngBitGenerator (rbg).

The GAN step gained 16% from ``rng_impl=rbg`` (configs/tpu_vqgan.yaml) by
moving its in-step noise/dropout draws onto the hardware generator. The
flow step draws 2× (B,H,W,C) normals + 2 uniforms per micro-step (noise +
CFG-resample noise, training/flow.py:187,253) — at the headline config
(B=256, K=60) that is ~31M threefry elements per dispatch. This probe
times the FULL production train step (make_flow_train_step, bf16, parallel
OT) under both key impls to decide whether the tpu recipes' ``rng_impl:
rbg`` should also be the flow-bench tuned row.

Timing discipline: K-step scanned executable + value-fetch barrier +
sacrificial trial (docs/BENCH_NOTES.md axon timing trap).

  python benchmarks/flow_rng_probe.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(impl: str | None, B=256, K=60, trials=4, n_disp=3):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    H, C, DIM, n_classes = 16, 4, 16, 102
    model = Unet(dim=DIM, dim_mults=(1, 2, 4, 8), channels=C,
                 n_classes=n_classes, dtype=jnp.bfloat16)
    mesh = make_mesh()
    params = {"model": model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, H, H, C)), jnp.zeros((8,)),
        {"class_cond": jnp.zeros((8,), jnp.int32), "mask_cond": None})}
    tx = make_flow_optimizer(1e-4)
    state = create_flow_state(params, tx)
    step = make_flow_train_step(lambda p, x, t, c: model.apply(p, x, t, c),
                                tx, steps_per_call=K)
    mk = ((lambda s: jax.random.key(s, impl=impl)) if impl
          else jax.random.PRNGKey)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "target": rng.standard_normal((K, B, H, H, C)).astype(np.float32),
        "class_cond": rng.integers(0, n_classes, (K, B)).astype(np.int32),
    }, axis=1)
    state, aux = step(state, batch, mk(0))   # compile
    float(aux["loss"])
    times = []
    for trial in range(trials):
        t0 = time.perf_counter()
        for r in range(n_disp):
            state, aux = step(state, batch, mk(10 + n_disp * trial + r))
        float(aux["loss"])
        times.append((time.perf_counter() - t0) / (n_disp * K))
    times = sorted(times[1:]) if len(times) > 1 else times
    per_step = times[len(times) // 2]
    return per_step, B / per_step


def main():
    import jax
    print(f"device: {jax.devices()[0].device_kind}")
    for impl in (None, "rbg"):
        per_step, sps = run(impl)
        name = impl or "threefry"
        print(f"  flow step bf16 B=256 K=60  rng={name:9s}: "
              f"{per_step * 1e3:7.3f} ms/step  {sps:9.0f} samples/s")


if __name__ == "__main__":
    main()
