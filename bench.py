#!/usr/bin/env python3
"""Benchmark: flow-matching training throughput on the reference's headline
configuration (BASELINE.md: SD latents 4×16×16, batch 256, U-Net dim=16 →
≈1.0–1.1k samples/s on the reference's Colab GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 1050.0  # reference Colab GPU (BASELINE.md row 2)


def main():
    # The axon TPU tunnel intermittently fails large executables with an
    # opaque InvalidArgument after heavy use and recovers after idle time
    # (docs/BENCH_NOTES.md) — retry a few times before giving up.
    last_err = None
    for attempt in range(3):
        try:
            return _run()
        except Exception as e:  # noqa: BLE001
            last_err = e
            print(f"bench attempt {attempt + 1} failed: {e}", file=sys.stderr)
            time.sleep(180)
    print(json.dumps({"metric": "flow_train_throughput", "value": 0.0,
                      "unit": "samples/sec/chip", "vs_baseline": 0.0,
                      "error": str(last_err)[:200]}))


def _run():
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    B, H, C, DIM = 256, 16, 4, 16
    n_classes = 102
    model = Unet(dim=DIM, dim_mults=(1, 2, 4, 8), channels=C,
                 n_classes=n_classes)
    mesh = make_mesh()
    params = {"model": model.init(
        jax.random.PRNGKey(0), jnp.zeros((8, H, H, C)), jnp.zeros((8,)),
        {"class_cond": jnp.zeros((8,), jnp.int32), "mask_cond": None})}
    tx = make_flow_optimizer(1e-4)
    state = create_flow_state(params, tx)
    step = make_flow_train_step(lambda p, x, t, c: model.apply(p, x, t, c), tx)

    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "target": rng.standard_normal((B, H, H, C)).astype(np.float32),
        "class_cond": rng.integers(0, n_classes, B).astype(np.int32),
    })

    # warmup / compile
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    jax.block_until_ready(aux)

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        state, aux = step(state, batch, k)
    jax.block_until_ready(aux)
    dt = time.perf_counter() - t0

    samples_per_sec = B * n_steps / dt
    print(json.dumps({
        "metric": "flow_train_throughput",
        "value": round(samples_per_sec, 1),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
