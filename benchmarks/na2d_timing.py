#!/usr/bin/env python3
"""NA2D kernel acceptance (VERDICT r1 item 6): Pallas vs XLA-banded at 16²
and 32², forward and forward+backward, with a tile_h sweep.

Acceptance bar (SURVEY §7): the Pallas kernel must beat the banded XLA
formulation at BOTH resolutions for fwd and fwd+bwd, else banded stays the
default and the kernel is demoted.

  python benchmarks/na2d_timing.py
"""
from __future__ import annotations

import time

import numpy as np


def timed(fn, *args, warmup=2, iters=20):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.ops.neighborhood_attention import na2d_banded
    from flocoder_tpu.ops.pallas.na2d import na2d_pallas

    B, heads, ks = 16, 8, 7
    for H, C in ((16, 512), (32, 256)):
        q = jnp.asarray(np.random.default_rng(0).standard_normal(
            (B, H, H, C)).astype(np.float32))

        fwd_b = jax.jit(lambda q: na2d_banded(q, q, q, ks, heads))
        fwd_p = jax.jit(lambda q: na2d_pallas(q, q, q, ks, heads, None))
        tb, tp = timed(fwd_b, q), timed(fwd_p, q)
        print(f"[{H}²x{C}] fwd:      banded {tb * 1e3:7.3f} ms   "
              f"pallas {tp * 1e3:7.3f} ms   speedup {tb / tp:5.2f}×")

        gb = jax.jit(jax.grad(lambda q: jnp.sum(
            na2d_banded(q, q, q, ks, heads) ** 2)))
        gp = jax.jit(jax.grad(lambda q: jnp.sum(
            na2d_pallas(q, q, q, ks, heads, None) ** 2)))
        tb, tp = timed(gb, q), timed(gp, q)
        print(f"[{H}²x{C}] fwd+bwd:  banded {tb * 1e3:7.3f} ms   "
              f"pallas {tp * 1e3:7.3f} ms   speedup {tb / tp:5.2f}×")


if __name__ == "__main__":
    main()
