#!/usr/bin/env python3
"""Probe: is int8 conv/matmul faster than bf16 through XLA on this TPU?

Motivation: the serving sampler's decode (SD-VAE-class decoder to 128²) is
the compute-heavy half of the e2e path; v5e lists 394 int8 TOPS vs 197
bf16 TFLOPs, so a dynamic-quantized decode could in principle run ~2× the
conv time. XLA must lower int8×int8→int32 conv/dot onto the MXU for that
to materialize — this probe measures whether it does, at decoder-dominant
shapes, before we invest in a quantized-decode path.

Timing uses the bench.py discipline (scan-in-jit + value-fetch barriers,
sacrificial first rep) — see docs/BENCH_NOTES.md 'timing trap'.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, arg, K=8, reps=3):
    @jax.jit
    def run(x):
        def body(c, _):
            c = fn(c)
            return c, jnp.float32(0)
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(c[..., :1].astype(jnp.float32))

    float(run(arg))
    ts = []
    for _ in range(reps + 1):
        t0 = time.perf_counter()
        float(run(arg))
        ts.append((time.perf_counter() - t0) / K)
    return sorted(ts[1:])[(reps - 1) // 2]


def conv_probe(B, H, C_in, C_out, k=3):
    dn = jax.lax.conv_dimension_numbers((B, H, H, C_in), (k, k, C_in, C_out),
                                        ("NHWC", "HWIO", "NHWC"))
    rng = np.random.default_rng(0)
    w_f = rng.standard_normal((k, k, C_in, C_out)).astype(np.float32) * 0.05
    x_bf = jnp.asarray(rng.standard_normal((B, H, H, C_in)), jnp.bfloat16)
    w_bf = jnp.asarray(w_f, jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, (B, H, H, C_in)), jnp.int8)
    w_i8 = jnp.asarray(np.clip(np.round(w_f / 0.05 * 127), -127, 127),
                       jnp.int8)

    def f_bf(x):
        y = jax.lax.conv_general_dilated(x, w_bf, (1, 1), "SAME",
                                         dimension_numbers=dn)
        # keep carry shape: project back to C_in channels
        return y[..., :C_in] * jnp.bfloat16(0.999)

    def f_i8(x):
        y = jax.lax.conv_general_dilated(x, w_i8, (1, 1), "SAME",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
        # dequant + requant round-trip approximating a real quantized net
        yq = jnp.clip((y >> 7), -127, 127).astype(jnp.int8)
        return yq[..., :C_in]

    t_bf = timed(f_bf, x_bf)
    t_i8 = timed(f_i8, x_i8)
    flops = 2 * B * H * H * C_in * C_out * k * k
    print(f"conv {B}x{H}x{H}x{C_in}->{C_out} k{k}: "
          f"bf16 {t_bf*1e3:7.3f} ms ({flops/t_bf/1e12:6.1f} TF/s)  "
          f"int8 {t_i8*1e3:7.3f} ms ({flops/t_i8/1e12:6.1f} TOP/s)  "
          f"speedup {t_bf/t_i8:4.2f}x")


def matmul_probe(M, K_, N):
    rng = np.random.default_rng(0)
    a_bf = jnp.asarray(rng.standard_normal((M, K_)), jnp.bfloat16)
    b_bf = jnp.asarray(rng.standard_normal((K_, N)), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.integers(-127, 127, (M, K_)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 127, (K_, N)), jnp.int8)

    def f_bf(a):
        y = a @ b_bf
        return y[:, :K_] * jnp.bfloat16(0.999)

    def f_i8(a):
        y = jax.lax.dot_general(a, b_i8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)[:, :K_]

    t_bf = timed(f_bf, a_bf)
    t_i8 = timed(f_i8, a_i8)
    flops = 2 * M * K_ * N
    print(f"matmul {M}x{K_}x{N}: bf16 {t_bf*1e3:7.3f} ms "
          f"({flops/t_bf/1e12:6.1f} TF/s)  int8 {t_i8*1e3:7.3f} ms "
          f"({flops/t_i8/1e12:6.1f} TOP/s)  speedup {t_bf/t_i8:4.2f}x")


def decode_share_probe():
    """Decode-only time at the serving config (B=64, 16²×4 → 128²) to
    quantify the decoder's share of the e2e sampler step."""
    from flocoder_tpu.models.sd_vae import SDVAE
    sd = SDVAE(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 128, 128, 3), jnp.bfloat16)
    params = sd.init(jax.random.PRNGKey(0), x)
    z = jnp.zeros((64, 16, 16, 4), jnp.bfloat16)

    def dec(z):
        img = sd.decode(params, z)
        return z + jnp.mean(img).astype(z.dtype)

    t = timed(dec, z, K=4)
    print(f"SD-VAE-class decode B=64 16²→128² bf16: {t*1e3:.1f} ms "
          f"({64/t:.0f} samples/s)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    matmul_probe(4096, 4096, 4096)
    matmul_probe(16384, 512, 512)
    conv_probe(64, 128, 128, 128)
    conv_probe(64, 64, 256, 256)
    conv_probe(64, 32, 512, 512)
    decode_share_probe()
