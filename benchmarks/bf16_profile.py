#!/usr/bin/env python3
"""bf16 pathology investigation (VERDICT r1 item 4 / docs/ROADMAP.md).

Round-1 measured the VQGAN codec warmup step at 185 ms in bf16 vs 5.3 ms in
fp32 (35×). This script isolates WHERE bf16 leaves the fast path by timing
each suspect sub-module in both dtypes on the real chip:

  python benchmarks/bf16_profile.py            # all sections
  python benchmarks/bf16_profile.py unet codec # chosen sections

Per-call block_until_ready timing (axon queue semantics under-report
pipelined dispatch)."""
from __future__ import annotations

import sys
import time

import numpy as np


def _fetch(x):
    """True completion barrier: fetch a derived VALUE to the host.
    block_until_ready can acknowledge early on the axon tunnel
    (docs/BENCH_NOTES.md round-2 timing trap)."""
    import jax, jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.mean(leaf))


def timed_chained(step, x0, warmup=2, iters=10, reps=3):
    """Chained-dependency timer (step: x -> x, same structure) with
    value-fetch barriers; the first timed rep is sacrificial (it absorbs
    the one-time program-load the warmup fetch does not force)."""
    x = x0
    for _ in range(warmup):
        x = step(x)
    _fetch(x)
    times = []
    for _ in range(reps + 1):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        _fetch(x)
        times.append((time.perf_counter() - t0) / iters)
    times = sorted(times[1:])
    return times[len(times) // 2]


def report(name, t32, t16):
    print(f"{name:40s} fp32 {t32 * 1e3:8.2f} ms   bf16 {t16 * 1e3:8.2f} ms "
          f"  ratio {t16 / t32:6.2f}×")


def sec_unet():
    import jax, jax.numpy as jnp
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    B, H, C = 256, 16, 4
    for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        model = Unet(dim=16, dim_mults=(1, 2, 4, 8), channels=C,
                     n_classes=102, dtype=dtype)
        params = {"model": model.init(
            jax.random.PRNGKey(0), jnp.zeros((8, H, H, C)), jnp.zeros((8,)),
            {"class_cond": jnp.zeros((8,), jnp.int32), "mask_cond": None})}
        tx = make_flow_optimizer(1e-4)
        state = create_flow_state(params, tx)
        step = make_flow_train_step(
            lambda p, x, t, c: model.apply(p, x, t, c), tx, donate=False)
        batch = {"target": jnp.asarray(np.random.randn(B, H, H, C),
                                       jnp.float32),
                 "class_cond": jnp.zeros((B,), jnp.int32)}
        def chain(carry):
            s, k = carry
            k, sub = jax.random.split(k)
            s, _ = step(s, batch, sub)
            return (s, k)
        t = timed_chained(chain, (state, jax.random.PRNGKey(1)), iters=20)
        print(f"unet train step [{tag}]: {t * 1e3:.2f} ms "
              f"({B / t:.0f} samples/s)")


def _codec(dtype, use_attention=True, decoder_nonlocal=True):
    from flocoder_tpu.models.codecs import VQVAE
    return VQVAE(in_channels=3, hidden_channels=64, num_downsamples=3,
                 internal_dim=256, vq_embedding_dim=4, codebook_levels=3,
                 vq_num_embeddings=512, dtype=dtype,
                 use_attention=use_attention,
                 decoder_nonlocal=decoder_nonlocal)


def sec_codec():
    """Codec fwd+bwd (the round-1 35× case), then ablations: no NA blocks,
    no decoder nonlocal RoPE attention."""
    import jax, jax.numpy as jnp
    x = jnp.asarray(np.random.randn(16, 128, 128, 3), jnp.float32)

    for variant, kw in (("full", {}),
                        ("no_natten", {"use_attention": False}),
                        ("no_nonlocal", {"decoder_nonlocal": False}),
                        ("convs_only", {"use_attention": False,
                                        "decoder_nonlocal": False})):
        ts = {}
        for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
            codec = _codec(dtype, **kw)
            params = codec.init(jax.random.PRNGKey(0), x[:2])

            def loss_fn(p, xb, rng):
                recon, commit, _, _ = codec.forward(p, xb, train=True,
                                                    rng=rng)
                return jnp.mean((recon - xb) ** 2) + commit.mean()

            # RVQ state carries a bool `initted` flag → allow_int so grad
            # skips it (its cotangent is float0, never materialized)
            g = jax.jit(jax.grad(lambda p, xb, rng: loss_fn(p, xb, rng),
                                 allow_int=True))

            def chain(xb):
                grads = g(params, xb, jax.random.PRNGKey(1))
                leaf = jax.tree_util.tree_leaves(grads)[0]
                # eager scalar dep: next input waits on this step's grads
                return x + leaf.ravel()[0] * 0.0
            ts[tag] = timed_chained(chain, x, iters=5)
        report(f"codec fwd+bwd 128² [{variant}]", ts["fp32"], ts["bf16"])


def sec_ops():
    """Isolated suspects: pixel shuffle/unshuffle, RoPE attention, NA2D."""
    import jax, jax.numpy as jnp
    from flocoder_tpu.models.unet import pixel_shuffle, pixel_unshuffle
    from flocoder_tpu.models.codecs import SpatialNonLocalAttention
    from flocoder_tpu.ops.neighborhood_attention import na2d_banded
    from flocoder_tpu.ops.pallas.na2d import na2d_pallas

    for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x = jnp.asarray(np.random.randn(16, 32, 32, 256), jnp.float32).astype(dt)
        # shuffle→unshuffle round trip chains itself (same shape)
        f = jax.jit(lambda x: pixel_unshuffle(pixel_shuffle(x, 2), 2))
        t_ps = timed_chained(f, x, iters=20)
        print(f"pixel_shuffle+unshuffle 32²x256 [{tag}]: {t_ps * 1e3:.3f} ms")

    for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        lat = jnp.asarray(np.random.randn(16, 16, 16, 4), jnp.float32).astype(dt)
        m = SpatialNonLocalAttention(dtype=dt)
        p = m.init(jax.random.PRNGKey(0), lat)
        f = jax.jit(lambda x: lat + 1e-3 * m.apply(p, x))
        print(f"RoPE nonlocal attn 16²x4 [{tag}]: "
              f"{timed_chained(f, lat, iters=20) * 1e3:.3f} ms")

    for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        q0 = jnp.asarray(np.random.randn(16, 32, 32, 256), jnp.float32).astype(dt)
        fb = jax.jit(lambda q: q0 + 1e-3 * na2d_banded(q, q, q, 7, 8))
        fp = jax.jit(lambda q: q0 + 1e-3 * na2d_pallas(q, q, q, 7, 8, None))
        print(f"na2d 32²x256 [{tag}]: "
              f"banded {timed_chained(fb, q0, iters=20) * 1e3:.3f} ms   "
              f"pallas {timed_chained(fp, q0, iters=20) * 1e3:.3f} ms")


def sec_width():
    """Width sweep: U-Net forward-only at dim ∈ {16, 32, 64, 128} — where
    does bf16 start winning? (BENCH_NOTES hypothesis: cast overhead dominates
    tiny convs; MXU bf16 should dominate at larger widths.)"""
    import jax, jax.numpy as jnp
    from flocoder_tpu.models.unet import Unet
    B, H, C = 256, 16, 4
    for dim in (16, 32, 64, 128):
        ts = {}
        for dtype, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
            model = Unet(dim=dim, dim_mults=(1, 2, 4, 8), channels=C,
                         n_classes=102, dtype=dtype)
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((8, H, H, C)),
                jnp.zeros((8,)), {"class_cond": jnp.zeros((8,), jnp.int32),
                                  "mask_cond": None})
            x0 = jnp.asarray(np.random.randn(B, H, H, C), jnp.float32)
            t = jnp.full((B,), 500.0)
            cls = jnp.zeros((B,), jnp.int32)
            f = jax.jit(lambda p, x, t, c: model.apply(
                p, x, t, {"class_cond": c, "mask_cond": None}))
            ts[tag] = timed_chained(
                lambda x: x0 + 1e-3 * f(params, x, t, cls), x0, iters=20)
        report(f"unet fwd dim={dim}", ts["fp32"], ts["bf16"])


SECTIONS = {"unet": sec_unet, "codec": sec_codec, "ops": sec_ops,
            "width": sec_width}

if __name__ == "__main__":
    which = sys.argv[1:] or list(SECTIONS)
    for name in which:
        print(f"=== {name} ===")
        SECTIONS[name]()
