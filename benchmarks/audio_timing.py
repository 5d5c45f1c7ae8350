#!/usr/bin/env python3
"""DAC audio-codec train-step hardware probe (v5e).

Times the PRODUCTION audio train step (training/audio.py: codec forward +
multi-scale mel/STFT losses + Adam + RVQ EMA fold) at the audio_dac.yaml
recipe config: 16 kHz, crop_len=32768 (2.05 s), strides 2/4/4/4 (hop 128 →
256 latent frames), base_channels=32, 4-level RVQ. The 1-D dilated conv
stacks are a different MXU shape than the image codecs' 2-D convs — this
probe records where the audio family sits on the same MFU/HBM axes as the
GAN-step and flow-step rows (docs/BENCH_NOTES.md).

Timing discipline: value-fetch barriers + sacrificial first trial
(docs/BENCH_NOTES.md 'timing trap'). One process per run; TPU only.

Usage: python benchmarks/audio_timing.py [batch] [dtype: fp32|bf16]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def bench_audio(B: int = 16, dtype_name: str = "fp32",
                trials: int = 4, n_disp: int = 3):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.models.audio_codec import DACCodec
    from flocoder_tpu.training.audio import (make_audio_optimizer,
                                             make_audio_train_step)
    from flocoder_tpu.training.vqgan import create_vqgan_state
    from bench import _chip_peak_flops, _chip_peak_hbm, _cost_of

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    crop_len, sr = 32768, 16000
    codec = DACCodec(sample_rate=sr, strides=(2, 4, 4, 4),
                     base_channels=32, vq_embedding_dim=8,
                     codebook_levels=4, vq_num_embeddings=512, dtype=dtype)
    config = {"codec": {"sample_rate": sr,
                        "fft_sizes": [512, 1024, 2048],
                        "n_mels": [40, 80, 160]}}
    rng = np.random.default_rng(0)
    sample = rng.standard_normal((2, crop_len, 1)).astype(np.float32) * 0.1
    params = codec.init(jax.random.PRNGKey(0), jnp.asarray(sample))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(
                       {k: v for k, v in params.items() if k != "vq"}))
    tx = make_audio_optimizer(1e-4)
    state = create_vqgan_state(params, tx)
    step = make_audio_train_step(codec, tx, config)

    batch = jnp.asarray(
        rng.standard_normal((B, crop_len, 1)).astype(np.float32) * 0.1)

    cost = _cost_of(step, state, batch, jax.random.PRNGKey(0))
    flops = float(cost.get("flops", -1.0)) or None
    nbytes = float(cost.get("bytes accessed", -1.0)) or None

    state, aux, _ = step(state, batch, jax.random.PRNGKey(0))   # compile
    float(aux["total"])
    times = []
    for trial in range(trials):
        t0 = time.perf_counter()
        for r in range(n_disp):
            state, aux, _ = step(state, batch,
                                 jax.random.PRNGKey(10 + n_disp * trial + r))
        float(aux["total"])         # value fetch = true completion barrier
        times.append((time.perf_counter() - t0) / n_disp)
    times = sorted(times[1:]) if len(times) > 1 else times
    per_step = times[len(times) // 2]

    peak_f, kind = _chip_peak_flops()
    peak_b = _chip_peak_hbm()
    audio_sec_per_sec = B * crop_len / sr / per_step
    return {
        "arch": "dac", "dtype": dtype_name, "B": B, "crop_len": crop_len,
        "params_M": round(n_params / 1e6, 2),
        "ms_per_step": round(per_step * 1e3, 2),
        "samples_per_sec": round(B / per_step, 1),
        "audio_sec_per_sec": round(audio_sec_per_sec, 1),
        "gflops_per_step": (round(flops / 1e9, 2)
                            if flops and flops > 0 else None),
        "mfu_pct": (round(flops / per_step / peak_f * 100, 2)
                    if flops and flops > 0 else None),
        "hbm_util_pct": (round(nbytes / per_step / peak_b * 100, 1)
                         if nbytes and nbytes > 0 else None),
        "chip": kind,
    }


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    dtype = sys.argv[2] if len(sys.argv) > 2 else "fp32"
    print(json.dumps(bench_audio(B=B, dtype_name=dtype)), flush=True)


if __name__ == "__main__":
    main()
