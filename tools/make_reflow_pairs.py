#!/usr/bin/env python3
"""Generate a paired (noise, sample) dataset from a trained flow checkpoint
for a rectified-flow "reflow" distillation pass (Liu et al. 2022) — a
capability the reference lists as future work (reference README.md:147
"Add reflow procedure to straighten flows").

Usage:
    python tools/make_reflow_pairs.py --config-name flowers_sd.yaml \
        +flow_checkpoint=checkpoints/flowema_100.npz \
        +out_dir=data_reflow_pairs +n_pairs=50000 [+val_frac=0.05] \
        [+method=rk4] [+n_steps=50] [+cfg_strength=3.0]

Writes ``out_dir/{train,val}/<class>/*.npz`` items
{'target_latents': generated latent, 'source_latents': the exact noise it
was integrated from} — the same on-disk contract as the inpainting triplet
pre-encode (preencode_data.py), so ``PreEncodedDataset`` serves them
unchanged. Retrain on them with:

    ./train_flow.py --config-name <recipe> data=<out_dir> +reflow=true

after which 1-4 step Euler sampling approaches the teacher's many-step
quality (the couplings are near-straight lines by construction).

Class-conditional models get uniform random labels per pair; the label is
stored via the class subdirectory (PreEncodedDataset's label convention).
Sampling runs on whatever devices are visible; pairs are generated in
latent space only (no decode — reflow trains in latent space).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_reflow_pairs(config):
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import ldcfg
    from flocoder_tpu.sampling import generate_latents
    from generate_samples import load_models_once

    flow_ckpt = str(config.get("flow_checkpoint", "") or
                    ldcfg(config, "flow_checkpoint", ""))
    if not flow_ckpt:
        from flocoder_tpu.training.checkpoint import latest_checkpoint
        flow_ckpt = (latest_checkpoint("checkpoints", "flowema_") or
                     latest_checkpoint("checkpoints", "flow_") or "")
    if not flow_ckpt or not os.path.exists(flow_ckpt):
        raise SystemExit(f"flow checkpoint not found: {flow_ckpt!r} "
                         "(pass +flow_checkpoint=...)")
    b = load_models_once(config, flow_ckpt)
    model, params = b["model"], b["params"]
    H, W, C = b["latent_shape"]
    n_classes = b["n_classes"]

    n_pairs = int(config.get("n_pairs", 10000))
    val_frac = float(config.get("val_frac", 0.05))
    batch_size = int(config.get("batch_size",
                                ldcfg(config, "batch_size", 256)))
    n_steps = int(config.get("n_steps", ldcfg(config, "n_steps", 50)))
    method = str(config.get("method", "rk4"))
    cfg_strength = float(config.get("cfg_strength",
                                    ldcfg(config, "cfg_strength", 3.0)))
    out_dir = os.path.expanduser(str(config.get("out_dir",
                                                "data_reflow_pairs")))
    if os.path.exists(out_dir) and os.listdir(out_dir):
        # same refuse-overwrite stance as the pre-encode pass
        # (reference preencode_data.py:69-71)
        raise SystemExit(f"{out_dir} exists and is not empty — refusing to "
                         "overwrite")

    apply_p = lambda p, x, t, c: model.apply(p, x, t, c)

    @jax.jit
    def sample_batch(p, noise, labels):
        cond = (None if n_classes == 0
                else {"class_cond": labels, "mask_cond": None})
        latents, _nfe = generate_latents(
            lambda x, t, c: apply_p(p, x, t, c),
            (batch_size, H, W, C), jax.random.PRNGKey(0), method=method,
            n_steps=n_steps, cond=cond, cfg_strength=cfg_strength,
            source=noise)
        return latents

    rng = np.random.default_rng(int(config.get("seed", 0)))
    key = jax.random.PRNGKey(int(config.get("seed", 0)))
    n_val = int(n_pairs * val_frac)
    written = {"train": 0, "val": 0}
    batch_idx = 0
    import time
    t0 = time.time()
    while written["train"] + written["val"] < n_pairs:
        key, k_noise = jax.random.split(key)
        noise = jax.random.normal(k_noise, (batch_size, H, W, C))
        labels = jnp.asarray(rng.integers(0, max(n_classes, 1),
                                          size=batch_size, dtype=np.int32))
        latents = np.asarray(sample_batch(params["model"], noise, labels))
        noise_np = np.asarray(noise)
        labels_np = np.asarray(labels)
        for i in range(batch_size):
            total = written["train"] + written["val"]
            if total >= n_pairs:
                break
            split = "val" if written["val"] < n_val and total % max(
                int(1 / max(val_frac, 1e-9)), 1) == 0 else "train"
            sub = f"{labels_np[i]:04d}" if n_classes > 0 else "data"
            d = os.path.join(out_dir, split, sub)
            os.makedirs(d, exist_ok=True)
            np.savez(os.path.join(d, f"b{batch_idx:06d}_{i:03d}"),
                     target_latents=latents[i].astype(np.float32),
                     source_latents=noise_np[i].astype(np.float32))
            written[split] += 1
        batch_idx += 1
        done = written["train"] + written["val"]
        if batch_idx % 10 == 0 or done >= n_pairs:
            rate = done / max(time.time() - t0, 1e-9)
            print(f"  {done}/{n_pairs} pairs ({rate:.0f}/s)")
    print(f"wrote {written['train']} train + {written['val']} val pairs "
          f"to {out_dir}/ — retrain with "
          f"data={out_dir} +reflow=true")
    return out_dir


def main():
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from flocoder_tpu.config import parse_cli
    config = parse_cli(default_config=None,
                       config_dir=os.path.join(
                           os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))), "configs"))
    make_reflow_pairs(config)


if __name__ == "__main__":
    main()
