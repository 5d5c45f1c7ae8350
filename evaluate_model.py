#!/usr/bin/env python3
"""Evaluate a trained flow checkpoint: sample, decode, compute the metric
bundle (FID / Sinkhorn / MSE / moments) against pre-encoded val latents.

The reference ships an EMPTY evaluate_model.py (0 bytes; its real evaluation
lives inside sampling.py:233) — this makes the named entry point real.

Usage:
    ./evaluate_model.py --config-name tpu_demo \
        +flow_checkpoint=checkpoints/flowema_40.npz [+n_samples=256]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from flocoder_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from flocoder_tpu.config import parse_cli, ldcfg
    from flocoder_tpu.data.datasets import PreEncodedDataset, Loader
    from flocoder_tpu.evaluation import evaluate_model
    from generate_samples import load_models_once

    config = parse_cli(default_config=None,
                       config_dir=os.path.join(os.path.dirname(
                           os.path.abspath(__file__)), "configs"))
    flow_ckpt = str(config.get("flow_checkpoint", ""))
    if not flow_ckpt:
        from flocoder_tpu.training.checkpoint import latest_checkpoint
        flow_ckpt = (latest_checkpoint("checkpoints", "flowema_") or
                     latest_checkpoint("checkpoints", "flow_") or "")
    if not os.path.exists(flow_ckpt):
        raise SystemExit(f"checkpoint not found: {flow_ckpt!r}")
    b = load_models_once(config, flow_ckpt)

    data_path = os.path.expanduser(str(config.data))
    if "encoded" not in data_path:
        data_path = f"{data_path}_encoded_{config.codec.choice}"
    n_samples = int(config.get("n_samples", 256))

    val_dir = os.path.join(data_path, "val")
    shard = os.path.join(val_dir, "data.fcshard")
    if os.path.exists(shard):
        from flocoder_tpu.data.shard import ShardDataset
        ds = ShardDataset(shard)
    else:
        ds = PreEncodedDataset(val_dir)
    loader = Loader(ds, batch_size=min(n_samples, len(ds)), shuffle=True,
                    num_workers=2, seed=0)
    vb = next(iter(loader))

    from flocoder_tpu.parallel.mesh import make_mesh

    model, params = b["model"], b["params"]
    metrics = evaluate_model(
        lambda p, x, t, c: model.apply(p, x, t, c),
        mesh=make_mesh(),  # degenerate meshes are treated as single-device
        params=params["model"],  # → fused generate+decode executable
        codec=b["codec"], codec_params=b["codec_params"], epoch=0,
        target_latents=jnp.asarray(vb["target"]),
        rng=jax.random.PRNGKey(int(config.get("seed", 0))),
        cond={"class_cond": jnp.asarray(vb["class_cond"]), "mask_cond": None},
        batch_size=min(n_samples, vb["target"].shape[0]),
        n_classes=b["n_classes"],
        method=str(config.get("method", "rk4")),
        n_steps=int(config.get("n_steps", ldcfg(config, "n_steps", 100))),
        cfg_strength=float(config.get("cfg_strength",
                                      ldcfg(config, "cfg_strength", 3.0))),
        # dual-time (MeanFlow) checkpoints serve with unscaled time
        # (load_models_once resolves this off the embedded config)
        t_scale=float(b["t_scale"]),
        use_wandb=False, output_dir=str(config.get("output_dir", "eval_out")))
    for k, v in sorted(metrics.items()):
        # FID_feature_backend is a string stamp, not a number
        print(f"{k:>20s}: {v:.5f}" if isinstance(v, float)
              else f"{k:>20s}: {v}")


if __name__ == "__main__":
    main()
