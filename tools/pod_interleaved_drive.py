#!/usr/bin/env python3
"""Standalone interleaved-pipeline end-to-end drive for the pod recipe
(VERDICT r4 #4 'ideally with pp_schedule=interleaved exercised').

Runs ONLY the supplementary segment of tools/quality_runs.py:run_pod —
configs/tpu_pod_hdit.yaml through train_flow.py on the 8-device CPU mesh
with the depth-4 mid level pipelined as 2 stages × 2 interleaved virtual
chunks (flow.pp_schedule=interleaved needs >1 block per stage, so the
'model' axis is 2 here; the recipe's own 4-stage split has one block per
stage, which the interleaved schedule cannot subdivide) — and patches the
result into the committed eval_out/quality/pod.json under
summary.interleaved_drive, leaving the main-run fields untouched.

Split out because the full 3×-budget main run is a multi-hour job on this
1-core host (≈135 s/epoch measured 2026-08-21) while this segment is
minutes; `python tools/quality_runs.py pod` remains the full harness.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_FLAGS = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _FLAGS:
    _FLAGS += " --xla_force_host_platform_device_count=8"
# 8 virtual devices on 1 core serialize each rank's compute, so the
# 2-stage pipeline's first tick can exceed XLA:CPU's default 40 s
# collective rendezvous terminate timeout (measured: hard abort F...
# rendezvous.cc:127 'only 1 of them arrived on time'); raise both
# timeouts (xla_cpu_collective_call_warn_stuck_seconds does NOT parse in
# this jaxlib — only these two do)
if "xla_cpu_collective" not in _FLAGS:
    _FLAGS += (" --xla_cpu_collective_timeout_seconds=1200"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = _FLAGS.strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from tools.quality_runs import CENTERS, N_CLASSES, OUT, SIGMA  # noqa: E402


def main(epochs: int = 8) -> None:
    from flocoder_tpu.config import load_config, config_from_dict, to_dict
    import train_flow as train_flow_script
    t0 = time.time()
    hh, cc = 16, 4
    tmp = tempfile.mkdtemp(prefix="fc_pod_inter_")
    data = os.path.join(tmp, "toy")
    rng = np.random.default_rng(0)
    for split, n_per in (("train", 256), ("val", 16)):
        for cls in range(N_CLASSES):
            d = os.path.join(f"{data}_encoded_resize", split, f"{cls:04d}")
            os.makedirs(d)
            for i in range(n_per):
                lat = (SIGMA * rng.standard_normal((hh, hh, cc))
                       + CENTERS[cls]).astype(np.float32)
                np.save(os.path.join(d, f"s{i:03d}.npy"), lat)

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    over = to_dict(load_config("tpu_pod_hdit", config_dir=cfg_dir))
    over["data"] = data
    over["image_size"] = hh
    over["no_wandb"] = True
    over["seed"] = 0
    over["codec"] = {"choice": "resize", "image_size": hh,
                     "latent_shape": [cc, hh, hh]}
    over["flow"].update({"batch_size": 64, "epochs": epochs,
                         "no_eval": True, "ckpt_every": 9999,
                         "num_workers": 1, "donate": False, "bf16": False,
                         "learning_rate": 1e-3,
                         "n_model": 2, "hdit_pp_stages": 2,
                         "pp_schedule": "interleaved", "pp_interleave": 2})
    over["flow"]["unet"] = {"n_classes": N_CLASSES}
    state = train_flow_script.train_flow(config_from_dict(over))
    assert int(state.step) == epochs * 8, int(state.step)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

    from flocoder_tpu.models.hdit import hdit_from_config
    from flocoder_tpu.training.flow import make_flow_eval_step
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from tools.quality_runs import _make_batch
    import jax.numpy as jnp
    serve = hdit_from_config(config_from_dict(over), cc, N_CLASSES,
                             jnp.float32)
    eval_step = make_flow_eval_step(
        lambda p, x, t, c: serve.apply(p, x, t, c))
    mesh = make_mesh()
    val = float(eval_step(state.params,
                          shard_batch(mesh, _make_batch(
                              np.random.default_rng(4), b=64, h=hh, c=cc)),
                          jax.random.PRNGKey(6)))
    entry = {"epochs": epochs, "steps": int(state.step),
             "final_eval_loss": round(val, 4),
             "mesh": "data=4 x model=2, pp 2 stages x 2 chunks",
             "wall_s": round(time.time() - t0, 1)}

    path = os.path.join(OUT, "pod.json")
    with open(path) as f:
        doc = json.load(f)
    doc["summary"]["interleaved_drive"] = entry
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"interleaved drive: {json.dumps(entry)}\n  -> {path}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
