"""Verification drive: use flocoder_tpu as a user would, end to end."""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, "/root/repo")

import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np

print("== 1. config composition + CLI overrides ==")
from flocoder_tpu import load_config, ldcfg, parse_cli
cfg = parse_cli(["--config-name", "flowers_sd", "flow.batch_size=64",
                 "flow.learning_rate=0.003", "+tag=hello", "~codec.checkpoint"],
                config_dir="/root/repo/configs")
assert cfg.flow.batch_size == 64, cfg.flow.batch_size
assert cfg.flow.unet.n_classes == 102
assert cfg.tag == "hello"
assert "checkpoint" not in cfg.codec
assert ldcfg(cfg, "learning_rate") == 0.003
assert ldcfg(cfg, "n_classes") == 102          # found via flow.unet
assert ldcfg(cfg, "missing_key", 42) == 42
print("   config OK:", dict(batch=cfg.flow.batch_size, lr=ldcfg(cfg, 'learning_rate'),
                            n_classes=ldcfg(cfg, 'n_classes')))

print("== 2. build U-Net + flow train state on an 8-device mesh ==")
from flocoder_tpu.models.unet import Unet
from flocoder_tpu.training.flow import (create_flow_state, make_flow_optimizer,
                                        make_flow_train_step, make_flow_eval_step)
from flocoder_tpu.training.schedules import cosine_warm_restarts_decay
from flocoder_tpu.parallel.mesh import make_mesh, shard_batch

mesh = make_mesh()
print("   mesh:", mesh)

C, H = 2, 8
model = Unet(dim=H, dim_mults=(1, 2), channels=C, n_classes=4)
x0 = jnp.zeros((8, H, H, C)); t0 = jnp.zeros((8,))
params = {"model": model.init(jax.random.PRNGKey(0), x0, t0,
                              {"class_cond": jnp.zeros((8,), jnp.int32), "mask_cond": None})}
n_params = sum(p.size for p in jax.tree.leaves(params))
print(f"   params: {n_params/1e3:.1f}k")

sched = cosine_warm_restarts_decay(3e-3, T_0=50, T_mult=2, decay=0.6, steps_per_epoch=10)
tx = make_flow_optimizer(sched)
state = create_flow_state(params, tx)
apply_fn = lambda p, x, t, cond: model.apply(p, x, t, cond)
train_step = make_flow_train_step(apply_fn, tx)

print("== 3. train on synthetic two-cluster latents (sharded batch) ==")
rng = np.random.default_rng(0)
def make_batch(b=64):
    cls = rng.integers(0, 2, size=b)
    centers = np.where(cls[:, None, None, None] == 0, -1.5, 1.5)
    lat = centers + 0.1 * rng.standard_normal((b, H, H, C))
    return {"target": lat.astype(np.float32),
            "class_cond": cls.astype(np.int32)}

key = jax.random.PRNGKey(1)
losses = []
# 300 steps: the round-3 grads_fn refactor changed the flow-step key
# stream (docs/ROADMAP.md changelog note), and this fixed-seed drive at 150
# steps landed with class-1 under-separated (mean 0.17 < the 0.5 gate);
# 300 steps gives the separation check margin under any key stream.
for step in range(300):
    key, k = jax.random.split(key)
    batch = shard_batch(mesh, make_batch())
    state, aux = train_step(state, batch, k)
    losses.append(float(aux["loss"]))
print(f"   loss step0={losses[0]:.3f}  final={losses[-1]:.3f}")
assert losses[-1] < losses[0] * 0.5, "loss did not drop"

print("== 4. eval step on EMA params ==")
eval_step = make_flow_eval_step(apply_fn)
val = float(eval_step(state.ema, shard_batch(mesh, make_batch()), jax.random.PRNGKey(9)))
print(f"   val loss (EMA) = {val:.3f}")

print("== 5. RK4 sampling with CFG ==")
from flocoder_tpu.sampling import generate_latents
cond = {"class_cond": jnp.array([0]*16 + [1]*16), "mask_cond": None}
samp_apply = lambda x, t, c: model.apply(state.params["model"], x, t, c)
lat, nfe = jax.jit(lambda rng: generate_latents(
    samp_apply, (32, H, H, C), rng, method="rk4", n_steps=25,
    cond=cond, cfg_strength=2.0))(jax.random.PRNGKey(3))
m0 = float(lat[:16].mean()); m1 = float(lat[16:].mean())
print(f"   nfe={int(nfe)}  class0 mean={m0:.2f} (want ≈-1.5)  class1 mean={m1:.2f} (want ≈+1.5)")
assert m0 < -0.5 and m1 > 0.5, "samples not class-separated"

print("== 6. rk45 adaptive sampler on same model ==")
lat45, nfe45 = generate_latents(samp_apply, (8, H, H, C), jax.random.PRNGKey(4),
                                method="rk45", cond=None, cfg_strength=0.0)
print(f"   rk45 nfe={int(nfe45)}, mean={float(lat45.mean()):.2f}")

print("== 6b. AB4 multistep sampler (CFG) matches RK4's class separation ==")
lat_ab, nfe_ab = jax.jit(lambda rng: generate_latents(
    samp_apply, (32, H, H, C), rng, method="ab4", n_steps=25,
    cond=cond, cfg_strength=2.0))(jax.random.PRNGKey(3))
m0ab = float(lat_ab[:16].mean()); m1ab = float(lat_ab[16:].mean())
print(f"   ab4 nfe={int(nfe_ab)} (rk4 was {int(nfe)})  "
      f"class0 mean={m0ab:.2f}  class1 mean={m1ab:.2f}")
assert m0ab < -0.5 and m1ab > 0.5, "ab4 samples not class-separated"
assert abs(m0ab - m0) < 0.2 and abs(m1ab - m1) < 0.2, \
    "ab4 diverged from rk4 on the same trained field"
assert int(nfe_ab) < int(nfe) // 2, "ab4 NFE saving missing"

print("== 7. checkpoint save/load roundtrip ==")
from flocoder_tpu.training.checkpoint import save_checkpoint, load_checkpoint, load_into_tree, latest_checkpoint
import tempfile
d = tempfile.mkdtemp()
path = save_checkpoint(state.params, epoch=3, ckpt_dir=d, prefix="flow_",
                       ema=state.ema, config=cfg)
ck = load_checkpoint(path)
assert ck["epoch"] == 3
assert ck["config"].flow.batch_size == 64
restored = load_into_tree(state.params, ck["model_state_dict"] and
                          __import__("flocoder_tpu.training.checkpoint", fromlist=["flatten_tree"]).flatten_tree(state.params) and
                          {k: v for k, v in __import__("flocoder_tpu.training.checkpoint", fromlist=["flatten_tree"]).flatten_tree(state.params).items()})
# simpler: restore from the saved flat dict
from flocoder_tpu.training.checkpoint import flatten_tree
flat_saved = {k: v for k, v in flatten_tree(ck["model_state_dict"]).items()}
restored = load_into_tree(state.params, flat_saved)
diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in
           zip(jax.tree.leaves(restored), jax.tree.leaves(state.params)))
print(f"   roundtrip max|Δ| = {diff:.2e}  (rotation kept {len(os.listdir(d))} file(s))")
assert diff == 0.0

print("\nALL VERIFICATION STEPS PASSED")
