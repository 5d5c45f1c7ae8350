"""MeanFlow verification drive: train a dual-time (average-velocity) U-Net
with flow.meanflow semantics on synthetic two-cluster latents, then prove
GENUINE 1-NFE class-conditional generation lands on the cluster centers
(the reference's README.md:158 "Mean Flows" research TODO, arXiv:2505.13447).

Run: python tests/e2e/drive_meanflow.py  (~6-10 min on this 1-core box)
"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
sys.path.insert(0, "/root/repo")

import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import numpy as np

print("== 1. dual-time U-Net + meanflow train step on an 8-device mesh ==")
from flocoder_tpu.models.unet import Unet
from flocoder_tpu.training.flow import (create_flow_state, make_flow_optimizer,
                                        make_flow_train_step)
from flocoder_tpu.parallel.mesh import make_mesh, shard_batch

mesh = make_mesh()
C, H = 2, 8
model = Unet(dim=H, dim_mults=(1, 2), channels=C, n_classes=4, dual_time=True)
x0 = jnp.zeros((8, H, H, C)); t0 = jnp.zeros((8,))
params = {"model": model.init(jax.random.PRNGKey(0), x0, t0,
                              {"class_cond": jnp.zeros((8,), jnp.int32),
                               "mask_cond": None})}
print(f"   params: {sum(p.size for p in jax.tree.leaves(params))/1e3:.1f}k")

tx = make_flow_optimizer(3e-3)
state = create_flow_state(params, tx)
apply_fn = lambda p, x, t, cond: model.apply(p, x, t, cond)
# cfg_dropout=0: bake the class conditioning fully into the field so 1-NFE
# serving needs no guidance pass (the MeanFlow paper's serving setup)
# t_scale=1: MeanFlow models keep time unscaled (train_flow.py) — the jvp
# identity target explodes through sin(999·ω·r) embeddings otherwise
train_step = make_flow_train_step(apply_fn, tx, mesh=mesh, cfg_dropout=0.0,
                                  meanflow=True, meanflow_ratio=0.5,
                                  t_scale=1.0)

print("== 2. train on synthetic two-cluster latents ==")
rng = np.random.default_rng(0)
def make_batch(b=64):
    cls = rng.integers(0, 2, size=b)
    centers = np.where(cls[:, None, None, None] == 0, -1.5, 1.5)
    lat = centers + 0.1 * rng.standard_normal((b, H, H, C))
    return {"target": lat.astype(np.float32),
            "class_cond": cls.astype(np.int32)}

key = jax.random.PRNGKey(1)
losses = []
for step in range(200):
    key, k = jax.random.split(key)
    state, aux = train_step(state, shard_batch(mesh, make_batch()), k)
    losses.append(float(aux["loss"]))
print(f"   loss step0={losses[0]:.3f}  final={losses[-1]:.3f}")
assert losses[-1] < losses[0] * 0.5, "meanflow loss did not drop"

print("== 3. ONE-STEP (1-NFE) generation: x1 = x0 + u(x0, 0, 1) ==")
from flocoder_tpu.sampling import generate_latents
cond = {"class_cond": jnp.array([0]*16 + [1]*16), "mask_cond": None}
samp_apply = lambda x, t, c: model.apply(state.params["model"], x, t, c)
lat1, nfe1 = jax.jit(lambda r: generate_latents(
    samp_apply, (32, H, H, C), r, method="meanflow", n_steps=1,
    cond=cond, cfg_strength=0.0, t_scale=1.0))(jax.random.PRNGKey(3))
m0 = float(lat1[:16].mean()); m1 = float(lat1[16:].mean())
print(f"   nfe={int(nfe1)}  class0 mean={m0:.2f} (want ≈-1.5)  "
      f"class1 mean={m1:.2f} (want ≈+1.5)")
assert int(nfe1) == 1, "meanflow n_steps=1 must be exactly 1 segment"
assert m0 < -0.9 and m1 > 0.9, "1-NFE samples not class-separated"

print("== 4. 4-segment meanflow refines toward the same targets ==")
lat4, nfe4 = jax.jit(lambda r: generate_latents(
    samp_apply, (32, H, H, C), r, method="meanflow", n_steps=4,
    cond=cond, cfg_strength=0.0, t_scale=1.0))(jax.random.PRNGKey(3))
m0b = float(lat4[:16].mean()); m1b = float(lat4[16:].mean())
print(f"   nfe={int(nfe4)}  class0 mean={m0b:.2f}  class1 mean={m1b:.2f}")
assert m0b < -0.9 and m1b > 0.9

print("== 5. Δ=0 compatibility: the dual-time field serves as v on the ==")
print("==    standard RK4 path (u(x,t,t) = instantaneous velocity)     ==")
latr, nfer = jax.jit(lambda r: generate_latents(
    samp_apply, (32, H, H, C), r, method="rk4", n_steps=25,
    cond=cond, cfg_strength=0.0, t_scale=1.0))(jax.random.PRNGKey(3))
m0r = float(latr[:16].mean()); m1r = float(latr[16:].mean())
print(f"   rk4 nfe={int(nfer)}  class0 mean={m0r:.2f}  class1 mean={m1r:.2f}")
assert m0r < -0.9 and m1r > 0.9, "dual-time model broke the standard path"

print("\nALL MEANFLOW VERIFICATION STEPS PASSED")
