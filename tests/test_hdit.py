"""HDiT (Hourglass DiT) velocity-field tests: shapes, zero-init, CFG null
token, dual-time collapse, RoPE/NA specs, config builder, and training
integration through the production flow step.

The reference's HDiT branch is a live ImportError (reference
train_flow.py:292-300 imports flocoder.hdit which the package doesn't
ship); these tests cover the real model family built in its place
(flocoder_tpu/models/hdit.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.models.hdit import (HDiT, LevelSpec, MappingSpec,
                                      GlobalAttentionSpec,
                                      NeighborhoodAttentionSpec,
                                      hdit_from_config)


def _tiny(n_classes=0, dual_time=False, na_outer=True):
    """Two-level hourglass sized for CPU tests: 8×8×2 latents, patch 2 →
    4×4 tokens outer (NA k=3), 2×2 inner (global)."""
    outer_attn = (NeighborhoodAttentionSpec(d_head=8, kernel_size=3)
                  if na_outer else GlobalAttentionSpec(d_head=8))
    return HDiT(levels=(LevelSpec(1, 16, 32, outer_attn),
                        LevelSpec(1, 32, 64, GlobalAttentionSpec(d_head=8))),
                mapping=MappingSpec(depth=1, width=32, d_ff=64),
                channels=2, patch_size=2, n_classes=n_classes,
                dual_time=dual_time)


def _init(model, B=2, H=8, n_classes=0):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, H, H, 2)).astype(np.float32))
    t = jnp.full((B,), 0.4)
    cond = {"class_cond": (jnp.zeros((B,), jnp.int32) if n_classes else None),
            "mask_cond": None}
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    return params, x, t, cond


def test_shape_and_zero_at_init():
    model = _tiny()
    params, x, t, cond = _init(model)
    out = model.apply(params, x, t, cond)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32
    # zero-init output projection → the zero velocity field at init
    assert float(jnp.abs(out).max()) == 0.0


def _randomize(params, scale=0.3):
    """Kick every zero-init projection so the forward is non-degenerate."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rngs = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + scale * jax.random.normal(r, l.shape, l.dtype)
              for l, r in zip(leaves, rngs)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_null_class_token_matches_uncond():
    model = _tiny(n_classes=5)
    params, x, t, _ = _init(model, n_classes=5)
    params = _randomize(params)
    null = model.apply(params, x, t, {"class_cond": -jnp.ones((2,), jnp.int32),
                                      "mask_cond": None})
    cls0 = model.apply(params, x, t, {"class_cond": jnp.zeros((2,), jnp.int32),
                                      "mask_cond": None})
    # ids < 0 contribute exactly zero class embedding (batched CFG
    # convention shared with models/unet.py)
    assert float(jnp.abs(null - cls0).max()) > 1e-6
    mixed = model.apply(
        params, x, t,
        {"class_cond": jnp.asarray([-1, 0], jnp.int32), "mask_cond": None})
    np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(null[0]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mixed[1]), np.asarray(cls0[1]),
                               rtol=1e-5, atol=1e-6)


def test_dual_time_horizon_collapse():
    """u(x, t, t) (Δ=0) must equal the no-horizon call — dual-time models
    drop into standard-FM code paths unchanged (MeanFlow convention)."""
    model = _tiny(dual_time=True)
    params, x, t, cond = _init(model)
    params = _randomize(params)
    no_h = model.apply(params, x, t, cond)
    same_h = model.apply(params, x, t, dict(cond, time_horizon=t))
    np.testing.assert_allclose(np.asarray(no_h), np.asarray(same_h),
                               rtol=1e-5, atol=1e-6)
    far_h = model.apply(params, x, t, dict(cond, time_horizon=t + 0.5))
    assert float(jnp.abs(far_h - no_h).max()) > 1e-6


def test_mask_cond_rejected():
    model = _tiny()
    params, x, t, cond = _init(model)
    with pytest.raises(ValueError, match="mask"):
        model.apply(params, x, t, {"class_cond": None,
                                   "mask_cond": jnp.ones((2, 8, 8, 1))})


def test_gradients_flow_everywhere():
    model = _tiny(n_classes=3)
    params, x, t, _ = _init(model, n_classes=3)
    # at init the zero final projection blocks upstream grads (standard
    # adaLN-zero behavior, one step breaks the tie); test the trained regime
    params = _randomize(params)
    cond = {"class_cond": jnp.asarray([0, 2], jnp.int32), "mask_cond": None}

    def loss(p):
        v = model.apply(p, x, t, cond)
        return jnp.mean((v - 1.0) ** 2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    # zero-init projections still RECEIVE gradients (their inputs are
    # nonzero), so the fraction of exactly-zero grads must be small
    nz = [float(jnp.abs(l).max()) > 0 for l in flat]
    assert np.mean(nz) > 0.7, f"too many dead grads: {np.mean(nz):.2f}"


def test_na_and_global_specs_agree_when_window_covers_grid():
    """NA with kernel ≥ grid is global attention (clamped windows): the two
    specs must produce identical outputs from identical params (the param
    trees are structurally equal — spec type doesn't change params)."""
    na = _tiny(na_outer=True)    # k=3 < 4×4 grid → truly local
    params, x, t, cond = _init(na)
    params = _randomize(params)
    na_big = HDiT(levels=(LevelSpec(1, 16, 32,
                                    NeighborhoodAttentionSpec(8, 7)),
                          LevelSpec(1, 32, 64, GlobalAttentionSpec(8))),
                  mapping=MappingSpec(depth=1, width=32, d_ff=64),
                  channels=2, patch_size=2)
    glob = _tiny(na_outer=False)
    out_local = na.apply(params, x, t, cond)
    out_nabig = na_big.apply(params, x, t, cond)   # k=7 clamps to 4×4=all
    out_glob = glob.apply(params, x, t, cond)
    np.testing.assert_allclose(np.asarray(out_nabig), np.asarray(out_glob),
                               rtol=2e-4, atol=2e-5)
    assert float(jnp.abs(out_local - out_glob).max()) > 1e-6


def test_hdit_from_config_builds_reference_spec():
    from flocoder_tpu.config import config_from_dict
    cfg = config_from_dict({"flow": {}})
    m = hdit_from_config(cfg, channels=4, n_classes=102, dtype=jnp.float32)
    # the reference branch's printed spec (train_flow.py:294-299)
    assert m.levels == (LevelSpec(2, 256, 768, GlobalAttentionSpec(64)),
                        LevelSpec(4, 512, 1536, GlobalAttentionSpec(64)))
    assert m.patch_size == 4 and m.mapping == MappingSpec(2, 256, 768)
    cfg2 = config_from_dict({"flow": {
        "hdit_depths": [1, 2], "hdit_widths": [64, 128],
        "hdit_attns": ["na:5", "global"], "hdit_d_head": 32,
        "hdit_patch_size": 2}})
    m2 = hdit_from_config(cfg2, channels=2, n_classes=0,
                          dtype=jnp.bfloat16)
    assert m2.levels[0].self_attn == NeighborhoodAttentionSpec(32, 5)
    assert m2.levels[0].d_ff == 192 and m2.patch_size == 2
    cfg3 = config_from_dict({"flow": {"hdit_depths": [1]}})
    with pytest.raises(SystemExit):
        hdit_from_config(cfg3, channels=2, n_classes=0, dtype=jnp.float32)


def test_trains_through_production_flow_step():
    """The production train step is model_apply-generic: a tiny HDiT must
    fit a biased-cluster velocity target just like the U-Net does."""
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    model = _tiny()
    params, x, t, cond = _init(model, B=16)
    tx = make_flow_optimizer(2e-3)
    state = create_flow_state({"model": params}, tx)
    step = make_flow_train_step(
        lambda p, x, t, c: model.apply(p, x, t, c), tx,
        use_ot=False, donate=False, cfg_dropout=0.0)
    rng = np.random.default_rng(0)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(25):
        key, k = jax.random.split(key)
        batch = {"target": jnp.asarray(
            rng.standard_normal((16, 8, 8, 2)).astype(np.float32) * 0.1
            + 1.5)}
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sampling_dispatcher_integration():
    """generate_latents drives an HDiT apply fn end-to-end (rk4 + CFG)."""
    from flocoder_tpu.sampling import generate_latents
    model = _tiny(n_classes=3)
    params, x, t, _ = _init(model, n_classes=3)
    params = _randomize(params, scale=0.05)
    lat, nfe = generate_latents(
        lambda xx, tt, cc: model.apply(params, xx, tt, cc),
        shape=(2, 8, 8, 2), rng=jax.random.PRNGKey(0), method="rk4",
        n_steps=4, cond={"class_cond": jnp.zeros((2,), jnp.int32),
                         "mask_cond": None},
        cfg_strength=2.0, t_scale=999.0)
    assert lat.shape == (2, 8, 8, 2)
    assert np.isfinite(np.asarray(lat)).all()
    assert nfe > 0
