"""GPipe pipeline parallelism (parallel/pipeline.py) and the stacked /
pipelined HDiT mid level (models/hdit.py pp_stages) — new TPU-native
capability beyond the single-device reference (SURVEY §2d)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.parallel.pipeline import pipeline_apply, sequential_apply


def _toy_block(p, x, aux):
    # residual tanh block conditioned on a per-sample aux vector
    return x + jnp.tanh(x @ p["w"] + aux @ p["u"])


def _toy_setup(L=8, B=8, d=6):
    rng = np.random.default_rng(0)
    stacked = {
        "w": jnp.asarray(rng.standard_normal((L, d, d)) * 0.3, jnp.float32),
        "u": jnp.asarray(rng.standard_normal((L, d, d)) * 0.3, jnp.float32)}
    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    aux = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    return stacked, x, aux


def test_sequential_apply_is_the_block_composition():
    stacked, x, aux = _toy_setup(L=3)
    y = sequential_apply(_toy_block, stacked, x, aux)
    ref = x
    for i in range(3):
        ref = _toy_block({k: v[i] for k, v in stacked.items()}, ref, aux)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("n_micro", [1, 2, 4, 8])
def test_pipeline_matches_sequential_fwd_and_grads(n_micro):
    """The S-stage pipeline inside shard_map must reproduce the sequential
    stack exactly — forward AND cotangents (params, x, aux), which come out
    full/replicated per the custom_vjp psum contract, so the production
    step's pmean over 'model' is a typing no-op."""
    from flocoder_tpu.parallel.mesh import (P, make_mesh, pmean_typed,
                                            shard_map)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    stacked, x, aux = _toy_setup(L=8, B=8)

    def body(stacked, x, aux):
        def loss_fn(p, xx, au):
            y = pipeline_apply(_toy_block, "model", 4, n_micro, p, xx, au)
            return jnp.sum(y ** 2), y

        (_, y), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(stacked, x, aux)
        names = ("model", "data")
        return pmean_typed(y, names), pmean_typed(grads, names)

    f = shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                  out_specs=(P(), (P(), P(), P())), check_rep=False)
    y_pp, g_pp = f(stacked, x, aux)

    def ref_loss(p, xx, au):
        return jnp.sum(sequential_apply(_toy_block, p, xx, au) ** 2)

    y_ref = sequential_apply(_toy_block, stacked, x, aux)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(stacked, x, aux)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    for ge, gr in zip(jax.tree_util.tree_leaves(g_pp),
                      jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_validates_divisibility():
    stacked, x, aux = _toy_setup(L=6, B=8)
    with pytest.raises(ValueError, match="not divisible"):
        # L=6 does not split into 4 stages; axis math is pre-collective so
        # the error raises at trace time even outside shard_map
        pipeline_apply(_toy_block, "model", 4, 2, stacked, x, aux)
    stacked, x, aux = _toy_setup(L=8, B=6)
    with pytest.raises(ValueError, match="n_micro"):
        pipeline_apply(_toy_block, "model", 4, 4, stacked, x, aux)


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_interleaved_matches_sequential(n_micro):
    """flow.pp_schedule=interleaved (VERDICT r3 #5): the virtual-chunk
    schedule must reproduce the sequential stack exactly — forward AND
    cotangents — like the GPipe oracle."""
    from flocoder_tpu.parallel.mesh import (P, make_mesh, pmean_typed,
                                            shard_map)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    stacked, x, aux = _toy_setup(L=8, B=8)

    def body(stacked, x, aux):
        def loss_fn(p, xx, au):
            y = pipeline_apply(_toy_block, "model", 4, n_micro, p, xx, au,
                               interleave=2)
            return jnp.sum(y ** 2), y

        (_, y), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(stacked, x, aux)
        names = ("model", "data")
        return pmean_typed(y, names), pmean_typed(grads, names)

    f = shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                  out_specs=(P(), (P(), P(), P())), check_rep=False)
    y_pp, g_pp = f(stacked, x, aux)

    def ref_loss(p, xx, au):
        return jnp.sum(sequential_apply(_toy_block, p, xx, au) ** 2)

    y_ref = sequential_apply(_toy_block, stacked, x, aux)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(stacked, x, aux)
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    for ge, gr in zip(jax.tree_util.tree_leaves(g_pp),
                      jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_interleaved_validates():
    stacked, x, aux = _toy_setup(L=8, B=8)
    with pytest.raises(ValueError, match="interleave"):
        # L=8 does not split into 4 stages × 4 chunks
        pipeline_apply(_toy_block, "model", 4, 4, stacked, x, aux,
                       interleave=4)
    with pytest.raises(ValueError, match="rounds"):
        # M=2 not a multiple of S=4
        pipeline_apply(_toy_block, "model", 4, 2, stacked, x, aux,
                       interleave=2)


def test_pipeline_tick_accounting_bubble_shrinks():
    """S=4, M=8 (the VERDICT r3 #5 accounting point): GPipe 11 ticks with
    27.3% bubble; interleave=2 → 19 half-work ticks ≡ 9.5 stage-ticks with
    15.8% bubble (the idle WALL-CLOCK halves: 1.5 vs 3 stage-ticks) and
    ramp garbage FLOPs halve."""
    from flocoder_tpu.parallel.pipeline import pipeline_tick_accounting

    g = pipeline_tick_accounting(4, 8, 1)
    i = pipeline_tick_accounting(4, 8, 2)
    assert g["ticks"] == 11 and i["ticks"] == 19
    assert i["wall_stage_ticks"] == pytest.approx(9.5)
    assert g["bubble_fraction"] == pytest.approx(3 / 11)
    assert i["bubble_fraction"] == pytest.approx(3 / 19)
    # idle wall-clock (bubble × wall) halves exactly: 3 → 1.5 stage-ticks
    assert (i["bubble_fraction"] * i["wall_stage_ticks"]) == pytest.approx(
        (g["bubble_fraction"] * g["wall_stage_ticks"]) / 2)
    assert i["garbage_work_fraction"] == pytest.approx(
        g["garbage_work_fraction"] / 2)


def _pp_grad_flops(interleave):
    """Per-device FLOPs of the compiled fwd+bwd pipeline executable."""
    from flocoder_tpu.parallel.mesh import (P, make_mesh, pmean_typed,
                                            shard_map)

    mesh = make_mesh(n_data=1, n_model=4)
    rng = np.random.default_rng(7)
    L, B, d = 8, 8, 64
    stacked = {
        "w": jnp.asarray(rng.standard_normal((L, d, d)) * 0.3, jnp.float32),
        "u": jnp.asarray(rng.standard_normal((L, d, d)) * 0.3, jnp.float32)}
    x = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    aux = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)

    def body(p_, x_, a_):
        def loss_fn(p, xx, au):
            return jnp.sum(pipeline_apply(_toy_block, "model", 4, 8, p,
                                          xx, au,
                                          interleave=interleave) ** 2)
        return pmean_typed(jax.grad(loss_fn, argnums=(0, 1, 2))(p_, x_, a_),
                           ("model",))

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                          out_specs=(P(), P(), P()), check_rep=False))
    cost = f.lower(stacked, x, aux).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(dict(cost or {}).get("flops", -1.0))


def test_pipeline_interleaved_flops_shrink():
    """The compiled fwd+bwd executable's FLOPs drop with the interleaved
    schedule: ramp ticks compute 1/v the garbage (expected ratio ≈
    (vM+S−1)/(v·(M+S−1)) = 19/22 at S=4, M=8, v=2)."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 virtual devices")
    f_g = _pp_grad_flops(1)
    if f_g <= 0:
        pytest.skip("backend reports no cost analysis")
    f_i = _pp_grad_flops(2)
    assert f_i < 0.95 * f_g, (f_g, f_i)
    assert f_i > 0.6 * f_g, (f_g, f_i)  # same useful work, sanity bound


def _pp_hdit(pp_stages=0, pp_axis=None, pp_axis_size=1, depth=4,
             pp_interleave=1):
    from flocoder_tpu.models.hdit import (GlobalAttentionSpec, HDiT,
                                          LevelSpec, MappingSpec)
    return HDiT(levels=(LevelSpec(1, 16, 32, GlobalAttentionSpec(8)),
                        LevelSpec(depth, 32, 64, GlobalAttentionSpec(8))),
                mapping=MappingSpec(1, 32, 64), channels=2, patch_size=2,
                n_classes=4, pp_stages=pp_stages, pp_axis=pp_axis,
                pp_axis_size=pp_axis_size, pp_interleave=pp_interleave)


def test_hdit_stacked_mid_level_params_and_serving():
    """pp_stages>0 lays the mid level out as ONE stacked nn.scan module
    ('mid_blocks', leading depth axis) and the off-mesh apply replays it
    sequentially — the serving twin needs no mesh."""
    model = _pp_hdit(pp_stages=2, depth=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 2)),
                    jnp.float32)
    t = jnp.asarray([10.0, 500.0])
    cond = {"class_cond": jnp.asarray([0, 1]), "mask_cond": None}
    v0 = model.init(jax.random.PRNGKey(0), x, t, cond)
    mid = v0["params"]["mid_blocks"]
    leaves = jax.tree_util.tree_leaves(mid)
    assert all(l.shape[0] == 4 for l in leaves), "params not depth-stacked"
    out = model.apply(v0, x, t, cond)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init output projections hold for the stacked layout too
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_flow_step_hdit_pp_on_mesh_matches_twin():
    """The production shard_map flow step trains a pipelined HDiT: same
    params, same batch — the pp model's loss equals the sequential twin's."""
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    plain = _pp_hdit(pp_stages=4, depth=4)
    pp = _pp_hdit(pp_stages=4, pp_axis="model", pp_axis_size=4, depth=4)
    x0 = jnp.zeros((2, 8, 8, 2))
    cond0 = {"class_cond": jnp.zeros((2,), jnp.int32), "mask_cond": None}
    v0 = plain.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)), cond0)
    params = {"model": {"params": v0["params"]}}
    tx = make_flow_optimizer(1e-3)
    batch = shard_batch(mesh, {
        "target": np.random.default_rng(4).standard_normal(
            (8, 8, 8, 2)).astype(np.float32),
        "class_cond": (np.arange(8) % 4).astype(np.int32)})

    losses = []
    states = []
    for m in (plain, pp):
        step = make_flow_train_step(
            lambda p, x, t, c, m_=m: m_.apply(p, x, t, c), tx,
            donate=False, mesh=mesh)
        state = create_flow_state(params, tx)
        state, aux = step(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(aux["loss"]))
        losses.append(float(aux["loss"]))
        states.append(state)
    assert losses[0] == pytest.approx(losses[1], abs=1e-4), losses
    # grads flowed identically: updated params match across the twins
    for a, b in zip(jax.tree_util.tree_leaves(states[0].params),
                    jax.tree_util.tree_leaves(states[1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_flow_step_hdit_pp_interleaved_matches_twin():
    """flow.pp_schedule=interleaved drives the HDiT mid level through the
    virtual-chunk schedule in the production step and matches the
    sequential twin's loss on the same params."""
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_model=2)
    plain = _pp_hdit(pp_stages=2, depth=4)
    pp = _pp_hdit(pp_stages=2, pp_axis="model", pp_axis_size=2, depth=4,
                  pp_interleave=2)
    x0 = jnp.zeros((2, 8, 8, 2))
    cond0 = {"class_cond": jnp.zeros((2,), jnp.int32), "mask_cond": None}
    v0 = plain.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)), cond0)
    params = {"model": {"params": v0["params"]}}
    tx = make_flow_optimizer(1e-3)
    batch = shard_batch(mesh, {
        "target": np.random.default_rng(6).standard_normal(
            (8, 8, 8, 2)).astype(np.float32),
        "class_cond": (np.arange(8) % 4).astype(np.int32)})

    losses = []
    for m in (plain, pp):
        step = make_flow_train_step(
            lambda p, x, t, c, m_=m: m_.apply(p, x, t, c), tx,
            donate=False, mesh=mesh)
        state = create_flow_state(params, tx)
        _, aux = step(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(aux["loss"]))
        losses.append(float(aux["loss"]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-4), losses


def test_hdit_from_config_pp_schedule():
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.hdit import hdit_from_config

    base = {"hdit_depths": [1, 8], "hdit_widths": [16, 32],
            "hdit_attns": ["global", "global"], "hdit_d_head": 8,
            "hdit_patch_size": 2, "hdit_pp_stages": 2}
    cfg = config_from_dict({"flow": {**base,
                                     "pp_schedule": "interleaved"}})
    model = hdit_from_config(cfg, 2, 4, jnp.float32)
    assert model.pp_interleave == 2
    # depth 8 = stages 2 × interleave 2 × 2 blocks/chunk ✓; depth 6 fails
    cfg = config_from_dict({"flow": {**base, "hdit_depths": [1, 6],
                                     "pp_schedule": "interleaved"}})
    with pytest.raises(SystemExit, match="divide"):
        hdit_from_config(cfg, 2, 4, jnp.float32)
    cfg = config_from_dict({"flow": {**base, "pp_schedule": "bogus"}})
    with pytest.raises(SystemExit, match="pp_schedule"):
        hdit_from_config(cfg, 2, 4, jnp.float32)


def test_hdit_from_config_pp_validation():
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.hdit import hdit_from_config

    base = {"hdit_depths": [1, 3], "hdit_widths": [16, 32],
            "hdit_attns": ["global", "global"], "hdit_d_head": 8,
            "hdit_patch_size": 2}
    cfg = config_from_dict({"flow": {**base, "hdit_pp_stages": 2}})
    with pytest.raises(SystemExit, match="divide"):
        hdit_from_config(cfg, 2, 4, jnp.float32)
    cfg = config_from_dict({"flow": {**base, "hdit_depths": [1, 4],
                                     "hdit_moe_experts": [0, 2],
                                     "hdit_pp_stages": 2}})
    with pytest.raises(SystemExit, match="MoE"):
        hdit_from_config(cfg, 2, 4, jnp.float32)
    cfg = config_from_dict({"flow": {**base, "hdit_depths": [1, 4],
                                     "hdit_pp_stages": 2}})
    model = hdit_from_config(cfg, 2, 4, jnp.float32)
    assert model.pp_stages == 2 and model.levels[-1].depth == 4


def test_flow_step_pp_and_ep_compose_on_same_axis():
    """PP (stacked mid level) and EP (MoE outer level) both slice their
    work by lax.axis_index over the SAME 'model' axis — independent
    replicated-in/out custom_vjp contracts, so they must compose in one
    shard_map step and match the plain twin's loss on the same params."""
    from flocoder_tpu.models.hdit import (GlobalAttentionSpec, HDiT,
                                          LevelSpec, MappingSpec)
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=4, n_model=2)

    def build(**clone_kw):
        return HDiT(levels=(LevelSpec(1, 16, 32, GlobalAttentionSpec(8),
                                      moe_experts=4, moe_top_k=2),
                            LevelSpec(2, 32, 64, GlobalAttentionSpec(8))),
                    mapping=MappingSpec(1, 32, 64), channels=2,
                    patch_size=2, n_classes=4, pp_stages=2, **clone_kw)

    plain = build()
    both = build(pp_axis="model", pp_axis_size=2,
                 ep_axis="model", ep_axis_size=2)
    x0 = jnp.zeros((2, 8, 8, 2))
    cond0 = {"class_cond": jnp.zeros((2,), jnp.int32), "mask_cond": None}
    v0 = plain.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)), cond0)
    params = {"model": {"params": v0["params"]}}
    tx = make_flow_optimizer(1e-3)
    batch = shard_batch(mesh, {
        "target": np.random.default_rng(5).standard_normal(
            (8, 8, 8, 2)).astype(np.float32),
        "class_cond": (np.arange(8) % 4).astype(np.int32)})

    losses = []
    for m in (plain, both):
        def apply_fn(p, x, t, c, m_=m):
            v, mut = m_.apply(p, x, t, c, mutable=["moe_losses"])
            leaves = jax.tree_util.tree_leaves(mut)
            return v, 1e-2 * (sum(leaves) / len(leaves))

        step = make_flow_train_step(apply_fn, tx, donate=False, mesh=mesh)
        state = create_flow_state(params, tx)
        _, aux = step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(aux["loss"]))
        losses.append(float(aux["loss"]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-4), losses


def test_tpu_pod_recipe_builds_the_full_parallelism_model():
    """configs/tpu_pod_hdit.yaml composes and builds an HDiT carrying both
    EP (outer-level MoE) and PP (stacked mid level) — the recipe users run
    on a multi-chip slice."""
    import os
    from flocoder_tpu.config import load_config, ldcfg
    from flocoder_tpu.models.hdit import hdit_from_config

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    cfg = load_config("tpu_pod_hdit", config_dir=cfg_dir)
    assert int(ldcfg(cfg, "n_model")) == 4
    assert bool(ldcfg(cfg, "moe_ep")) and bool(ldcfg(cfg, "pp"))
    model = hdit_from_config(cfg, 4, 102, jnp.bfloat16)
    assert model.levels[0].moe_experts == 8
    assert model.levels[1].moe_experts == 0
    assert model.pp_stages == 4
    assert model.levels[-1].depth % model.pp_stages == 0
