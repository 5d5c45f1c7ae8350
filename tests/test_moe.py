"""Mixture-of-Experts routing/compute (parallel/moe.py) and the HDiT MoE
FFN block with expert parallelism (models/hdit.py:MoEFeedForwardBlock) —
new TPU-native capability beyond the dense reference (SURVEY §2d)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.parallel.moe import (load_balance_loss, moe_capacity,
                                       moe_geglu_apply,
                                       moe_geglu_replicated, moe_routing)


def _geglu(x, w_up, w_down):
    h = x @ w_up
    a, b = jnp.split(h, 2, axis=-1)
    return (jax.nn.gelu(a, approximate=False) * b) @ w_down


def test_routing_combine_sums_to_one_with_ample_capacity():
    T, E, K = 32, 4, 2
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((T, E)),
                         jnp.float32)
    cap = moe_capacity(T, E, K, capacity_factor=2.0)
    dispatch, combine, stats = moe_routing(logits, K, cap)
    # every token fully routed: combine rows sum to 1
    np.testing.assert_allclose(np.asarray(combine.sum(axis=(1, 2))),
                               np.ones(T), atol=1e-6)
    # dispatch is {0,1}-valued and each (expert, slot) holds ≤ 1 token
    d = np.asarray(dispatch)
    assert set(np.unique(d)).issubset({0.0, 1.0})
    assert (d.sum(axis=0) <= 1.0 + 1e-6).all()
    assert float(stats["dropped_frac"]) == 0.0


def test_routing_capacity_truncation():
    """E=1, K=1, capacity 1: only the first token is served (k-major,
    token-order priority); the rest are dropped from combine."""
    T = 4
    logits = jnp.zeros((T, 1), jnp.float32)
    dispatch, combine, stats = moe_routing(logits, 1, 1)
    s = np.asarray(combine.sum(axis=(1, 2)))
    np.testing.assert_allclose(s, [1.0, 0.0, 0.0, 0.0], atol=1e-6)
    assert float(stats["dropped_frac"]) == pytest.approx(0.75)


def test_identical_experts_match_dense_geglu():
    """With every expert holding the same weights and ample capacity, the
    MoE output equals the plain dense GEGLU — gates sum to 1 and the
    dispatch/combine round trip is exact."""
    rng = np.random.default_rng(1)
    T, E, K, d, f = 16, 4, 2, 8, 12
    flat = jnp.asarray(rng.standard_normal((T, d)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, 2 * f)) * 0.3, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.3, jnp.float32)
    w_up = jnp.broadcast_to(w1, (E, d, 2 * f))
    w_down = jnp.broadcast_to(w2, (E, f, d))
    cap = moe_capacity(T, E, K, 2.0)
    dispatch, combine, _ = moe_routing(logits, K, cap)
    out = moe_geglu_apply(flat, dispatch, combine, w_up, w_down)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_geglu(flat, w1, w2)),
                               rtol=1e-5, atol=1e-5)


def test_load_balance_loss_uniform_is_one():
    T, E = 64, 8
    logits = jnp.zeros((T, E), jnp.float32)
    _, _, stats = moe_routing(logits, 2, moe_capacity(T, E, 2, 2.0))
    # uniform probs: prob_mean = 1/E. density concentrates on expert 0
    # (deterministic tie-break), so use the probs directly for the check:
    lb = E * jnp.sum(jnp.full((E,), 1.0 / E) * stats["prob_mean"])
    assert float(lb) == pytest.approx(1.0, abs=1e-5)
    assert np.isfinite(float(load_balance_loss(stats, E)))


def test_ep_replicated_matches_single_device_fwd_and_grads():
    """moe_geglu_replicated inside shard_map (experts split over 'model',
    one psum) must match the replicated math — forward AND weight grads,
    which stay full/replicated per the custom_vjp contract, so the
    production step's pmean is a no-op."""
    from flocoder_tpu.parallel.mesh import P, make_mesh, pmean_typed, shard_map

    if jax.device_count() < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    rng = np.random.default_rng(2)
    T, E, K, d, f = 16, 8, 2, 6, 10
    flat = jnp.asarray(rng.standard_normal((T, d)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((E, d, 2 * f)) * 0.3, jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((E, f, d)) * 0.3, jnp.float32)
    cap = moe_capacity(T, E, K, 1.5)
    dispatch, combine, _ = moe_routing(logits, K, cap)

    def body(flat, dispatch, combine, w_up, w_down):
        def loss_fn(fl, wu, wd):
            out = moe_geglu_replicated(fl, dispatch, combine, wu, wd,
                                       "model", 4)
            return jnp.sum(out ** 2), out

        (loss, out), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(flat, w_up, w_down)
        names = ("model", "data")
        return (pmean_typed(out, names), pmean_typed(grads, names))

    f_sh = shard_map(body, mesh=mesh,
                     in_specs=(P(), P(), P(), P(), P()),
                     out_specs=(P(), (P(), P(), P())), check_rep=False)
    out_ep, g_ep = f_sh(flat, dispatch, combine, w_up, w_down)

    def ref_loss(fl, wu, wd):
        return jnp.sum(moe_geglu_apply(fl, dispatch, combine, wu, wd) ** 2)

    out_ref = moe_geglu_apply(flat, dispatch, combine, w_up, w_down)
    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(flat, w_up, w_down)
    np.testing.assert_allclose(np.asarray(out_ep), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)
    for ge, gr in zip(g_ep, g_ref):
        np.testing.assert_allclose(np.asarray(ge), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)


def _moe_grad_flops(n_model):
    """Per-device FLOPs (XLA cost analysis) of the compiled fwd+bwd EP
    executable at axis size ``n_model`` on a fixed total problem."""
    from flocoder_tpu.parallel.mesh import P, make_mesh, pmean_typed, shard_map

    mesh = make_mesh(n_data=1, n_model=n_model)
    rng = np.random.default_rng(6)
    T, E, K, d, f = 256, 8, 2, 64, 256
    flat = jnp.asarray(rng.standard_normal((T, d)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((E, d, 2 * f)) * 0.1, jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((E, f, d)) * 0.1, jnp.float32)
    dispatch, combine, _ = moe_routing(logits, K, moe_capacity(T, E, K, 1.5))

    def body(fl, disp, comb, wu_, wd_):
        def loss_fn(fl_, wu, wd):
            return jnp.sum(moe_geglu_replicated(
                fl_, disp, comb, wu, wd, "model", n_model) ** 2)
        grads = jax.grad(loss_fn, argnums=(0, 1, 2))(fl, wu_, wd_)
        return pmean_typed(grads, ("model",))

    f_sh = jax.jit(shard_map(body, mesh=mesh,
                             in_specs=(P(), P(), P(), P(), P()),
                             out_specs=(P(), P(), P()), check_rep=False))
    cost = f_sh.lower(flat, dispatch, combine, w_up,
                      w_down).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(dict(cost or {}).get("flops", -1.0))


def test_moe_backward_flops_split_over_axis():
    """VERDICT r3 #2 done-criterion: the fwd+bwd EP executable's per-shard
    FLOPs drop ~1/S — the backward slices experts, not replicated math."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 virtual devices")
    f1 = _moe_grad_flops(1)
    if f1 <= 0:
        pytest.skip("backend reports no cost analysis")
    f2, f4 = _moe_grad_flops(2), _moe_grad_flops(4)
    # expert matmuls dominate at d=64, d_ff=256; allow dispatch overhead
    assert f2 < 0.65 * f1, (f1, f2)
    assert f4 < 0.40 * f1, (f1, f4)


def _tiny_moe_hdit(ep_axis=None, ep_axis_size=1, n_experts=4):
    from flocoder_tpu.models.hdit import (GlobalAttentionSpec, HDiT,
                                          LevelSpec, MappingSpec)
    return HDiT(levels=(LevelSpec(1, 16, 32, GlobalAttentionSpec(8),
                                  moe_experts=n_experts, moe_top_k=2),),
                mapping=MappingSpec(1, 32, 64), channels=2, patch_size=2,
                n_classes=4, ep_axis=ep_axis, ep_axis_size=ep_axis_size)


def test_moe_block_zero_at_init_and_sows_aux():
    """Zero-init expert down projections → HDiT stays the zero velocity
    field at init; apply with mutable=['moe_losses'] yields one aux scalar
    per MoE FFN block; plain apply drops them."""
    model = _tiny_moe_hdit()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 8, 8, 2)),
                    jnp.float32)
    t = jnp.asarray([100.0, 500.0])
    cond = {"class_cond": jnp.asarray([0, 1]), "mask_cond": None}
    v0 = model.init(jax.random.PRNGKey(0), x, t, cond)
    params = {"params": v0["params"]}
    out, mut = model.apply(params, x, t, cond, mutable=["moe_losses"])
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    leaves = jax.tree_util.tree_leaves(mut)
    assert len(leaves) == 1 and np.isfinite(float(leaves[0]))
    out_plain = model.apply(params, x, t, cond)   # sow silently dropped
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out),
                               atol=0)


def test_flow_step_hdit_moe_ep_on_mesh():
    """The production shard_map flow step trains an HDiT-MoE with expert
    parallelism: (v, aux) model_apply contract, loss folds the aux term,
    and the EP model matches the ep-free twin exactly on the same params."""
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    plain = _tiny_moe_hdit()
    ep = _tiny_moe_hdit(ep_axis="model", ep_axis_size=4)
    x0 = jnp.zeros((2, 8, 8, 2))
    cond0 = {"class_cond": jnp.zeros((2,), jnp.int32), "mask_cond": None}
    v0 = plain.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,)), cond0)
    params = {"model": {"params": v0["params"]}}
    tx = make_flow_optimizer(1e-3)
    batch = shard_batch(mesh, {
        "target": np.random.default_rng(4).standard_normal(
            (8, 8, 8, 2)).astype(np.float32),
        "class_cond": (np.arange(8) % 4).astype(np.int32)})

    losses, auxes = [], []
    for m in (plain, ep):
        def apply_fn(p, x, t, c, m_=m):
            v, mut = m_.apply(p, x, t, c, mutable=["moe_losses"])
            leaves = jax.tree_util.tree_leaves(mut)
            return v, 1e-2 * (sum(leaves) / len(leaves))

        step = make_flow_train_step(apply_fn, tx, donate=False, mesh=mesh)
        state = create_flow_state(params, tx)
        _, aux = step(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(aux["loss"]))
        assert "loss_model_aux" in aux
        losses.append(float(aux["loss"]))
        auxes.append(float(aux["loss_model_aux"]))
    assert losses[0] == pytest.approx(losses[1], abs=1e-4), losses
    assert auxes[0] == pytest.approx(auxes[1], abs=1e-5), auxes
