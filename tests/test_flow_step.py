"""Flow train-step unit tests: loss decreases, EMA moves, determinism,
encode_fn fusion, CFG dropout gating."""
import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.training.flow import (create_flow_state,
                                        make_flow_optimizer,
                                        make_flow_train_step,
                                        make_flow_eval_step)


def _tiny_model():
    """A linear velocity model: v = x @ W (params pytree {'w': (C, C)})."""
    def apply_fn(params, x, t, cond):
        return jnp.einsum("bhwc,cd->bhwd", x, params["w"])
    params = {"model": {"w": jnp.eye(2) * 0.1}}
    return apply_fn, params


def test_step_updates_params_and_ema():
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    state = create_flow_state(params, tx)
    step = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                ema_decay=0.5)
    batch = {"target": jnp.ones((8, 4, 4, 2))}
    new_state, aux = step(state, batch, jax.random.PRNGKey(0))
    assert float(aux["loss"]) > 0
    assert int(new_state.step) == 1
    # params moved and ema chased them at decay 0.5
    dw = float(jnp.abs(new_state.params["model"]["w"] -
                       state.params["model"]["w"]).max())
    assert dw > 0
    de = float(jnp.abs(new_state.ema["model"]["w"] -
                       state.params["model"]["w"]).max())
    assert 0 < de < dw + 1e-9


def test_step_deterministic_given_rng():
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    step = make_flow_train_step(apply_fn, tx, use_ot=True, donate=False)
    batch = {"target": jnp.ones((8, 4, 4, 2)),
             "class_cond": jnp.zeros((8,), jnp.int32)}
    s1, a1 = step(create_flow_state(params, tx), batch, jax.random.PRNGKey(7))
    s2, a2 = step(create_flow_state(params, tx), batch, jax.random.PRNGKey(7))
    assert float(a1["loss"]) == float(a2["loss"])
    np.testing.assert_array_equal(np.asarray(s1.params["model"]["w"]),
                                  np.asarray(s2.params["model"]["w"]))


def test_encode_fn_fusion():
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    encode = lambda px: px[:, ::2, ::2, :2] * 2.0  # fake codec: crop+scale
    step = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                encode_fn=encode)
    batch = {"pixels": jnp.ones((8, 8, 8, 3))}
    state, aux = step(create_flow_state(params, tx), batch,
                      jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))


def test_loss_decreases_over_steps():
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(5e-2)
    state = create_flow_state(params, tx)
    step = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                cfg_dropout=0.0)
    rng = np.random.default_rng(0)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(30):
        key, k = jax.random.split(key)
        batch = {"target": jnp.asarray(
            rng.standard_normal((32, 4, 4, 2)).astype(np.float32) * 0.1 + 1.0)}
        state, aux = step(state, batch, k)
        losses.append(float(aux["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_eval_step_matches_manual():
    apply_fn, params = _tiny_model()
    eval_step = make_flow_eval_step(apply_fn, use_ot=False)
    batch = {"target": jnp.ones((4, 4, 4, 2))}
    loss = float(eval_step(params, batch, jax.random.PRNGKey(3)))
    assert np.isfinite(loss) and loss > 0


def test_multistep_matches_sequential():
    """steps_per_call=K scan == K sequential single steps fed the split keys
    (the documented rng contract of make_flow_train_step)."""
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    K, B = 3, 8
    rng = np.random.default_rng(0)
    batches = [{"target": jnp.asarray(
        rng.standard_normal((B, 4, 4, 2)), jnp.float32)} for _ in range(K)]
    key = jax.random.PRNGKey(7)

    # sequential single steps
    step1 = make_flow_train_step(apply_fn, tx, use_ot=True, donate=False)
    state_seq = create_flow_state(params, tx)
    keys = jax.random.split(key, K)
    for i in range(K):
        state_seq, aux_seq = step1(state_seq, batches[i], keys[i])

    # one multi-step dispatch
    stepK = make_flow_train_step(apply_fn, tx, use_ot=True, donate=False,
                                 steps_per_call=K)
    state_multi = create_flow_state(params, tx)
    super_batch = {"target": jnp.stack([b["target"] for b in batches])}
    state_multi, aux_multi = stepK(state_multi, super_batch, key)

    np.testing.assert_allclose(
        np.asarray(state_multi.params["model"]["w"]),
        np.asarray(state_seq.params["model"]["w"]), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(state_multi.ema["model"]["w"]),
        np.asarray(state_seq.ema["model"]["w"]), rtol=1e-6, atol=1e-7)
    assert int(state_multi.step) == K
    # last-step metrics + window mean are reported
    np.testing.assert_allclose(float(aux_multi["loss"]),
                               float(aux_seq["loss"]), rtol=1e-6)
    assert "loss_mean" in aux_multi


def test_multistep_sharded_mesh():
    """Multi-step scan composes with the shard_map mesh path."""
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    mesh = make_mesh(n_data=4)
    K, B = 2, 8
    step = make_flow_train_step(apply_fn, tx, use_ot=True, donate=False,
                                mesh=mesh, steps_per_call=K)
    state = create_flow_state(params, tx)
    rng = np.random.default_rng(1)
    super_batch = shard_batch(mesh, {
        "target": rng.standard_normal((K, B, 4, 4, 2)).astype(np.float32)},
        axis=1)
    state, aux = step(state, super_batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert int(state.step) == K


def test_otf_aug_p_zeros_forces_identity():
    """otf_aug with p_zeros=1 sets mask:=0 and source:=target for the whole
    batch (reference train_flow.py:150-153): with a zero model and no OT the
    velocity target collapses to 0 so loss_flow == 0 exactly."""
    def apply_fn(params, x, t, cond):
        return jnp.einsum("bhwc,cd->bhwd", x, params["w"])
    params = {"model": {"w": jnp.zeros((2, 2))},
              "mask_encoder": {}}
    tx = make_flow_optimizer(1e-2, mask_encoder=True)
    me = lambda p, m: m  # identity mask encoder
    step = make_flow_train_step(
        apply_fn, tx, mask_encoder_apply=me, use_ot=False, donate=False,
        cfg_dropout=0.0, mask_identity_weight=0.0,
        otf_aug={"curriculum_epochs": 0, "extend_epochs": 0,
                 "p_ones": 0.0, "p_zeros": 1.0, "steps_per_epoch": 1})
    B = 8
    rng = np.random.default_rng(0)
    batch = {"target": jnp.asarray(rng.standard_normal((B, 4, 4, 2)),
                                   jnp.float32),
             "source": jnp.asarray(rng.standard_normal((B, 4, 4, 2)),
                                   jnp.float32),
             "mask_pixels": jnp.ones((B, 4, 4, 1), jnp.float32)}
    state = create_flow_state(params, tx)
    _, aux = step(state, batch, jax.random.PRNGKey(0))
    assert float(aux["loss_flow"]) == 0.0


def test_otf_aug_p_ones_uses_blank_latents():
    """p_ones=1 replaces source with the encoded blank image and the mask
    with all-ones (unconditional generation, reference train_flow.py:145-149)
    — observable because a zero mask-encoder leaves source = blank."""
    def apply_fn(params, x, t, cond):
        return jnp.einsum("bhwc,cd->bhwd", x, params["w"])
    params = {"model": {"w": jnp.zeros((2, 2))}, "mask_encoder": {}}
    tx = make_flow_optimizer(1e-2, mask_encoder=True)
    me = lambda p, m: jnp.zeros_like(m)  # mask encoder output 0 → no blend
    blank = jnp.full((1, 4, 4, 2), 5.0)
    step = make_flow_train_step(
        apply_fn, tx, mask_encoder_apply=me, use_ot=False, donate=False,
        cfg_dropout=0.0, mask_identity_weight=0.0, blank_latents=blank,
        otf_aug={"curriculum_epochs": 0, "extend_epochs": 0,
                 "p_ones": 1.0, "p_zeros": 0.0, "steps_per_epoch": 1})
    B = 8
    target = jnp.zeros((B, 4, 4, 2))
    batch = {"target": target,
             "source": jnp.zeros((B, 4, 4, 2)),
             "mask_pixels": jnp.zeros((B, 4, 4, 1), jnp.float32)}
    state = create_flow_state(params, tx)
    _, aux = step(state, batch, jax.random.PRNGKey(0))
    # v* = target - source = 0 - 5 → loss_flow = mean(25) with zero model
    np.testing.assert_allclose(float(aux["loss_flow"]), 25.0, rtol=1e-5)


def test_otf_aug_curriculum_ramps_on_device():
    """During curriculum epochs p_ones ramps down with the traced step
    counter — epoch 1 of curriculum_epochs=2 gives p_ones=1 (all blank),
    epoch 3 (past extend) gives the final p_ones=0 (batch untouched)."""
    def apply_fn(params, x, t, cond):
        return jnp.einsum("bhwc,cd->bhwd", x, params["w"])
    params = {"model": {"w": jnp.zeros((2, 2))}, "mask_encoder": {}}
    tx = make_flow_optimizer(1e-2, mask_encoder=True)
    me = lambda p, m: jnp.zeros_like(m)
    blank = jnp.full((1, 4, 4, 2), 5.0)
    step = make_flow_train_step(
        apply_fn, tx, mask_encoder_apply=me, use_ot=False, donate=False,
        cfg_dropout=0.0, mask_identity_weight=0.0, blank_latents=blank,
        otf_aug={"curriculum_epochs": 2, "extend_epochs": 2,
                 "p_ones": 0.0, "p_zeros": 0.0, "steps_per_epoch": 1})
    B = 8
    batch = {"target": jnp.zeros((B, 4, 4, 2)),
             "source": jnp.zeros((B, 4, 4, 2)),
             "mask_pixels": jnp.zeros((B, 4, 4, 1), jnp.float32)}
    state = create_flow_state(params, tx)  # step 0 → epoch 1: p_ones = 1
    state, aux1 = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(aux1["loss_flow"]), 25.0, rtol=1e-5)
    state, _ = step(state, batch, jax.random.PRNGKey(1))  # epoch 2
    state, aux3 = step(state, batch, jax.random.PRNGKey(2))  # epoch 3: off
    assert float(aux3["loss_flow"]) == 0.0


def _zero_model():
    def apply_fn(params, x, t, cond):
        return jnp.zeros_like(x) * params["w"]
    return apply_fn, {"model": {"w": jnp.ones(())}}


def test_paired_source_keeps_coupling_and_skips_ot():
    """Reflow mode: the batch's (source, target) pairs are used verbatim.
    Construct pairs where OT re-pairing would swap them (cross-matched
    minima) — with a zero model the loss is exactly mean((target-source)²)
    under the ORIGINAL pairing, so any OT scramble or noise resample would
    change it."""
    apply_fn, params = _zero_model()
    tx = make_flow_optimizer(1e-2)
    step = make_flow_train_step(apply_fn, tx, use_ot=True, donate=False,
                                cfg_dropout=0.0, paired_source=True)
    B = 8
    src = jnp.stack([jnp.full((4, 4, 2), float(i)) for i in range(B)])
    # target i is CLOSEST to source (i+1)%B: OT would re-pair, reflow must not
    tgt = jnp.stack([jnp.full((4, 4, 2), float((i + 1) % B) + 0.1)
                     for i in range(B)])
    batch = {"target": tgt, "source": src}
    state = create_flow_state(params, tx)
    _, aux = step(state, batch, jax.random.PRNGKey(0))
    expect = float(jnp.mean((tgt - src) ** 2))
    np.testing.assert_allclose(float(aux["loss_flow"]), expect, rtol=1e-5)
    # sanity: after an OT re-pair the per-pair gap would be ~0.1 (loss
    # ~0.01), so the ~14.8 closed-form value proves the coupling survived
    assert expect > 1.0


def test_paired_source_cfg_drop_does_not_resample():
    """With cfg_dropout=1 (always drop) the class token is nulled but the
    stored source must survive — a resample would randomize the zero-model
    loss away from the closed form."""
    apply_fn, params = _zero_model()
    tx = make_flow_optimizer(1e-2)
    step = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                cfg_dropout=1.0, paired_source=True)
    B = 8
    src = jnp.zeros((B, 4, 4, 2))
    tgt = jnp.full((B, 4, 4, 2), 3.0)
    batch = {"target": tgt, "source": src,
             "class_cond": jnp.arange(B, dtype=jnp.int32)}
    state = create_flow_state(params, tx)
    _, aux = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(aux["loss_flow"]), 9.0, rtol=1e-5)


def test_paired_source_eval_step():
    apply_fn, params = _zero_model()
    eval_step = make_flow_eval_step(apply_fn, paired_source=True)
    B = 8
    src = jnp.zeros((B, 4, 4, 2))
    tgt = jnp.full((B, 4, 4, 2), 2.0)
    loss = eval_step(params, {"target": tgt, "source": src},
                     jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss), 4.0, rtol=1e-5)


def test_ot_block_step_runs_and_is_deterministic():
    """flow.ot_block wiring: the blocked-pairing step runs, is rng-
    deterministic, and block=B reproduces the full-batch pairing exactly
    (compute_ot_pairing_blocked degenerates to the parallel pairing)."""
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    batch = {"target": jax.random.normal(jax.random.PRNGKey(3),
                                         (16, 4, 4, 2))}
    state = create_flow_state(params, tx)
    step_blocked = make_flow_train_step(apply_fn, tx, donate=False,
                                        cfg_dropout=0.0, ot_block=8)
    _, aux = step_blocked(state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(aux["loss"]))
    _, aux2 = step_blocked(state, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(aux["loss"]), float(aux2["loss"]),
                               rtol=1e-6)
    step_degenerate = make_flow_train_step(apply_fn, tx, donate=False,
                                           cfg_dropout=0.0, ot_block=16)
    step_full = make_flow_train_step(apply_fn, tx, donate=False,
                                     cfg_dropout=0.0)
    _, aux_d = step_degenerate(state, batch, jax.random.PRNGKey(7))
    _, aux_f = step_full(state, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(aux_d["loss"]), float(aux_f["loss"]),
                               rtol=1e-6)


def test_curvature_penalty_zero_for_constant_field():
    """A velocity field independent of (x, t) has zero path curvature —
    the jvp total derivative must be exactly 0 (training/flow.py
    curvature_weight docs)."""
    def apply_fn(params, x, t, cond):
        return jnp.zeros_like(x) + params["c"]
    params = {"model": {"c": jnp.float32(0.7)}}
    tx = make_flow_optimizer(1e-2)
    step = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                cfg_dropout=0.0, curvature_weight=0.5)
    state = create_flow_state(params, tx)
    batch = {"target": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 2))}
    _, aux = step(state, batch, jax.random.PRNGKey(0))
    assert float(aux["loss_curvature"]) == 0.0
    np.testing.assert_allclose(float(aux["loss"]),
                               float(aux["loss_flow"]), rtol=1e-6)


def test_curvature_penalty_closed_form_linear_in_t():
    """v = c·t (no x dependence) ⇒ dv/dt = c everywhere ⇒ the curvature
    term is exactly c², and the total loss is loss_flow + λ·c²."""
    def apply_fn(params, x, t, cond):
        return jnp.ones_like(x) * t[:, None, None, None] * params["c"]
    c, lam = 0.8, 0.25
    params = {"model": {"c": jnp.float32(c)}}
    tx = make_flow_optimizer(1e-2)
    step = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                cfg_dropout=0.0, t_scale=1.0,
                                curvature_weight=lam)
    state = create_flow_state(params, tx)
    batch = {"target": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 2))}
    _, aux = step(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(aux["loss_curvature"]), c * c, rtol=1e-5)
    np.testing.assert_allclose(
        float(aux["loss"]), float(aux["loss_flow"]) + lam * c * c, rtol=1e-5)


def test_curvature_penalty_shapes_training():
    """The regularizer must actually reach the gradients: with x-dependent
    params the curvature term changes the update, and λ=0 reproduces the
    unregularized step bit-for-bit (same code path, no jvp)."""
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    batch = {"target": jax.random.normal(jax.random.PRNGKey(3), (8, 4, 4, 2))}
    s0 = create_flow_state(params, tx)
    step_plain = make_flow_train_step(apply_fn, tx, use_ot=False,
                                      donate=False, cfg_dropout=0.0)
    step_l0 = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                   cfg_dropout=0.0, curvature_weight=0.0)
    step_reg = make_flow_train_step(apply_fn, tx, use_ot=False, donate=False,
                                    cfg_dropout=0.0, curvature_weight=10.0)
    sp, ap = step_plain(s0, batch, jax.random.PRNGKey(5))
    s1, a1 = step_l0(s0, batch, jax.random.PRNGKey(5))
    sr, ar = step_reg(s0, batch, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(sp.params["model"]["w"]),
                                  np.asarray(s1.params["model"]["w"]))
    assert np.isfinite(float(ar["loss"]))
    # v = x@W ⇒ dv/dt = v_star@W ≠ 0 in general ⇒ different update
    assert float(jnp.abs(sr.params["model"]["w"] -
                         sp.params["model"]["w"]).max()) > 1e-7


def test_meanflow_target_closed_forms():
    """MeanFlow identity u_tgt = v* + (t−r)·du/dr against two analytic
    fields (training/flow.py:meanflow_target):
    - u = p·r (linear in the state time, no x dependence): du/dr = p
    - u = x@W (linear in x): du/dr = (dx/dr)@W = v*@W"""
    from flocoder_tpu.training.flow import meanflow_target
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 2, 2, 2))
    v_star = jax.random.normal(jax.random.PRNGKey(1), (B, 2, 2, 2))
    r = jnp.array([0.1, 0.3, 0.5, 0.9])
    t = jnp.array([0.2, 0.9, 0.5, 1.0])

    def apply_time(params, xx, tvec, cond):
        return jnp.ones_like(xx) * params * tvec[:, None, None, None]

    u, u_tgt = meanflow_target(apply_time, 2.5, x, r, t, v_star,
                               {"class_cond": None}, t_scale=1.0)
    np.testing.assert_allclose(np.asarray(u),
                               2.5 * np.asarray(r)[:, None, None, None]
                               * np.ones_like(x), rtol=1e-6)
    expect = np.asarray(v_star) + (np.asarray(t) - np.asarray(r))[
        :, None, None, None] * 2.5
    np.testing.assert_allclose(np.asarray(u_tgt), expect, rtol=1e-5)

    W = jnp.array([[0.5, -0.2], [0.3, 0.8]])

    def apply_x(params, xx, tvec, cond):
        return jnp.einsum("bhwc,cd->bhwd", xx, params)

    u, u_tgt = meanflow_target(apply_x, W, x, r, t, v_star, None, t_scale=1.0)
    np.testing.assert_allclose(np.asarray(u),
                               np.einsum("bhwc,cd->bhwd", x, W), rtol=1e-6)
    expect = np.asarray(v_star) + (np.asarray(t) - np.asarray(r))[
        :, None, None, None] * np.einsum("bhwc,cd->bhwd", v_star, W)
    np.testing.assert_allclose(np.asarray(u_tgt), expect, rtol=1e-5)


def test_meanflow_ratio_zero_equals_plain_fm():
    """With meanflow_ratio=0 every sample has r=t, u_tgt collapses to v*,
    and (adaptive weighting off) the meanflow loss equals the plain
    flow-matching loss for the same rng and a horizon-blind model."""
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    batch = {"target": jax.random.normal(jax.random.PRNGKey(2), (8, 4, 4, 2))}
    s0 = create_flow_state(params, tx)
    plain = make_flow_train_step(apply_fn, tx, donate=False, cfg_dropout=0.0)
    mf = make_flow_train_step(apply_fn, tx, donate=False, cfg_dropout=0.0,
                              meanflow=True, meanflow_ratio=0.0,
                              meanflow_adaptive_p=0.0)
    _, ap = plain(s0, batch, jax.random.PRNGKey(9))
    _, am = mf(s0, batch, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(am["loss"]), float(ap["loss"]),
                               rtol=1e-5)


def test_meanflow_step_with_dual_time_unet():
    """Production wiring: a dual-time Unet trains under the meanflow step —
    loss finite, params move, rng-deterministic; and the mode refuses to
    combine with curvature_weight."""
    import pytest
    from flocoder_tpu.models.unet import Unet
    model = Unet(dim=8, dim_mults=(1, 2), channels=2, dual_time=True)
    params = {"model": model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 4, 4, 2)), jnp.zeros((2,)),
        {"class_cond": None, "mask_cond": None})}
    apply_fn = lambda p, x, t, c: model.apply(p, x, t, c)
    tx = make_flow_optimizer(1e-3)
    s0 = create_flow_state(params, tx)
    step = make_flow_train_step(apply_fn, tx, donate=False, meanflow=True,
                                meanflow_ratio=0.5)
    batch = {"target": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 2))}
    s1, a1 = step(s0, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(a1["loss"]))
    assert np.isfinite(float(a1["loss_meanflow_raw"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s0.params, s1.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    s2, a2 = step(s0, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(float(a1["loss"]), float(a2["loss"]))
    with pytest.raises(ValueError):
        make_flow_train_step(apply_fn, tx, meanflow=True,
                             curvature_weight=1.0)


def test_meanflow_sharded_mesh():
    """The meanflow loss (jvp inside loss_fn) composes with the shard_map
    multi-chip path: finite loss on a 4-device mesh, params move."""
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    apply_fn, params = _tiny_model()
    tx = make_flow_optimizer(1e-2)
    mesh = make_mesh(n_data=4)
    step = make_flow_train_step(apply_fn, tx, donate=False, mesh=mesh,
                                meanflow=True, meanflow_ratio=0.5)
    state = create_flow_state(params, tx)
    rng = np.random.default_rng(7)
    batch = shard_batch(mesh, {
        "target": rng.standard_normal((8, 4, 4, 2)).astype(np.float32)})
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["loss_meanflow_raw"]))
