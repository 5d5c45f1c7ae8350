"""Flow-matching training: jitted train/eval steps.

Reference hot loop: train_flow.py:331-397 with batch prep in
``batch_to_data`` (train_flow.py:90-182). TPU-first redesign: the ENTIRE step
— noise draw, inpainting mask encoding + blending, on-device OT pairing, CFG
conditioning dropout, time-warped interpolation, U-Net fwd/bwd, gradient
clipping, Adam update, and the EMA update — is one jitted function with the
state donated, so a training step is a single XLA executable with zero host
round-trips (the reference does OT pairing in a Python loop and EMA on CPU
every step, train_flow.py:33-71, ot.py:70-78).

Conditioning-dropout semantics (reference train_flow.py:344-346): with p=0.1
per step the whole batch goes unconditional — class ids become the null token
(-1), the inpainting mask becomes all-ones (which the U-Net bypasses,
unet.py:301), and the source is resampled from fresh noise.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.ot import compute_ot_pairing
from ..sampling import warp_time
from .ema import ema_init, ema_update

__all__ = ["FlowState", "create_flow_state", "make_flow_train_step",
           "make_flow_eval_step", "make_flow_optimizer", "meanflow_target",
           "make_flow_grads_fn"]


def meanflow_target(model_apply: Callable, params, x_r, r, t_h, v_star,
                    cond: Optional[dict], t_scale: float = 999.0):
    """MeanFlow (average-velocity) regression pair — returns ``(u, u_tgt)``.

    The average-velocity field u(x_r, r, t) ≝ (1/(t−r))·∫_r^t v(x_s, s) ds
    (Geng et al., "Mean Flows for One-step Generative Modeling",
    arXiv:2505.13447 — the reference's last open research TODO,
    README.md:158). Differentiating (t−r)·u = ∫_r^t v ds in r (t fixed,
    x_r moving along the path with ẋ_r = v) gives the MeanFlow identity

        u(x_r, r, t) = v(x_r, r) + (t − r) · d/dr u(x_r, r, t),

    so the regression target is ``u_tgt = v_star + (t−r)·du/dr`` with the
    total derivative du/dr = ∂u/∂r + (∂u/∂x)·v_star taken by ONE
    forward-mode jvp (tangents (v_star, 1) on (x, r); the horizon input
    rides in ``cond['time_horizon']`` with tangent 0). At r = t this
    collapses to u_tgt = v_star — plain flow matching. The caller applies
    ``stop_gradient`` to u_tgt (the paper's semi-gradient)."""
    cond_h = dict(cond) if cond else {}
    cond_h["time_horizon"] = t_h * t_scale

    def ufun(xx, rr):
        return model_apply(params, xx, rr * t_scale, cond_h)

    u, du_dr = jax.jvp(ufun, (x_r, r), (v_star, jnp.ones_like(r)))
    u_tgt = v_star + (t_h - r)[:, None, None, None] * du_dr
    return u, u_tgt


def _default_donate() -> bool:
    """Buffer donation is the TPU fast path (in-place state updates in HBM),
    but it is disabled by default on two platforms where it misbehaves:
    - virtual multi-device CPU: donation trips an XLA CPU collective
      rendezvous abort;
    - the experimental 'axon' single-chip tunnel: donated executables
      intermittently fail with opaque INVALID_ARGUMENT after the first
      program in a process (docs/ROADMAP.md gotchas).
    Real TPU runtimes keep donation on."""
    import jax as _jax
    if _jax.default_backend() != "tpu":
        return False
    return "axon" not in str(_jax.config.jax_platforms or "")



@struct.dataclass
class FlowState:
    params: Any            # {'model': ..., 'mask_encoder': Optional[...]}
    opt_state: Any
    ema: Any
    step: jax.Array


def make_flow_optimizer(learning_rate, mask_encoder: bool = False,
                        grad_clip: float = 1.0, mask_grad_clip: float = 0.5,
                        mask_lr_scale: float = 0.1):
    """Adam with per-group LR and clipping (reference: train_flow.py:311-319,
    392-394: mask-encoder group at 0.1× LR, clip 1.0 / 0.5)."""
    def scale_lr(s):
        if callable(learning_rate):
            return lambda count: learning_rate(count) * s
        return learning_rate * s

    model_tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                           optax.adam(scale_lr(1.0)))
    if not mask_encoder:
        return model_tx
    mask_tx = optax.chain(optax.clip_by_global_norm(mask_grad_clip),
                          optax.adam(scale_lr(mask_lr_scale)))
    return optax.multi_transform(
        {"model": model_tx, "mask": mask_tx},
        param_labels={"model": "model", "mask_encoder": "mask"})


def create_flow_state(params: dict, tx) -> FlowState:
    return FlowState(params=params, opt_state=tx.init(params),
                     ema=ema_init(params), step=jnp.zeros((), jnp.int32))


def _interp(source, target, t):
    te = t[:, None, None, None]
    return (1 - te) * source + te * target


def make_flow_grads_fn(model_apply: Callable,
                       mask_encoder_apply: Optional[Callable] = None,
                       eps: float = 1e-3,
                       warp_s: float = 0.5, t_scale: float = 999.0,
                       use_ot: bool = True,
                       mask_identity_weight: float = 1.0,
                       encode_fn: Optional[Callable] = None,
                       axis_name: Optional[str] = None,
                       ot_method: str = "parallel",
                       ot_block: Optional[int] = None,
                       blank_latents: Optional[jax.Array] = None,
                       otf_aug: Optional[dict] = None,
                       paired_source: bool = False,
                       curvature_weight: float = 0.0,
                       meanflow: bool = False,
                       meanflow_ratio: float = 0.25,
                       meanflow_adaptive_p: float = 0.5):
    """Build the per-(micro)batch gradient function of the flow objective:
    ``grads_fn(params, step_ctr, batch, rng, drop) -> ((loss, aux), grads)``.

    This is the loss core of :func:`make_flow_train_step`, factored out so
    gradient accumulation (``grad_accum`` below) can scan it over microbatch
    slices — and so tests can verify bit-exactly that an accumulated step's
    update equals the mean of the per-microbatch gradients. ``drop`` is the
    batch-global CFG-dropout gate (drawn once per OPTIMIZER step by the
    caller, reference train_flow.py:344-346); ``rng`` covers the remaining
    draws (noise, t, CFG resample, OTF selection). ``step_ctr`` drives the
    on-device OTF curriculum schedule."""

    def grads_fn(params, step_ctr, batch: dict, rng: jax.Array,
                 drop: jax.Array):
        if encode_fn is not None and "pixels" in batch:
            target_in = jax.lax.stop_gradient(encode_fn(batch["pixels"]))
        else:
            target_in = batch["target"]
        class_cond_in = batch.get("class_cond")
        B = target_in.shape[0]
        k_noise, k_cfgnoise, k_t, k_otf = jax.random.split(rng, 4)
        if axis_name is not None:
            # distinct noise per shard; the gate (`drop`) stays global so the
            # whole (global) batch drops conditioning together. axis_name
            # may be a tuple (('dcn','data') on multi-slice meshes) — fold
            # in the combined linear shard index.
            names = ((axis_name,) if isinstance(axis_name, str)
                     else tuple(axis_name))
            ax = jnp.zeros((), jnp.int32)
            for nm in names:
                ax = ax * jax.lax.psum(1, nm) + jax.lax.axis_index(nm)
            k_noise = jax.random.fold_in(k_noise, ax)
            k_cfgnoise = jax.random.fold_in(k_cfgnoise, ax)
            k_t = jax.random.fold_in(k_t, ax)
            k_otf = jax.random.fold_in(k_otf, ax)
        noise = jax.random.normal(k_noise, target_in.shape, target_in.dtype)

        t = jax.random.uniform(k_t, (B,), target_in.dtype) * (1 - eps) + eps
        t = warp_time(t, s=warp_s)  # (reference: train_flow.py:350-351)

        inpainting = mask_encoder_apply is not None and "mask_pixels" in batch

        def loss_fn(params):
            target = target_in
            if inpainting:
                mask_pixels = batch["mask_pixels"].astype(target.dtype)
                src = batch["source"]
                if otf_aug is not None:
                    # curriculum schedule on the traced step counter
                    # (reference: train_flow.py:128-140)
                    ce = float(otf_aug.get("curriculum_epochs", 0))
                    ee = float(otf_aug.get("extend_epochs", 0))
                    p1f = float(otf_aug.get("p_ones", 0.0))
                    p0f = float(otf_aug.get("p_zeros", 0.0))
                    spe = max(int(otf_aug.get("steps_per_epoch", 1)), 1)
                    ep = (step_ctr // spe + 1).astype(jnp.float32)
                    prog = jnp.clip((ep - ce) / jnp.maximum(ee - ce, 1.0),
                                    0.0, 1.0)
                    p_ones = jnp.where(
                        ep <= ce,
                        (ce - (ep - 1.0)) / jnp.maximum(ce, 1.0),
                        jnp.where(ep <= ee, 0.1 + 0.2 * prog, p1f))
                    p_zeros = jnp.where(ep <= ce, 0.0,
                                        jnp.where(ep <= ee, 0.02 * prog, p0f))
                    # exact-count selection: rank-threshold over a random
                    # permutation (reference otf_gen_aug_indices,
                    # train_flow.py:74-86)
                    rank = jax.random.permutation(k_otf, B).astype(jnp.float32)
                    n1 = jnp.floor(p_ones * B)
                    n0 = jnp.floor(p_zeros * B)
                    sel1 = (rank < n1)[:, None, None, None]
                    sel0 = ((rank >= n1) & (rank < n1 + n0))[:, None, None,
                                                             None]
                    mask_pixels = jnp.where(sel1, 1.0, mask_pixels)
                    mask_pixels = jnp.where(sel0, 0.0, mask_pixels)
                    if blank_latents is not None:
                        src = jnp.where(sel1,
                                        blank_latents.astype(src.dtype), src)
                    src = jnp.where(sel0, target, src)
                mask = mask_encoder_apply(params["mask_encoder"], mask_pixels)
                # mask blending: source + mask*(noise - source)
                # (reference: inpainting.py:250-253, train_flow.py:156-158)
                source = src + mask * (noise - src)
            elif paired_source:
                # reflow: the batch's stored noise IS the source; the
                # (source, target) coupling must survive intact
                mask = None
                source = batch["source"].astype(target.dtype)
            else:
                mask = None
                source = noise

            # CFG dropout: batch-wide gate (reference: train_flow.py:344-346)
            if class_cond_in is not None:
                class_cond = jnp.where(drop, -jnp.ones_like(class_cond_in),
                                       class_cond_in)
            else:
                class_cond = None
            if not paired_source:
                source = jnp.where(drop,
                                   jax.random.normal(k_cfgnoise, source.shape,
                                                     source.dtype), source)
            if mask is not None:
                mask = jnp.where(drop, jnp.ones_like(mask), mask)

            if use_ot and not paired_source:
                # Minibatch-OT target pairing, on device
                # (reference: train_flow.py:163-166). Divergence from the
                # reference (documented): the class label is permuted WITH its
                # target — the reference leaves labels behind, silently
                # decoupling class conditioning from the paired target.
                # ot_method='parallel' (default): propose-accept rounds,
                # ≤2% transport-cost delta vs the sequential oracle at a
                # fraction of the latency (ops/ot.py); 'greedy' = reference
                # row-ordered semantics. ot_block (config flow.ot_block):
                # pair within aligned sub-batches of that size — the
                # large-batch O(B²)→O(B·block) cost knob.
                idx = compute_ot_pairing(jax.lax.stop_gradient(source),
                                         jax.lax.stop_gradient(target),
                                         method=ot_method, block=ot_block)
                target = target[idx]
                if class_cond is not None:
                    class_cond = class_cond[idx]

            if meanflow:
                # sample the second time: r ~ U(0, t) for a meanflow_ratio
                # fraction of the batch, r = t (plain FM) for the rest; keys
                # derived by fold_in so existing rng streams are untouched
                k_r = jax.random.fold_in(k_t, 1)
                k_sel = jax.random.fold_in(k_t, 2)
                r = t * jax.random.uniform(k_r, (B,), t.dtype)
                use_r = jax.random.uniform(k_sel, (B,), t.dtype) \
                    < meanflow_ratio
                r = jnp.where(use_r, r, t)
                x_r = _interp(source, target, r)
                v_star = target - source
                cond = {"class_cond": class_cond, "mask_cond": mask}
                u, u_tgt = meanflow_target(model_apply, params["model"],
                                           x_r, r, t, v_star, cond, t_scale)
                err = u - jax.lax.stop_gradient(u_tgt)
                sq = jnp.mean(err ** 2, axis=(1, 2, 3))
                if meanflow_adaptive_p:
                    w = jax.lax.stop_gradient(
                        (sq + 1e-3) ** (-meanflow_adaptive_p))
                    loss = jnp.mean(w * sq)
                else:
                    loss = jnp.mean(sq)
                aux = {"loss_flow": loss, "loss": loss,
                       "loss_meanflow_raw": jnp.mean(sq)}
                return loss, aux

            x = _interp(source, target, t)
            v_star = target - source
            cond = {"class_cond": class_cond, "mask_cond": mask}
            model_aux = None
            if curvature_weight:
                # total path derivative dv/dt = ∂v/∂t + (∂v/∂x)·ẋ with
                # ẋ = v_star along the interpolation; one jvp returns v too
                # (t_scale rides inside, so the tangent is in natural t)
                prim, tang = jax.jvp(
                    lambda xx, tt: model_apply(params["model"], xx,
                                               tt * t_scale, cond),
                    (x, t), (v_star, jnp.ones_like(t)))
                if isinstance(prim, tuple):   # (v, model_aux_loss) contract
                    (v, model_aux), dv_dt = prim, tang[0]
                else:
                    v, dv_dt = prim, tang
            else:
                v = model_apply(params["model"], x, t * t_scale, cond)
                if isinstance(v, tuple):      # (v, model_aux_loss) contract
                    v, model_aux = v
            loss = jnp.mean((v - v_star) ** 2)

            aux = {"loss_flow": loss}
            if model_aux is not None:
                # model-internal auxiliary loss (e.g. the MoE load-balance
                # + router-z term, models/hdit.py:MoEFeedForwardBlock)
                loss = loss + model_aux
                aux["loss_model_aux"] = model_aux
            if curvature_weight:
                curv = jnp.mean(dv_dt ** 2)
                loss = loss + curvature_weight * curv
                aux["loss_curvature"] = curv
            if inpainting and mask_identity_weight:
                # 0/1 identity regularizer (reference: train_flow.py:362-371)
                ones_in = jnp.ones_like(batch["mask_pixels"], target.dtype)
                zeros_in = jnp.zeros_like(ones_in)
                m1 = mask_encoder_apply(params["mask_encoder"], ones_in)
                m0 = mask_encoder_apply(params["mask_encoder"], zeros_in)
                mask_loss = jnp.mean((m1 - 1.0) ** 2) + jnp.mean(m0 ** 2)
                loss = loss + mask_identity_weight * mask_loss
                aux["loss_mask"] = mask_loss
            aux["loss"] = loss
            return loss, aux

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    return grads_fn


def make_flow_train_step(model_apply: Callable, tx,
                         mask_encoder_apply: Optional[Callable] = None,
                         cfg_dropout: float = 0.1, eps: float = 1e-3,
                         warp_s: float = 0.5, t_scale: float = 999.0,
                         ema_decay: float = 0.999, use_ot: bool = True,
                         mask_identity_weight: float = 1.0,
                         remat: bool = False,
                         encode_fn: Optional[Callable] = None,
                         donate: Optional[bool] = None,
                         mesh=None, axis_name: Optional[str] = None,
                         steps_per_call: int = 1,
                         ot_method: str = "parallel",
                         ot_block: Optional[int] = None,
                         blank_latents: Optional[jax.Array] = None,
                         otf_aug: Optional[dict] = None,
                         paired_source: bool = False,
                         curvature_weight: float = 0.0,
                         meanflow: bool = False,
                         meanflow_ratio: float = 0.25,
                         meanflow_adaptive_p: float = 0.5,
                         grad_accum: int = 1):
    """Build the jitted train step.

    ``model_apply(params, x, t_vec, cond)`` and (optionally)
    ``mask_encoder_apply(params, mask_pixels)`` are pure functions.
    Batch: {'target': (B,H,W,C) latents, 'class_cond': (B,) int or absent,
    'source': source latents (inpainting), 'mask_pixels': (B,Hp,Wp,1)}.

    ``encode_fn(pixels) -> latents`` enables on-the-fly (non-pre-encoded)
    training: batches carry 'pixels' and the frozen codec's encode runs
    INSIDE the same XLA executable as the flow step (the reference's
    pre_encoded=False branch, train_flow.py:253-262, runs the codec in a
    separate host-driven pass).

    ``mesh``: when given, the step is built with ``shard_map`` over the
    mesh's 'data' axis with EXPLICIT shardings — batch sharded on the
    leading dim, params/optimizer/EMA replicated, gradients ``pmean``-reduced
    over ICI. OT pairing then runs PER SHARD (each device pairs only its own
    sub-batch — statistically equivalent minibatch-OT with ZERO cross-device
    gathers, vs. the global ``target[idx]`` gather the plain-jit path implies
    on a real mesh). Per-shard noise/t draws fold the axis index into the
    rng; the CFG dropout gate stays batch-global (reference semantics:
    train_flow.py:344-346 drops the whole batch).

    ``steps_per_call``: when >1 the returned function takes batches stacked
    on a leading (K, B, ...) axis and runs K optimizer steps in one
    ``lax.scan`` — one host dispatch per K steps. rng contract: the call key
    is split into K per-step keys, so K scanned steps reproduce K single
    steps fed ``jax.random.split(rng, K)[i]``.

    ``otf_aug``: inpainting curriculum + on-the-fly mask augmentation
    (reference: train_flow.py:126-160). A dict of STATIC floats/ints
    {'curriculum_epochs', 'extend_epochs', 'p_ones', 'p_zeros',
    'steps_per_epoch'} — the per-epoch (p_ones, p_zeros) schedule is
    computed ON DEVICE from ``state.step`` (epoch = step//steps_per_epoch+1)
    so nothing retraces as the curriculum ramps. Per step, a fraction
    p_ones of the batch becomes unconditional generation (mask:=1, source:=
    ``blank_latents`` — the encoded blank image, reference :275-279) and
    p_zeros becomes identity (mask:=0, source:=target); fractions are exact
    per shard via rank-threshold selection (the reference's host-side
    ``np.random.choice`` without replacement, train_flow.py:74-86).

    ``paired_source``: reflow/distillation mode (a capability the reference
    lacks — its README.md:147 lists "reflow" as future work). Batches carry a
    FIXED (source, target) coupling — e.g. (noise, model-generated sample)
    pairs from ``tools/make_reflow_pairs.py`` — so the step trains on the
    straightened path between them (Liu et al., Rectified Flow). The pairing
    is sacrosanct: OT re-pairing is skipped (it would scramble the coupling)
    and the CFG-dropout gate nulls the class token WITHOUT resampling the
    source (a resample would break the pair; an independent-coupling batch
    teaches nothing a reflow pass is for).

    ``curvature_weight``: path-straightness regularizer (the reference's
    open README.md:147 TODO "Straighter/OT paths: … Curvature penalty").
    Adds λ·E‖d v(x_t, t)/dt‖² along the training path — the total
    derivative ∂v/∂t + (∂v/∂x)·(target − source), computed with ONE
    forward-mode ``jax.jvp`` that also yields v itself (so the extra cost
    is ≈ one forward pass, no second backward pass). A field with zero
    path curvature integrates exactly in one Euler step, so this trains
    toward few-NFE serving in the base run (and composes with a reflow
    distillation pass).

    ``meanflow``: train the model as an AVERAGE-velocity field u(x, r, t)
    instead of an instantaneous one (see ``meanflow_target`` — the
    reference's README.md:158 'Mean Flows' research TODO). Requires a
    dual-time model (``Unet(dual_time=True)``). Per batch, a fraction
    ``meanflow_ratio`` of samples draws r ~ U(0, t) (the rest use r = t,
    which is exactly flow matching), the path point is interpolated at r,
    and the loss is ‖u − sg(u_tgt)‖² with the paper's adaptive weighting
    w = (‖err‖² + 1e-3)^(−meanflow_adaptive_p) (p=0 → plain MSE). One-step
    serving: ``generate_latents(method='meanflow', n_steps=1)``. Not
    combinable with curvature_weight or the inpainting mask path.
    Pass ``t_scale=1.0`` with meanflow (train_flow.py does): the identity
    target (t−r)·du/dr is O(1) only when the field is smooth in r, and the
    reference's t·999 embedding convention puts sin(999·ω·r) in the jvp
    path — measured raw target MSE 2.8e4 at init (vs 4.8 unscaled), which
    never trains down. Serve with the same t_scale.

    ``grad_accum``: microbatch gradient accumulation — a capability the
    reference lacks entirely (its effective batch is HBM-bound). The batch is
    split into ``grad_accum`` leading slices and a ``lax.scan`` accumulates
    per-microbatch gradients (mean), then ONE optimizer + EMA update runs —
    so activation memory scales with B/grad_accum while the update sees the
    full batch. Semantics: the CFG-dropout gate is drawn once per optimizer
    step (batch-global, reference-faithful); noise/t draws and OT pairing are
    per microbatch (i.e. minibatch-OT at size B/grad_accum — the same
    estimator the reference uses at its own batch size). Exactness is tested
    against :func:`make_flow_grads_fn` (tests/test_grad_accum.py). Composes
    with ``mesh`` (microbatching happens per shard) and ``steps_per_call``."""
    if meanflow and (curvature_weight or mask_encoder_apply is not None):
        raise ValueError("meanflow mode does not combine with "
                         "curvature_weight or the inpainting mask path")
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if remat:
        model_apply = jax.checkpoint(model_apply)
    if donate is None:
        donate = _default_donate()
    if mesh is not None and axis_name is None:
        # batch axes: ('dcn','data') on multi-slice meshes, 'data' otherwise
        from ..parallel.mesh import batch_axis_names
        axis_name = batch_axis_names(mesh)

    grads_fn = make_flow_grads_fn(
        model_apply, mask_encoder_apply=mask_encoder_apply, eps=eps,
        warp_s=warp_s, t_scale=t_scale, use_ot=use_ot,
        mask_identity_weight=mask_identity_weight, encode_fn=encode_fn,
        axis_name=axis_name, ot_method=ot_method, ot_block=ot_block,
        blank_latents=blank_latents, otf_aug=otf_aug,
        paired_source=paired_source, curvature_weight=curvature_weight,
        meanflow=meanflow, meanflow_ratio=meanflow_ratio,
        meanflow_adaptive_p=meanflow_adaptive_p)

    def step_fn(state: FlowState, batch: dict, rng: jax.Array):
        k_gate, k_body = jax.random.split(rng)
        drop = jax.random.uniform(k_gate) < cfg_dropout

        if grad_accum > 1:
            lead = next(iter(batch.values())).shape[0]
            if lead % grad_accum:
                raise ValueError(
                    f"(per-shard) batch size {lead} is not divisible by "
                    f"grad_accum={grad_accum}")
            micro = jax.tree_util.tree_map(
                lambda a: a.reshape((grad_accum, lead // grad_accum)
                                    + a.shape[1:]), batch)
            keys = jax.random.split(k_body, grad_accum)
            sub0 = jax.tree_util.tree_map(lambda a: a[0], micro)
            acc0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(grads_fn, state.params, state.step, sub0,
                               keys[0], drop))

            def body(acc, xs):
                sub, k = xs
                out = grads_fn(state.params, state.step, sub, k, drop)
                return jax.tree_util.tree_map(jnp.add, acc, out), None

            summed, _ = jax.lax.scan(body, acc0, (micro, keys))
            (loss, aux), grads = jax.tree_util.tree_map(
                lambda x: x / grad_accum, summed)
        else:
            (loss, aux), grads = grads_fn(state.params, state.step, batch,
                                          k_body, drop)
        if axis_name is not None:
            # the one collective of the step: grad (+scalar-metric) reduction
            # over ICI; the optimizer/EMA update then runs replicated.
            # vma-typed reduction: ring/sequence-parallel models leave grads
            # varying over 'model' too (value-identical — the pmean is a
            # typing no-op there), plain models only over the batch axes.
            from ..parallel.mesh import pmean_typed
            names = ((axis_name,) if isinstance(axis_name, str)
                     else tuple(axis_name))
            if mesh is not None:
                names += tuple(a for a in mesh.axis_names if a not in names)
            grads = pmean_typed(grads, names)
            aux = pmean_typed(aux, names)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_decay)
        new_state = FlowState(params=params, opt_state=opt_state, ema=ema,
                              step=state.step + 1)
        aux["grad_norm"] = optax.global_norm(grads)
        return new_state, aux

    if steps_per_call > 1:
        # Multi-step dispatch: scan the step over a leading micro-batch axis
        # so ONE host dispatch drives `steps_per_call` optimizer steps. On a
        # slow/1-core host the per-dispatch Python+pytree overhead dominates
        # the 4 ms jitted step (docs/BENCH_NOTES.md tpu_demo notes); the scan
        # amortizes it K×. Batch arrays carry shape (K, B, ...).
        inner = step_fn

        def step_fn(state: FlowState, superbatch: dict, rng: jax.Array):  # noqa: F811
            keys = jax.random.split(rng, steps_per_call)

            def body(s, xs):
                b, k = xs
                return inner(s, b, k)

            state, auxs = jax.lax.scan(body, state, (superbatch, keys))
            # report the last step's metrics plus the window-mean loss
            aux = jax.tree_util.tree_map(lambda a: a[-1], auxs)
            aux["loss_mean"] = jnp.mean(auxs["loss"])
            return state, aux

    if mesh is not None:
        from flocoder_tpu.parallel.mesh import shard_map
        from jax.sharding import PartitionSpec as P
        batch_spec = (P(None, axis_name) if steps_per_call > 1
                      else P(axis_name))
        sharded = shard_map(
            step_fn, mesh=mesh,
            in_specs=(P(), batch_spec, P()),     # state repl, batch sharded,
            out_specs=(P(), P()),                # rng repl → repl outputs
            check_rep=False)
        return jax.jit(sharded, donate_argnums=(0,) if donate else ())

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_flow_eval_step(model_apply: Callable,
                        mask_encoder_apply: Optional[Callable] = None,
                        eps: float = 1e-3, warp_s: float = 0.5,
                        t_scale: float = 999.0, use_ot: bool = True,
                        ot_method: str = "parallel",
                        paired_source: bool = False):
    """Validation loss on a batch (reference: train_flow.py:404-418), same
    interpolation path, no updates. Uses the given params (raw or EMA).
    ``paired_source`` mirrors the train step's reflow mode: the batch's
    stored (source, target) coupling is used verbatim, no OT re-pairing."""

    def eval_fn(params: dict, batch: dict, rng: jax.Array):
        target = batch["target"]
        class_cond = batch.get("class_cond")
        B = target.shape[0]
        k_noise, k_t = jax.random.split(rng)
        noise = jax.random.normal(k_noise, target.shape, target.dtype)
        if mask_encoder_apply is not None and "mask_pixels" in batch:
            mask_pixels = batch["mask_pixels"].astype(target.dtype)
            mask = mask_encoder_apply(params["mask_encoder"], mask_pixels)
            src = batch["source"]
            source = src + mask * (noise - src)
        elif paired_source:
            mask = None
            source = batch["source"].astype(target.dtype)
        else:
            mask = None
            source = noise
        if use_ot and not paired_source:
            idx = compute_ot_pairing(source, target, method=ot_method)
            target = target[idx]
            if class_cond is not None:
                class_cond = class_cond[idx]
        t = jax.random.uniform(k_t, (B,), target.dtype) * (1 - eps) + eps
        t = warp_time(t, s=warp_s)
        x = _interp(source, target, t)
        v_star = target - source
        v = model_apply(params["model"], x, t * t_scale,
                        {"class_cond": class_cond, "mask_cond": mask})
        return jnp.mean((v - v_star) ** 2)

    return jax.jit(eval_fn)
