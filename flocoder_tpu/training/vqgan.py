"""VQGAN codec training: jitted two-phase (warmup → GAN) steps.

Reference hot loop: train_vqgan.py:170-268 — warmup phase trains
reconstruction-only (:194-210); the GAN phase alternates a discriminator step
(hinge loss, separate Adam at lr·0.001, :142-143, :220-233) with a generator
step whose loss adds `lambda_gen`·(non-saturating hinge + feature matching)
(:236-246); gradients clipped at 1.0 throughout.

TPU-first: each phase is ONE jitted function — generator fwd (encoder → RVQ →
decoder), all losses, both optimizers, the RVQ EMA codebook fold and the
spectral-norm power iterations run inside the same XLA executable. Warmup vs
GAN are two compiled variants selected on the host per epoch (no traced
branching on epoch). RVQ cluster statistics psum over the 'data' axis when
the step runs under shard_map (axis_name plumbed through).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..metrics import (compute_vqgan_losses, get_total_vqgan_loss,
                       hinge_d_loss, feature_matching_loss, lecam_loss)

__all__ = ["VQGANState", "create_vqgan_state", "make_vqgan_optimizers",
           "make_vqgan_warmup_step", "make_vqgan_gan_step",
           "make_vqgan_eval_step"]


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
class VQGANState:
    params: Any        # {'encoder', 'decoder', 'vq': RVQState}
    opt_g: Any
    disc_vars: Any     # {'params': ..., 'batch_stats': ...} or None
    opt_d: Any
    step: jax.Array


def make_vqgan_optimizers(learning_rate: float, d_lr_scale: float = 1e-3,
                          grad_clip: float = 1.0):
    """Generator Adam + discriminator Adam at lr·d_lr_scale
    (reference: train_vqgan.py:141-143)."""
    tx_g = optax.chain(optax.clip_by_global_norm(grad_clip),
                       optax.adam(learning_rate))
    tx_d = optax.chain(optax.clip_by_global_norm(grad_clip),
                       optax.adam(learning_rate * d_lr_scale))
    return tx_g, tx_d


def _resolve_axis(mesh, axis_name):
    """When a mesh is supplied and no explicit axis_name, the batch axes of
    the mesh (('dcn','data') multi-slice, 'data' otherwise)."""
    if mesh is not None and axis_name is None:
        from ..parallel.mesh import batch_axis_names
        return batch_axis_names(mesh)
    return axis_name


def _mesh_wrap(step_fn, mesh, axis_name, donate):
    """shard_map a (state, batch, rng) -> (state, aux, idx) codec train step
    over the mesh: batch sharded on dim 0, state/rng replicated, per-sample
    VQ indices returned sharded. Gradients/metrics are pmean'd and RVQ stats
    psum'd INSIDE step_fn (axis_name is threaded), so state outputs are
    replicated by construction."""
    from flocoder_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=(P(), P(), P(axis_name)),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def _split_micro(batch, rng, grad_accum: int):
    """Slice a (per-shard) batch into ``grad_accum`` leading microbatches and
    derive one rng per microbatch. Raises when the batch doesn't divide."""
    lead = (next(iter(batch.values())).shape[0] if isinstance(batch, dict)
            else batch.shape[0])
    if lead % grad_accum:
        raise ValueError(f"(per-shard) batch size {lead} is not divisible "
                         f"by grad_accum={grad_accum}")
    micro = jax.tree_util.tree_map(
        lambda a: a.reshape((grad_accum, lead // grad_accum) + a.shape[1:]),
        batch)
    return micro, jax.random.split(rng, grad_accum)


def _g_trainable(params: dict) -> dict:
    """Encoder+decoder leaves get gradients; the RVQ state updates via EMA,
    not the optimizer."""
    return {"encoder": params["encoder"], "decoder": params["decoder"]}


def create_vqgan_state(params: dict, tx_g, disc_vars=None, tx_d=None
                       ) -> VQGANState:
    return VQGANState(
        params=params, opt_g=tx_g.init(_g_trainable(params)),
        disc_vars=disc_vars,
        opt_d=(tx_d.init(disc_vars["params"]) if disc_vars is not None
               else None),
        step=jnp.zeros((), jnp.int32))


def _generator_loss_fn(codec, config, perceptual_fn, disc_apply,
                       use_gan: bool, axis_name):
    def loss_fn(g_params, vq_state, disc_vars, batch, rng):
        params = {**g_params, "vq": vq_state}
        recon, commit_loss, idx, new_vq = codec.forward(
            params, batch, train=True, rng=rng, axis_name=axis_name)
        disc_fn = None
        disc_params = None
        if use_gan and disc_vars is not None:
            def disc_fn(dv, x):
                return _disc_apply_frozen(disc_apply, dv, x)
            disc_params = disc_vars
        losses = compute_vqgan_losses(
            recon, batch, commit_loss, config, perceptual_fn=perceptual_fn,
            disc_apply=disc_fn, disc_params=disc_params, warmed_up=use_gan)
        total = get_total_vqgan_loss(losses, config)
        return total, (losses, recon, idx, new_vq)
    return loss_fn


def _disc_apply_frozen(disc_apply, disc_vars, x):
    """Discriminator forward without stat updates (generator's view)."""
    return disc_apply(disc_vars, x)


def make_vqgan_warmup_step(codec, tx_g, config,
                           perceptual_fn: Optional[Callable] = None,
                           axis_name: Optional[str] = None,
                           donate: Optional[bool] = None,
                           mesh=None, grad_accum: int = 1):
    """Reconstruction-only phase (reference: train_vqgan.py:194-210).

    ``mesh``: when given, the step runs under ``shard_map`` with the batch
    sharded over the mesh's data axes — gradients pmean-reduced and the RVQ
    codebook EMA statistics psum-reduced over ICI (SURVEY §2d's one genuine
    cross-device communication requirement).

    ``grad_accum``: microbatch gradient accumulation (a capability the
    reference lacks — its 128² batch is HBM-bound). The (per-shard) batch is
    split into ``grad_accum`` slices; a ``lax.scan`` accumulates generator
    gradients while the RVQ EMA state and codebook statistics CHAIN through
    the microbatches (the EMA fold runs per microbatch — same statistics a
    run at batch B/grad_accum would gather, with one optimizer update per
    full batch). Activation memory scales with B/grad_accum."""
    if donate is None:
        donate = _default_donate()
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    axis_name = _resolve_axis(mesh, axis_name)
    loss_fn = _generator_loss_fn(codec, config, perceptual_fn, None,
                                 use_gan=False, axis_name=axis_name)

    def step_fn(state: VQGANState, batch, rng):
        if grad_accum > 1:
            g_params = _g_trainable(state.params)
            micro, keys = _split_micro(batch, rng, grad_accum)

            def micro_out(vq, sub, k):
                return jax.value_and_grad(loss_fn, has_aux=True)(
                    g_params, vq, None, sub, k)

            sub0 = jax.tree_util.tree_map(lambda a: a[0], micro)
            shp = jax.eval_shape(micro_out, state.params["vq"], sub0, keys[0])
            (t_shp, (l_shp, _, _, _)), g_shp = shp
            zeros = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree)

            def body(carry, xs):
                vq, gsum, lsum, tsum = carry
                sub, k = xs
                (tot, (ls, _recon, idx, new_vq)), g = micro_out(vq, sub, k)
                return (new_vq,
                        jax.tree_util.tree_map(jnp.add, gsum, g),
                        jax.tree_util.tree_map(jnp.add, lsum, ls),
                        tsum + tot), idx

            (new_vq, gsum, lsum, tsum), idx_stack = jax.lax.scan(
                body, (state.params["vq"], zeros(g_shp), zeros(l_shp),
                       zeros(t_shp)), (micro, keys))
            grads = jax.tree_util.tree_map(lambda x: x / grad_accum, gsum)
            losses = jax.tree_util.tree_map(lambda x: x / grad_accum, lsum)
            total = tsum / grad_accum
            idx = idx_stack.reshape((-1,) + idx_stack.shape[2:])
        else:
            (total, (losses, recon, idx, new_vq)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(_g_trainable(state.params),
                                       state.params["vq"], None, batch, rng)
        aux = {k: v for k, v in losses.items()}
        aux["total"] = total
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
        updates, opt_g = tx_g.update(grads, state.opt_g,
                                     _g_trainable(state.params))
        g_new = optax.apply_updates(_g_trainable(state.params), updates)
        params = {**g_new, "vq": new_vq}
        new_state = VQGANState(params=params, opt_g=opt_g,
                               disc_vars=state.disc_vars, opt_d=state.opt_d,
                               step=state.step + 1)
        return new_state, aux, idx

    if mesh is not None:
        return _mesh_wrap(step_fn, mesh, axis_name, donate)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_vqgan_gan_step(codec, tx_g, disc, disc_apply_train, disc_apply_eval,
                        tx_d, config,
                        perceptual_fn: Optional[Callable] = None,
                        axis_name: Optional[str] = None,
                        donate: Optional[bool] = None,
                        lecam_weight: float = 0.0,
                        mesh=None, grad_accum: int = 1):
    """GAN phase: D step then G step in one executable
    (reference: train_vqgan.py:213-246). ``mesh``: shard_map over the data
    axes — D and G gradients pmean'd, RVQ stats psum'd (see warmup step).

    ``disc_apply_train(vars, x) -> ((logits, feats), new_vars)`` advances the
    spectral-norm power iteration; ``disc_apply_eval(vars, x) -> (logits,
    feats)`` does not. ``lecam_weight > 0`` adds LeCAM regularization to the
    D loss (reference: VQGANPlusAdversarialLoss, vqgan_plus.py:288-299 —
    inactive in the reference's live trainer, selectable here via the
    ``lecam_weight`` config key).

    ``codec.share_real_features=true`` reuses the D step's real-image
    feature maps as the G step's feature-matching targets instead of
    re-running the discriminator on the real batch with the just-updated
    D (reference semantics, train_vqgan.py:236-246). The targets are
    stop-gradient constants either way; sharing makes them one Adam step
    stale but drops one of the step's four discriminator forwards.
    Default false (reference-exact).

    ``grad_accum``: microbatch gradient accumulation for effective batches
    beyond HBM (the 128² GAN step fits B≈64 on a v5e chip; grad_accum=4
    trains an effective B=256). ONE ``lax.scan`` pass per step keeps the
    vjp trick: each microbatch contributes D gradients AND G gradients, the
    RVQ EMA state + spectral-norm power-iteration vectors chain through the
    scan, then one D update and one G update apply the means. Semantic
    divergence (documented): the G adversarial/feature terms see the
    PRE-update discriminator (simultaneous GAN update) instead of the
    just-updated one (alternating, the grad_accum=1 path) — the D update
    cannot happen mid-scan without splitting the pass in two and recomputing
    every codec forward. Both schemes are standard GAN updates; at
    grad_accum=1 the step is bit-identical to before."""
    if donate is None:
        donate = _default_donate()
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    axis_name = _resolve_axis(mesh, axis_name)
    share_real_features = bool(config.codec.get("share_real_features", False))

    def accum_step_fn(state: VQGANState, batch, rng):
        params = state.params
        g_params = _g_trainable(params)
        micro, keys = _split_micro(batch, rng, grad_accum)

        def micro_terms(vq, dvars, sub, k):
            """One microbatch: codec forward (vjp saved), D grads on the
            carried disc, G grads pulled back through the saved vjp against
            the same (pre-update) disc with advanced power-iteration stats."""
            def forward_fn(gp):
                recon, commit, idx, new_vq = codec.forward(
                    {**gp, "vq": vq}, sub, train=True, rng=k,
                    axis_name=axis_name)
                return (recon, commit), (idx, new_vq)

            (recon, commit), vjp_fn, (idx, new_vq) = jax.vjp(
                forward_fn, g_params, has_aux=True)
            fake = jax.lax.stop_gradient(recon)

            def d_loss_fn(d_params):
                dv = {**dvars, "params": d_params}
                (real_pred, real_features), new_vars = disc_apply_train(dv,
                                                                        sub)
                (fake_pred, _), new_vars = disc_apply_train(new_vars | {
                    "params": d_params}, fake)
                d_loss = hinge_d_loss(real_pred, fake_pred)
                if lecam_weight > 0:
                    d_loss = d_loss + lecam_loss(real_pred, fake_pred,
                                                 lecam_weight)
                return d_loss, (new_vars, real_features)

            (d_loss, (new_vars, real_features)), d_grads = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(dvars["params"])
            g_disc_vars = {**new_vars, "params": dvars["params"]}

            def g_loss_on_outputs(recon, commit):
                disc_fn = lambda dv, x: disc_apply_eval(dv, x)
                losses = compute_vqgan_losses(
                    recon, sub, commit, config, perceptual_fn=perceptual_fn,
                    disc_apply=disc_fn, disc_params=g_disc_vars,
                    warmed_up=True, report_d_loss=False,
                    real_features=(jax.lax.stop_gradient(real_features)
                                   if share_real_features else None))
                return get_total_vqgan_loss(losses, config), losses

            (total, losses), (d_recon, d_commit) = jax.value_and_grad(
                g_loss_on_outputs, argnums=(0, 1), has_aux=True)(recon,
                                                                 commit)
            (g_grads,) = vjp_fn((d_recon, d_commit))
            stats_vars = {**new_vars, "params": dvars["params"]}
            losses = dict(losses)
            losses["total"] = total
            losses["d_loss"] = d_loss
            return new_vq, stats_vars, g_grads, d_grads, losses, idx

        sub0 = jax.tree_util.tree_map(lambda a: a[0], micro)
        shp = jax.eval_shape(micro_terms, params["vq"], state.disc_vars,
                             sub0, keys[0])
        _, _, gg_shp, dg_shp, l_shp, _ = shp
        zeros = lambda tree: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

        def body(carry, xs):
            vq, dvars, ggsum, dgsum, lsum = carry
            sub, k = xs
            new_vq, stats_vars, gg, dg, ls, idx = micro_terms(vq, dvars,
                                                              sub, k)
            return (new_vq, stats_vars,
                    jax.tree_util.tree_map(jnp.add, ggsum, gg),
                    jax.tree_util.tree_map(jnp.add, dgsum, dg),
                    jax.tree_util.tree_map(jnp.add, lsum, ls)), idx

        (new_vq, stats_vars, ggsum, dgsum, lsum), idx_stack = jax.lax.scan(
            body, (params["vq"], state.disc_vars, zeros(gg_shp),
                   zeros(dg_shp), zeros(l_shp)), (micro, keys))
        g_grads = jax.tree_util.tree_map(lambda x: x / grad_accum, ggsum)
        d_grads = jax.tree_util.tree_map(lambda x: x / grad_accum, dgsum)
        aux = jax.tree_util.tree_map(lambda x: x / grad_accum, lsum)
        idx = idx_stack.reshape((-1,) + idx_stack.shape[2:])

        if axis_name is not None:
            g_grads = jax.lax.pmean(g_grads, axis_name)
            d_grads = jax.lax.pmean(d_grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
            # pmean only the mutated stats collections (SN power-iteration
            # vectors), mirroring the baseline step's new_disc_vars
            # handling — the 'params' entry is replicated and replaced
            # below, so all-reducing every D weight per step would be a
            # pure ICI cost for a value no-op (ADVICE r3)
            stats_vars = {**stats_vars, **jax.lax.pmean(
                {k: v for k, v in stats_vars.items() if k != "params"},
                axis_name)}
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d,
                                       state.disc_vars["params"])
        d_params_new = optax.apply_updates(state.disc_vars["params"],
                                           d_updates)
        disc_vars = {**stats_vars, "params": d_params_new}
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, g_params)
        g_new = optax.apply_updates(g_params, g_updates)
        new_state = VQGANState(params={**g_new, "vq": new_vq}, opt_g=opt_g,
                               disc_vars=disc_vars, opt_d=opt_d,
                               step=state.step + 1)
        return new_state, aux, idx

    def step_fn(state: VQGANState, batch, rng):
        params = state.params
        g_params = _g_trainable(params)

        # ONE codec forward, with its pullback captured — both the D step's
        # fake images and the G step's loss reuse it. The reference (and the
        # naive formulation) run the generator forward twice per batch
        # (train_vqgan.py:220-246); the vjp trick halves that at identical
        # gradients: D-step order and the updated-disc G loss are preserved.
        def forward_fn(gp):
            recon, commit, idx, new_vq = codec.forward(
                {**gp, "vq": params["vq"]}, batch, train=True, rng=rng,
                axis_name=axis_name)
            return (recon, commit), (idx, new_vq)

        (recon, commit), vjp_fn, (idx, new_vq) = jax.vjp(
            forward_fn, g_params, has_aux=True)

        # ---- D step (reference: train_vqgan.py:220-233) -------------------
        fake = jax.lax.stop_gradient(recon)

        def d_loss_fn(d_params):
            dv = {**state.disc_vars, "params": d_params}
            (real_pred, real_features), new_vars = disc_apply_train(dv, batch)
            (fake_pred, _), new_vars = disc_apply_train(new_vars | {
                "params": d_params}, fake)
            d_loss = hinge_d_loss(real_pred, fake_pred)
            if lecam_weight > 0:
                d_loss = d_loss + lecam_loss(real_pred, fake_pred,
                                             lecam_weight)
            return d_loss, (new_vars, real_features)

        (d_loss, (new_disc_vars, real_features)), d_grads = \
            jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.disc_vars["params"])
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
            d_loss = jax.lax.pmean(d_loss, axis_name)
            # batch_stats (SN power-iteration vectors) averaged across shards
            # so the replicated disc state stays identical on every device
            new_disc_vars = jax.lax.pmean(new_disc_vars, axis_name)
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d,
                                       state.disc_vars["params"])
        d_params_new = optax.apply_updates(state.disc_vars["params"],
                                           d_updates)
        disc_vars = {**new_disc_vars, "params": d_params_new}

        # ---- G step (reference: train_vqgan.py:236-246): loss on the SAME
        # recon with the just-updated discriminator; grads pull back through
        # the saved vjp.
        def g_loss_on_outputs(recon, commit):
            disc_fn = lambda dv, x: disc_apply_eval(dv, x)
            # report_d_loss=False: aux["d_loss"] below reports the D step's
            # own loss, so the monitoring hinge recomputation (one extra disc
            # forward on stop-grad fake) is skipped.
            losses = compute_vqgan_losses(
                recon, batch, commit, config, perceptual_fn=perceptual_fn,
                disc_apply=disc_fn, disc_params=disc_vars, warmed_up=True,
                report_d_loss=False,
                real_features=(jax.lax.stop_gradient(real_features)
                               if share_real_features else None))
            return get_total_vqgan_loss(losses, config), losses

        (total, losses), (d_recon, d_commit) = jax.value_and_grad(
            g_loss_on_outputs, argnums=(0, 1), has_aux=True)(recon, commit)
        (g_grads,) = vjp_fn((d_recon, d_commit))
        aux = {k: v for k, v in losses.items()}
        aux["total"] = total
        if axis_name is not None:
            g_grads = jax.lax.pmean(g_grads, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, g_params)
        g_new = optax.apply_updates(g_params, g_updates)

        new_state = VQGANState(params={**g_new, "vq": new_vq}, opt_g=opt_g,
                               disc_vars=disc_vars, opt_d=opt_d,
                               step=state.step + 1)
        aux["d_loss"] = d_loss
        return new_state, aux, idx

    if grad_accum > 1:
        step_fn = accum_step_fn
    if mesh is not None:
        return _mesh_wrap(step_fn, mesh, axis_name, donate)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_vqgan_eval_step(codec, config,
                         perceptual_fn: Optional[Callable] = None):
    """Validation reconstruction + losses, deterministic
    (reference: train_vqgan.py:274-327)."""

    @jax.jit
    def eval_fn(params, batch):
        recon, commit_loss, idx, _ = codec.forward(params, batch, train=False)
        losses = compute_vqgan_losses(recon, batch, commit_loss, config,
                                      perceptual_fn=perceptual_fn)
        losses["total"] = get_total_vqgan_loss(losses, config)
        return recon, losses, idx

    return eval_fn
