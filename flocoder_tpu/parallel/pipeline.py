"""GPipe-style pipeline parallelism over a mesh axis.

New TPU-native capability (the reference is single-device — SURVEY.md §2d
has no parallelism of any kind): a microbatched activation pipeline for a
stack of STRUCTURALLY IDENTICAL blocks (params stacked on a leading
layer axis, the ``nn.scan`` layout), split into S stages over the mesh
'model' axis. Completes the parallelism family next to dp (shard_map),
tp (GSPMD channel sharding), sp (ring attention) and ep (MoE): pp is the
axis that scales DEPTH — when one chip cannot hold (or keep busy on) all
L blocks, each chip runs L/S of them and activations stream over ICI.

TPU-first design:
- the schedule is one ``lax.scan`` over T = M + S − 1 ticks with a single
  ``ppermute`` per tick (stage s → s+1) — a static, compiler-visible loop;
  no data-dependent control flow, every shape static.
- per tick each stage runs its L/S blocks back-to-back on one microbatch —
  large fused MXU work between collectives; the classic GPipe bubble
  (S−1)/(M+S−1) is the only idle time, so callers pick M ≥ 2·S.
- inputs/params arrive REPLICATED (the layout of the production shard_map
  train step); each stage statically slices its own L/S layer params by
  ``lax.axis_index`` and ONE ``psum`` broadcasts the last stage's outputs.
  The custom_vjp backward runs jax.vjp THROUGH the pipelined forward — the
  reverse schedule rides the transposed ppermutes, so backward compute is
  pipeline-parallel too — then one psum makes param/input cotangents full
  and value-identical on every shard (disjoint stage slices sum to the
  whole), the exact contract of ``ring_attention_replicated`` and
  ``moe_geglu_replicated``: the surrounding step's pmean is a typing no-op.

Used by ``models/hdit.py`` (``pp_stages``/``flow.hdit_pp_stages``) to
pipeline the mid-level block stack; serving replays the same stacked
params sequentially (``sequential_apply``) on one device.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pipeline_apply", "sequential_apply", "pipeline_tick_accounting"]


def pipeline_tick_accounting(axis_size: int, n_micro: int,
                             interleave: int = 1) -> dict:
    """Static schedule accounting (VERDICT r3 #5 done-criterion): tick
    count, wall-clock in full stage-tick units (one interleaved tick does
    1/v of a stage's work), bubble fraction, and the fraction of the L
    blocks each device computes as discarded ramp garbage.

    GPipe (interleave=1): M+S−1 ticks, bubble (S−1)/(M+S−1). Interleaved
    (v>1): v·M+S−1 chunk-ticks ≡ M+(S−1)/v stage-ticks — bubble and
    garbage both shrink by v."""
    S, M, v = axis_size, n_micro, interleave
    ticks = (v * M + S - 1) if v > 1 else (M + S - 1)
    wall = ticks / v
    return {
        "ticks": ticks,
        "wall_stage_ticks": wall,
        "bubble_fraction": (wall - M) / wall,
        "garbage_work_fraction": (S - 1) / (S * v),
    }


def _tree_slice(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def sequential_apply(block_fn: Callable, stacked_params, x, aux):
    """Apply L stacked blocks back-to-back on one device (the serving /
    degenerate-mesh twin of ``pipeline_apply``; same math, no collectives).

    ``block_fn(params_slice, x, aux) -> x``; ``stacked_params`` leaves are
    (L, ...). A python loop (static L) — XLA sees L distinct block bodies,
    matching what each pipeline stage compiles."""
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    for i in range(L):
        x = block_fn(_tree_slice(stacked_params, i), x, aux)
    return x


def _pipeline_core(block_fn, axis, axis_size, n_micro, stacked_params,
                   x, aux):
    """The pipelined schedule, per shard (inside shard_map), WITHOUT the
    final broadcast: returns ys (M, B/M, ...) — the microbatch outputs on
    the last stage, zeros elsewhere. Collective content is ppermute only,
    whose physical transpose is the exact reverse ring — so the backward
    pass can jax.vjp straight through this core (see ``_pp_bwd``)."""
    S, M = axis_size, n_micro
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} stacked blocks not divisible by "
                         f"pp stages={S}")
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_micro={M}")
    Ls, mb = L // S, B // M
    s = lax.axis_index(axis)
    local = jax.tree_util.tree_map(
        lambda p: lax.dynamic_slice_in_dim(p, s * Ls, Ls, axis=0),
        stacked_params)
    x_mbs = x.reshape(M, mb, *x.shape[1:])
    aux_mbs = jax.tree_util.tree_map(
        lambda a: a.reshape(M, mb, *a.shape[1:]), aux)
    perm = [(i, (i + 1) % S) for i in range(S)]
    is_first = (s == 0)
    is_last = (s == S - 1)

    def tick(carry, tau):
        buf, ys = carry
        inc = lax.ppermute(buf, axis, perm)
        # stage s works on microbatch tau - s this tick (clamped; out-of-
        # range ticks compute ramp-up/-down garbage that is never written)
        mb_id = jnp.clip(tau - s, 0, M - 1)
        h = jnp.where(is_first, x_mbs[jnp.clip(tau, 0, M - 1)], inc)
        a = _tree_slice(aux_mbs, mb_id)
        for i in range(Ls):
            h = block_fn(_tree_slice(local, i), h, a)
        w_id = jnp.clip(tau - (S - 1), 0, M - 1)
        row = jnp.where(is_last & (tau >= S - 1), h, ys[w_id])
        ys = lax.dynamic_update_index_in_dim(ys, row, w_id, axis=0)
        return (h, ys), None

    ys0 = jnp.zeros_like(x_mbs)
    (_, ys), _ = lax.scan(tick, (jnp.zeros_like(x_mbs[0]), ys0),
                          jnp.arange(M + S - 1))
    return ys


def _pipeline_core_interleaved(block_fn, axis, axis_size, n_micro,
                               interleave, stacked_params, x, aux):
    """Interleaved (Megatron-virtual-chunk, 1F1B-style) schedule: each
    device hosts ``v = interleave`` NON-CONTIGUOUS layer chunks (device s
    runs virtual stages s, S+s, 2S+s, …), so activations loop the physical
    ring v times and each tick is one CHUNK-slot of L/(v·S) blocks instead
    of a full L/S stage. Microbatches run in rounds of S (hence
    M % S == 0): device 0 feeds micros rS..rS+S−1 through chunk 0, and by
    the time chunk 0 of the round has drained, the ring delivers the same
    micros back for chunk 1 — the naive round-robin order is exactly
    self-consistent with ONE ppermute per tick and no activation buffers.

    Accounting vs GPipe on the same (S, M): total ticks v·M + S − 1 slots
    of 1/v-work vs M + S − 1 full ticks ≡ v·(M+S−1) slots — both the
    bubble wall-clock and the ramp garbage FLOPs shrink by v
    ((S−1)/v·M+S−1 vs (S−1)/(M+S−1) bubble fraction). The AD transpose of
    the scan runs the mirrored reverse schedule, so the backward inherits
    the same bubble shrink (``_pp_bwd`` rides it unchanged)."""
    S, M, v = axis_size, n_micro, interleave
    V = v * S
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % V:
        raise ValueError(f"{L} stacked blocks not divisible by "
                         f"pp stages×interleave={S}×{v}")
    if M % S:
        raise ValueError(f"interleaved schedule needs n_micro={M} "
                         f"divisible by stages={S} (rounds of S)")
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_micro={M}")
    Lc, mb = L // V, B // M
    s = lax.axis_index(axis)
    # device s's v chunks: chunk k = blocks [(k·S+s)·Lc, +Lc) — leaves
    # gain a leading (v, Lc, ...) layout
    local = jax.tree_util.tree_map(
        lambda p: jnp.stack([
            lax.dynamic_slice_in_dim(p, (k * S + s) * Lc, Lc, axis=0)
            for k in range(v)]),
        stacked_params)
    x_mbs = x.reshape(M, mb, *x.shape[1:])
    aux_mbs = jax.tree_util.tree_map(
        lambda a: a.reshape(M, mb, *a.shape[1:]), aux)
    perm = [(i, (i + 1) % S) for i in range(S)]

    def tick(carry, tau):
        buf, ys = carry
        inc = lax.ppermute(buf, axis, perm)
        # local slot tl → (round r, chunk k, micro m); out-of-range ticks
        # clamp to garbage work that is never written (same as GPipe ramp)
        tl = jnp.clip(tau - s, 0, v * M - 1)
        r = tl // (v * S)
        u = tl % (v * S)
        k = u // S
        m = r * S + u % S
        h = jnp.where((s == 0) & (k == 0), x_mbs[m], inc)
        a = _tree_slice(aux_mbs, m)
        chunk = jax.tree_util.tree_map(
            lambda p: lax.dynamic_index_in_dim(p, k, 0, keepdims=False),
            local)
        for i in range(Lc):
            h = block_fn(_tree_slice(chunk, i), h, a)
        write = ((s == S - 1) & (k == v - 1)
                 & (tau - s >= 0) & (tau - s < v * M))
        row = jnp.where(write, h, ys[m])
        ys = lax.dynamic_update_index_in_dim(ys, row, m, axis=0)
        return (h, ys), None

    ys0 = jnp.zeros_like(x_mbs)
    (_, ys), _ = lax.scan(tick, (jnp.zeros_like(x_mbs[0]), ys0),
                          jnp.arange(v * M + S - 1))
    return ys


def _pipeline_impl(block_fn, axis, axis_size, n_micro, interleave,
                   stacked_params, x, aux):
    """The pipelined forward, per shard (inside shard_map)."""
    if interleave > 1:
        ys = _pipeline_core_interleaved(block_fn, axis, axis_size, n_micro,
                                        interleave, stacked_params, x, aux)
    else:
        ys = _pipeline_core(block_fn, axis, axis_size, n_micro,
                            stacked_params, x, aux)
    # outputs live on the last stage (zeros elsewhere); one psum
    # replicates them everywhere
    y = lax.psum(ys, axis)
    return y.reshape(x.shape[0], *x.shape[1:])


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _pipeline_apply_v(block_fn: Callable, axis: str, axis_size: int,
                      n_micro: int, interleave: int, stacked_params, x,
                      aux):
    if axis_size == 1:
        return sequential_apply(block_fn, stacked_params, x, aux)
    return _pipeline_impl(block_fn, axis, axis_size, n_micro, interleave,
                          stacked_params, x, aux)


def pipeline_apply(block_fn: Callable, axis: str, axis_size: int,
                   n_micro: int, stacked_params, x, aux,
                   interleave: int = 1):
    """Run L stacked blocks as an S-stage pipeline over mesh axis ``axis``
    (must be called INSIDE ``shard_map``; see module docstring).

    ``block_fn(params_slice, x_mb, aux_mb) -> x_mb`` is one block;
    ``stacked_params`` leaves are (L, ...) with L % axis_size == 0, and
    params/``x``/``aux`` are replicated over ``axis``. ``x`` (B, ...) is cut
    into ``n_micro`` microbatches on dim 0 (B % n_micro == 0); ``aux`` is a
    pytree of per-sample tensors (B, ...) cut the same way (e.g. the HDiT
    cond vector — indexed per tick, never permuted). Returns (B, ...)
    replicated. Gradients: take them inside the shard_map; they come out
    full and replicated (custom_vjp psum), so pmean over ``axis`` is a
    typing no-op. Degenerates to ``sequential_apply`` at axis_size == 1.

    ``interleave=v>1`` selects the interleaved virtual-chunk schedule
    (``_pipeline_core_interleaved``): v layer chunks per device, bubble
    and ramp garbage cut by v; requires L % (S·v) == 0 and M % S == 0.
    ``interleave=1`` is the GPipe oracle schedule."""
    return _pipeline_apply_v(block_fn, axis, axis_size, n_micro,
                             int(interleave), stacked_params, x, aux)


def _pp_fwd(block_fn, axis, axis_size, n_micro, interleave, stacked_params,
            x, aux):
    y = _pipeline_apply_v(block_fn, axis, axis_size, n_micro, interleave,
                          stacked_params, x, aux)
    return y, (stacked_params, x, aux)


def _pp_bwd(block_fn, axis, axis_size, n_micro, interleave, res, g):
    stacked_params, x, aux = res
    if axis_size == 1:
        _, vjp = jax.vjp(partial(sequential_apply, block_fn),
                         stacked_params, x, aux)
        return vjp(g)
    # reverse pipeline: AD through the forward schedule UP TO the final
    # broadcast (its physical transpose under check_rep=False is another
    # psum, which would inflate cotangents S×). The single-copy cotangent
    # g enters on the last stage only — exactly where the outputs
    # physically live — and the transposed ppermutes carry it back through
    # the stages (the reverse pipeline; for interleave>1 the reverse
    # schedule mirrors the interleaved one, keeping its smaller bubble).
    # The trailing psums then assemble the disjoint per-stage cotangents
    # into full grads, value-identical on every shard, so the caller's
    # pmean over ``axis`` is a typing no-op.
    if interleave > 1:
        core = partial(_pipeline_core_interleaved, block_fn, axis,
                       axis_size, n_micro, interleave)
    else:
        core = partial(_pipeline_core, block_fn, axis, axis_size, n_micro)
    _, vjp = jax.vjp(core, stacked_params, x, aux)
    M = n_micro
    g_mbs = g.reshape(M, g.shape[0] // M, *g.shape[1:])
    is_last = lax.axis_index(axis) == axis_size - 1
    gp, gx, ga = vjp(jnp.where(is_last, g_mbs, jnp.zeros_like(g_mbs)))
    return (lax.psum(gp, axis), lax.psum(gx, axis), lax.psum(ga, axis))


_pipeline_apply_v.defvjp(_pp_fwd, _pp_bwd)
