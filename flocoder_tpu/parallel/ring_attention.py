"""Ring (sequence-parallel) attention over an ICI mesh axis.

SURVEY.md §5.7/§2d leave room for sequence/context parallelism over the
*global* attention sites — the U-Net bottleneck ``Attention``
(reference: unet.py:99-122) and the codec's ``SpatialNonLocalAttention``
(reference: codecs.py:336-382) — for resolutions where one chip can't hold
the full token sequence. At the reference's 128²/16² sizes this is never
needed (SURVEY: "not needed at 128²"), so nothing in the recipes turns it
on; this module is the extension point, built TPU-first:

- tokens are sharded over a mesh axis; each device holds a Q/K/V shard
- K/V shards rotate around the ring with ``lax.ppermute`` (one ICI
  neighbor-hop per step — the collective XLA maps directly onto the torus)
- exact softmax is recovered with online (flash-style) max/denominator
  accumulation, so the result is bitwise-independent of the ring layout up
  to float associativity

Everything is a pure function usable inside ``shard_map`` — the same
pattern as the psum'd RVQ statistics (ops/rvq.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .mesh import Mesh, MODEL_AXIS

__all__ = ["ring_attention_local", "make_ring_self_attention",
           "ring_attention_replicated"]


def ring_attention_local(q: jax.Array, k: jax.Array, v: jax.Array,
                         axis_name: str, axis_size: int,
                         scale: Optional[float] = None,
                         assume_varying: bool = False,
                         return_lse: bool = False):
    """Exact softmax attention where ``q, k, v`` are the LOCAL sequence
    shards ``(batch, n_local, heads, head_dim)`` of a sequence sharded over
    ``axis_name`` (call inside ``shard_map``). Returns the local output
    shard, identical (up to float associativity) to running full attention
    on the gathered sequence. With ``return_lse`` also returns the fp32
    per-query log-sum-exp ``(b, heads, n_local)`` — the softmax statistic
    the ring backward needs to recover exact probabilities without a
    second forward ring.

    ``axis_size`` must be the static mesh-axis size (ring length). The value
    head_dim may differ from the q/k head_dim (the codec's non-local
    attention projects v at full width, codecs.py:257)."""
    b, n, h, d = q.shape
    dv = v.shape[-1]
    if scale is None:
        scale = d ** -0.5
    qf = q.astype(jnp.float32) * scale

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    def step(carry, _):
        k_blk, v_blk, m, l, acc = carry
        sim = jnp.einsum("bnhd,bmhd->bhnm", qf, k_blk.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        blk_max = sim.max(axis=-1)                      # (b, h, n)
        new_m = jnp.maximum(m, blk_max)
        corr = jnp.exp(m - new_m)                       # rescale old stats
        p = jnp.exp(sim - new_m[..., None])             # (b, h, n, m)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhnm,bmhd->bhnd", p, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, new_m, l, acc), None

    m0 = jnp.full((b, h, n), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, n), jnp.float32)
    acc0 = jnp.zeros((b, h, n, dv), jnp.float32)
    # ppermute marks K/V as varying over the ring axis; every scan carry leaf
    # must enter with the same varying-manual-axes type (jax 0.9 vma
    # tracking). Inputs sharded over the axis are already varying — pcast
    # only the ones that aren't. ``assume_varying``: the caller guarantees
    # k/v are varying (e.g. ring_attention_replicated just pcast them) —
    # the carry constants then inherit vma ARITHMETICALLY from k, because
    # jax.typeof underreports vma inside grad re-traces and a double pcast
    # breaks the transpose.
    if assume_varying:
        vzero = (k[(0,) * k.ndim] * 0).astype(jnp.float32)
        m0, l0, acc0 = m0 + vzero, l0 + vzero, acc0 + vzero
    else:
        def _mark_varying(x):
            if axis_name in getattr(jax.typeof(x), "vma", ()):
                return x
            return lax.pcast(x, (axis_name,), to="varying")

        k, v, m0, l0, acc0 = map(_mark_varying, (k, v, m0, l0, acc0))
    (_, _, m, l, acc), _ = lax.scan(step, (k, v, m0, l0, acc0), None,
                                    length=axis_size)
    out = acc / l[..., None]                            # (b, h, n, d)
    out = out.transpose(0, 2, 1, 3).astype(q.dtype)     # (b, n, h, d)
    if return_lse:
        return out, m + jnp.log(l)                      # lse: (b, h, n)
    return out


def _plain_attention(q, k, v, scale):
    """Full softmax attention on (b, n, h, d) — the replicated reference
    math ring_attention_replicated's backward differentiates."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32) * scale,
                     k.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    sim = sim - lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ring_attention_replicated(q: jax.Array, k: jax.Array, v: jax.Array,
                              axis_name: str, axis_size: int,
                              scale: Optional[float] = None) -> jax.Array:
    """Sequence-parallel attention for REPLICATED ``(b, n, heads, d)``
    q/k/v inside a ``shard_map`` whose mesh has manual axis ``axis_name``
    (the module wiring, VERDICT r2 #10):

    - forward: each shard takes its n/axis_size token chunk, runs the
      ppermute K/V ring (``ring_attention_local``), and the outputs are
      all-gathered — the O(N²) score/value work is split ``axis_size`` ways
      while q/k/v themselves stay replicated (their producing 1×1 convs are
      cheap). This is the memory/bandwidth shape that matters when N² no
      longer fits one chip.
    - backward (custom_vjp): a ring-parallel flash-style backward (VERDICT
      r3 #2 — it used to differentiate the replicated math). Each shard
      computes dQ for its query chunk against the rotating K/V ring; the
      dK/dV partial accumulators TRAVEL WITH their K/V chunks around the
      ring (each chunk collects every shard's contribution and arrives home
      complete after axis_size hops — the same schedule as pipeline.py's
      ``_pp_bwd`` riding the transposed ppermutes). Exact softmax
      probabilities are recovered from the forward's saved log-sum-exp, so
      no recompute ring is needed. Final ``all_gather``s reassemble full
      gradients value-identical on every shard, preserving the original
      contract: the surrounding train steps just pmean as usual (vma-typed,
      parallel.mesh.pmean_typed). The O(N²) backward FLOPs now split
      axis_size ways like the forward's.

    Degenerates to plain attention at ``axis_size == 1``. ``axis_size``
    must divide ``n``. Take gradients INSIDE the shard_map (as the train
    steps do); grad-of-shard_map over replicated in/out specs is not
    supported by the vma type system for this op."""
    if axis_size == 1:
        return _plain_attention(q, k, v, scale)
    out_loc = ring_attention_local(_chunk(q, axis_name, axis_size),
                                   _chunk(k, axis_name, axis_size),
                                   _chunk(v, axis_name, axis_size),
                                   axis_name, axis_size, scale,
                                   assume_varying=True)
    return lax.all_gather(out_loc, axis_name, axis=1, tiled=True)


def _rar_fwd(q, k, v, axis_name, axis_size, scale):
    if axis_size == 1:
        return _plain_attention(q, k, v, scale), (q, k, v, None, None)
    out_loc, lse_loc = ring_attention_local(
        _chunk(q, axis_name, axis_size), _chunk(k, axis_name, axis_size),
        _chunk(v, axis_name, axis_size), axis_name, axis_size, scale,
        assume_varying=True, return_lse=True)
    out = lax.all_gather(out_loc, axis_name, axis=1, tiled=True)
    return out, (q, k, v, out_loc, lse_loc)


def _rar_bwd(axis_name, axis_size, scale, res, g):
    q, k, v, out_loc, lse_loc = res
    if axis_size == 1:
        _, vjp = jax.vjp(lambda a, b, c: _plain_attention(a, b, c, scale),
                         q, k, v)
        return vjp(g.astype(q.dtype))
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    q_loc = _chunk(q, axis_name, axis_size)
    k_loc = _chunk(k, axis_name, axis_size)
    v_loc = _chunk(v, axis_name, axis_size)
    g_loc = _chunk(g, axis_name, axis_size).astype(jnp.float32)  # dO_i
    qf = q_loc.astype(jnp.float32) * scale
    # D_i = rowsum(dO_i ∘ O_i) — the softmax-jacobian correction term
    D = jnp.einsum("bnhd,bnhd->bhn", g_loc, out_loc.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]

    def step(carry, _):
        k_blk, v_blk, dk_blk, dv_blk, dq_acc = carry
        kf = k_blk.astype(jnp.float32)
        sim = jnp.einsum("bnhd,bmhd->bhnm", qf, kf,
                         preferred_element_type=jnp.float32)
        # exact softmax probabilities from the saved forward statistics
        p = jnp.exp(sim - lse_loc[..., None])            # (b, h, n, m)
        dv_blk = dv_blk + jnp.einsum("bhnm,bnhd->bmhd", p, g_loc,
                                     preferred_element_type=jnp.float32)
        dp = jnp.einsum("bnhd,bmhd->bhnm", g_loc, v_blk.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        ds = p * (dp - D[..., None])                     # (b, h, n, m)
        dq_acc = dq_acc + jnp.einsum("bhnm,bmhd->bnhd", ds, kf,
                                     preferred_element_type=jnp.float32)
        dk_blk = dk_blk + jnp.einsum("bhnm,bnhd->bmhd", ds, qf,
                                     preferred_element_type=jnp.float32)
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        dk_blk = lax.ppermute(dk_blk, axis_name, perm)
        dv_blk = lax.ppermute(dv_blk, axis_name, perm)
        return (k_blk, v_blk, dk_blk, dv_blk, dq_acc), None

    # zero accumulators inherit the ring axis's varying type arithmetically
    # from the chunked k (same trick as ring_attention_local's carries)
    vzero = (k_loc[(0,) * k_loc.ndim] * 0).astype(jnp.float32)
    dk0 = jnp.zeros(k_loc.shape, jnp.float32) + vzero
    dv0 = jnp.zeros(v_loc.shape, jnp.float32) + vzero
    dq0 = jnp.zeros(q_loc.shape, jnp.float32) + vzero
    (_, _, dk_loc, dv_loc, dq_loc), _ = lax.scan(
        step, (k_loc, v_loc, dk0, dv0, dq0), None, length=axis_size)
    # after axis_size process+permute hops each dK/dV chunk is home on its
    # owner shard, complete; all_gather → full gradients, value-identical
    # on every shard (the replicated-gradient contract)
    dq = lax.all_gather(dq_loc * scale, axis_name, axis=1, tiled=True)
    dk = lax.all_gather(dk_loc, axis_name, axis=1, tiled=True)
    dv = lax.all_gather(dv_loc, axis_name, axis=1, tiled=True)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


ring_attention_replicated.defvjp(_rar_fwd, _rar_bwd)


def _chunk(x, axis_name, axis_size):
    """This shard's token chunk of a replicated (b, n, h, d) array; varying
    over the axis by construction (device-dependent slice index)."""
    n = x.shape[1]
    c = n // axis_size
    i = lax.axis_index(axis_name)
    return lax.dynamic_slice_in_dim(x, i * c, c, axis=1)


def make_ring_self_attention(mesh: Mesh, axis: str = MODEL_AXIS):
    """Build a jittable ``fn(q, k, v) -> out`` over GLOBAL ``(b, n, heads,
    d)`` arrays with the token axis sharded over ``mesh`` axis ``axis``
    (batch replicated along it; other mesh axes are free for data
    parallelism as usual).

    This is the drop-in sequence-parallel form of the bottleneck attention
    einsum pair (models/unet.py:Attention): same math, but the sequence
    never materializes on one device and K/V travel the ICI ring."""
    from flocoder_tpu.parallel.mesh import shard_map

    axis_size = mesh.shape[axis]
    spec = P(None, axis, None, None)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec)
    def fn(q, k, v):
        return ring_attention_local(q, k, v, axis_name=axis,
                                    axis_size=axis_size)
    return fn
