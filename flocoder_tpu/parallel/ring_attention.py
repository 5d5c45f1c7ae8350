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
                         assume_varying: bool = False) -> jax.Array:
    """Exact softmax attention where ``q, k, v`` are the LOCAL sequence
    shards ``(batch, n_local, heads, head_dim)`` of a sequence sharded over
    ``axis_name`` (call inside ``shard_map``). Returns the local output
    shard, identical (up to float associativity) to running full attention
    on the gathered sequence.

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
    (_, _, _, l, acc), _ = lax.scan(step, (k, v, m0, l0, acc0), None,
                                    length=axis_size)
    out = acc / l[..., None]                            # (b, h, n, d)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)    # (b, n, h, d)


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
    - backward (custom_vjp): the VJP of the REPLICATED full-attention math —
      plain einsums, no collectives, so the gradients are full and
      value-identical on every shard by construction and the surrounding
      train steps just pmean as usual (vma-typed, parallel.mesh.pmean_typed).
      The backward is replicated work; splitting it over the ring as well is
      a further optimization left to the sharded path
      (``make_ring_self_attention``).

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
    return ring_attention_replicated(q, k, v, axis_name, axis_size,
                                     scale), (q, k, v)


def _rar_bwd(axis_name, axis_size, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _plain_attention(a, b, c, scale),
                     q, k, v)
    return vjp(g.astype(q.dtype))


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
