"""Device-mesh / sharding layer — new capability the reference lacks.

The reference is strictly single-device (SURVEY.md §2d: no DDP/collectives of
any kind). This module provides the TPU-native distributed layer specified in
SURVEY.md §5.8: a ``jax.sharding.Mesh`` over ICI (with room for a DCN axis in
multi-slice deployments), batch data parallelism for training and the
pre-encode pass, and helpers that make single-chip a degenerate mesh so every
recipe still runs on one device (or CPU).

Sharding policy:
- batch arrays: sharded over the 'data' axis (leading dim)
- params / optimizer state / EMA: replicated by default (these models are
  small); opt-in FSDP-style parameter sharding via ``fsdp_param_shardings``
  + ``shard_state`` — each large tensor is split on its largest divisible
  dim over 'data' and XLA inserts the all-gathers/reduce-scatters when the
  jitted step consumes it
- RVQ codebook EMA statistics: accumulated per-shard, psum-reduced over 'data'
  (the one true cross-device reduction the algorithm family needs,
  SURVEY.md §2d)
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh", "data_sharding", "replicated", "shard_batch",
    "host_device_count", "maybe_init_distributed", "P", "Mesh",
    "DATA_AXIS", "MODEL_AXIS", "DCN_AXIS", "batch_axis_names",
    "fsdp_param_shardings", "shard_state", "pmean_typed",
    "tp_param_shardings", "shard_state_tp", "shard_map",
    "batch_shard_count",
]

# jax ≥0.8 promotes shard_map to the stable namespace (renaming the
# replication-check kwarg check_rep → check_vma) and deprecates the
# jax.experimental home; resolve once here so call sites stay warning-free
# and API-compatible on both.
if hasattr(jax, "shard_map"):
    def shard_map(f, *args, check_rep=None, **kwargs):
        if check_rep is not None and "check_vma" not in kwargs:
            kwargs["check_vma"] = check_rep
        return jax.shard_map(f, *args, **kwargs)
else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

DATA_AXIS = "data"
MODEL_AXIS = "model"
DCN_AXIS = "dcn"


def maybe_init_distributed() -> None:
    """Initialize jax.distributed when launched multi-host (env-driven);
    harmless no-op in single-process runs."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None, n_dcn: int = 1) -> Mesh:
    """Create a ('data', 'model') mesh — or ('dcn', 'data', 'model') when
    ``n_dcn > 1`` for multi-slice deployments (SURVEY §5.8: ICI within a
    slice, DCN across slices; data parallelism then spans ('dcn','data') and
    gradient reductions hierarchy-reduce over ICI first). Defaults to all
    visible devices on the data axis; a single device yields a degenerate
    mesh so jitted code is identical on one chip or a pod slice."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_dcn)
    take = n_dcn * n_data * n_model
    if n_dcn > 1:
        devs = np.asarray(devices[:take]).reshape(n_dcn, n_data, n_model)
        return Mesh(devs, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))
    devs = np.asarray(devices[:take]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_axis_names(mesh: Mesh):
    """The mesh axes the batch dim is split over: ('dcn','data') on a
    multi-slice mesh, 'data' otherwise. Feed to PartitionSpec / pmean."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return DATA_AXIS


def batch_shard_count(mesh: Optional[Mesh]) -> int:
    """How many ways the batch dim splits on this mesh (1 for None, a
    single device, or a mesh whose batch axes are all size 1 — e.g. pure
    tensor-parallel)."""
    if mesh is None or mesh.size == 1:
        return 1
    names = batch_axis_names(mesh)
    n = 1
    for a in (names if isinstance(names, tuple) else (names,)):
        n *= mesh.shape[a]
    return n


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Sharding that splits the batch axis (dim ``axis``) over the data
    axes; other dims replicated."""
    dims = [None] * ndim
    dims[axis] = batch_axis_names(mesh)
    return NamedSharding(mesh, P(*dims))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: int = 0):
    """Device-put a host batch (pytree of arrays) sharded over 'data' on the
    batch axis (``axis``; pass 1 for (K, B, ...) multi-step super-batches);
    the TPU equivalent of the reference's ``.to(device)``.

    On a degenerate 1-device mesh this is a plain device_put — NamedSharding
    placement is skipped there (it also hangs the experimental axon TPU
    backend used for single-chip tunneling). Arrays whose batch dim does not
    divide the data-axis size (e.g. a trailing partial batch) are placed
    replicated instead of sharded."""
    single = mesh.size == 1
    names = batch_axis_names(mesh)
    n_data = int(np.prod([mesh.shape[a] for a in
                          ((names,) if isinstance(names, str) else names)]))

    def put(x):
        x = np.asarray(x)
        if single:
            return jax.device_put(x, mesh.devices.flat[0])
        if x.ndim <= axis or x.shape[axis] % n_data != 0:
            return jax.device_put(x, replicated(mesh))
        return jax.device_put(x, data_sharding(mesh, x.ndim, axis))
    return jax.tree_util.tree_map(put, batch)


def host_device_count() -> int:
    return jax.local_device_count()


def pmean_typed(tree, names):
    """pmean each leaf over whichever of ``names`` it is actually VARYING
    over (jax vma typing). Inside shard_map, pmean/psum are
    variant→invariant collectives: reducing an axis a leaf is invariant
    over is a type error, and returning a varying value through a
    replicated out_spec breaks the transpose. Leaves untouched by any named
    axis pass through. Used by the train steps so sequence-parallel
    (ring-attention) models — whose grads are varying over 'model' —
    compose with the same step code as plain models."""
    names = (names,) if isinstance(names, str) else tuple(names)

    def f(x):
        ax = tuple(n for n in names if n in getattr(jax.typeof(x), "vma", ()))
        return jax.lax.pmean(x, ax) if ax else x

    return jax.tree_util.tree_map(f, tree)


def fsdp_param_shardings(mesh: Mesh, tree, axis: str = DATA_AXIS,
                         min_size: int = 2 ** 14):
    """A NamedSharding pytree for FSDP-style parameter sharding: every
    tensor with ≥ ``min_size`` elements is split over mesh axis ``axis``
    along its largest evenly-divisible dim; everything else (and all
    scalars) is replicated.

    Used with plain-``jit`` train steps: place the state with
    ``shard_state`` and XLA's SPMD partitioner inserts the all-gathers
    (param use) and reduce-scatters (grad reduction) — the ZeRO-3 dataflow
    — without any change to the step function. The shard_map path keeps
    its explicit replicated-params layout instead."""
    n = mesh.shape[axis]

    def spec_for(x):
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        dims = [None] * len(shape)
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if shape[i] % n == 0:
                dims[i] = axis
                return NamedSharding(mesh, P(*dims))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)


def tp_param_shardings(mesh: Mesh, tree, axis: str = MODEL_AXIS,
                       min_size: int = 2 ** 12):
    """A NamedSharding pytree for tensor (model) parallelism over the mesh's
    'model' axis: conv kernels (HWIO) and dense kernels are split on their
    output-channel (last) dim; 1-D channel vectors (biases, norm scales) are
    split on dim 0 when divisible. Everything small or non-divisible is
    replicated.

    Used with plain-``jit`` steps (NOT shard_map): place the state with
    ``shard_state_tp``, shard the batch over 'data' as usual, and XLA's
    SPMD partitioner propagates channel sharding through the network and
    inserts the all-reduces where contractions cross the sharded dim — the
    Megatron dataflow for convnets, derived entirely from placement. This is
    new capability vs the reference (SURVEY §2d: no TP anywhere); it matters
    when a codec's activations at high resolution outgrow one chip's HBM."""
    n = mesh.shape[axis]

    def spec_for(x):
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return NamedSharding(mesh, P())
        dims = [None] * len(shape)
        # prefer the channel-out dim (last); fall back to any divisible dim
        for i in [len(shape) - 1] + list(range(len(shape) - 1)):
            if shape[i] % n == 0:
                dims[i] = axis
                return NamedSharding(mesh, P(*dims))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, tree)


def shard_state_tp(mesh: Mesh, state, axis: str = MODEL_AXIS,
                   min_size: int = 2 ** 12):
    """Device-put a train state with tensor-parallel parameter sharding (see
    ``tp_param_shardings``). Optimizer moments share each parameter's shape,
    so the same rule gives them matching layouts."""
    shardings = tp_param_shardings(mesh, state, axis=axis, min_size=min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings)


def shard_state(mesh: Mesh, state, axis: str = DATA_AXIS,
                min_size: int = 2 ** 14):
    """Device-put a train state with FSDP parameter sharding (see
    ``fsdp_param_shardings``). jit propagates the input shardings through
    the step, so the optimizer update runs on the shards and parameters
    stay sharded across steps."""
    shardings = fsdp_param_shardings(mesh, state, axis=axis,
                                     min_size=min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings)
