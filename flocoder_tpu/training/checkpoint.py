"""Checkpoint save/load with the reference's external contract.

Reference format (flocoder/general.py:120-137): a single file holding
``{'model_state_dict', 'epoch', 'optimizer_state_dict', 'config'}`` with
mtime-based rotation (``keep_recent_files``, general.py:77-81) and prefix
naming (``flow_``/``flowema_``/``vqgan_``). Here the same dict contract is
kept — state dicts are flat ``{dotted/path: numpy array}`` mappings — stored
as a compressed ``.npz`` plus a JSON sidecar inside one ``.fckpt`` zip-like
file (actually just .npz with config embedded as JSON string), so checkpoints
are framework-portable without pickle.

Partial/frozen loading (reference general.py:86-116) is supported via
``load_into_tree`` with ``strict=False`` semantics.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import to_dict, config_from_dict

__all__ = [
    "flatten_tree", "unflatten_tree", "save_checkpoint", "load_checkpoint",
    "load_into_tree", "keep_recent_files", "latest_checkpoint",
    "save_checkpoint_sharded", "load_checkpoint_sharded",
    "save_checkpoint_orbax", "load_checkpoint_orbax", "orbax_available",
]

_SEP = "/"


def flatten_tree(tree, prefix: str = "") -> dict:
    """Pytree → flat {path: np.ndarray}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_part(p) for p in path)
        flat[(prefix + key) if prefix else key] = np.asarray(leaf)
    return flat


def _path_part(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def unflatten_tree(flat: dict) -> dict:
    """Flat {path: array} → nested dict."""
    out: dict = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return out


def save_checkpoint(params, epoch: int, ckpt_dir: str = "checkpoints",
                    prefix: str = "flow_", opt_state=None, config=None,
                    ema=None, extra: Optional[dict] = None, keep: int = 5) -> str:
    """Write ``{prefix}{epoch}.npz`` with the reference's field contract
    (general.py:120-137) and rotate old files (keep most-recent ``keep``)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {f"model_state_dict{_SEP}{k}": v
               for k, v in flatten_tree(params).items()}
    if opt_state is not None:
        payload.update({f"optimizer_state_dict{_SEP}{k}": v
                        for k, v in flatten_tree(opt_state).items()})
    if ema is not None:
        payload.update({f"ema_state_dict{_SEP}{k}": v
                        for k, v in flatten_tree(ema).items()})
    for k, v in (extra or {}).items():
        payload.update({f"{k}{_SEP}{kk}": vv
                        for kk, vv in flatten_tree(v).items()})
    payload["epoch"] = np.asarray(epoch)
    if config is not None:
        payload["config_json"] = np.asarray(json.dumps(to_dict(config)))
    path = os.path.join(ckpt_dir, f"{prefix}{epoch}.npz")
    np.savez_compressed(path, **payload)
    keep_recent_files(keep, directory=ckpt_dir, pattern=f"{prefix}*.npz")
    return path


def load_checkpoint(path: str) -> dict:
    """Returns {'model_state_dict': nested dict, 'optimizer_state_dict': ...,
    'ema_state_dict': ..., 'epoch': int, 'config': Config or None}."""
    with np.load(path, allow_pickle=False) as data:
        groups: dict = {}
        epoch = 0
        config = None
        for key in data.files:
            if key == "epoch":
                epoch = int(data[key])
            elif key == "config_json":
                config = config_from_dict(json.loads(str(data[key])))
            else:
                head, _, rest = key.partition(_SEP)
                groups.setdefault(head, {})[rest] = data[key]
    out: dict = {k: unflatten_tree(v) for k, v in groups.items()}
    out["epoch"] = epoch
    out["config"] = config
    return out


def save_checkpoint_sharded(tree, epoch: int, ckpt_dir: str = "checkpoints",
                            prefix: str = "flow_", config=None,
                            keep: int = 5) -> str:
    """Multi-host sharded checkpoint (SURVEY §5.4 TPU equivalent; VERDICT r2
    #9): each host writes ONLY the array shards it can address —
    ``{prefix}{epoch}.host{process_index}.npz`` — so saving never gathers
    sharded (FSDP) state to one host. Shard keys encode the leaf path, the
    global shape and the shard's offset, so ``load_checkpoint_sharded``
    reassembles full arrays host-side and the result can be re-placed onto a
    DIFFERENT mesh shape (or a single device). Replicated leaves are written
    once per host and deduplicated on load.

    The single-file ``save_checkpoint`` npz (the reference's
    ``{model_state_dict,...}`` contract) remains the interchange format;
    this is the scale path."""
    pid = jax.process_index()
    os.makedirs(ckpt_dir, exist_ok=True)
    payload: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_part(p) for p in path)
        if not hasattr(leaf, "addressable_shards"):
            if pid == 0:
                payload[f"{key}@r"] = np.asarray(leaf)
            continue
        gshape = ",".join(str(d) for d in np.shape(leaf))
        seen = set()
        for shard in leaf.addressable_shards:
            offs = tuple((s.start or 0) for s in shard.index)
            if offs in seen:
                continue  # replicated copy on another local device
            seen.add(offs)
            off_key = "-".join(str(o) for o in offs)
            payload[f"{key}@{gshape}@{off_key}"] = np.asarray(shard.data)
    if pid == 0:
        payload["epoch"] = np.asarray(epoch)
        if config is not None:
            payload["config_json"] = np.asarray(json.dumps(to_dict(config)))
    path = os.path.join(ckpt_dir, f"{prefix}{epoch}.host{pid}.npz")
    np.savez_compressed(path, **payload)
    keep_recent_files(keep * max(jax.process_count(), 1), directory=ckpt_dir,
                      pattern=f"{prefix}*.host*.npz")
    return path


def load_checkpoint_sharded(ckpt_dir: str, prefix: str, epoch: int) -> dict:
    """Reassemble a sharded checkpoint written by ``save_checkpoint_sharded``
    from every ``{prefix}{epoch}.host*.npz`` under ``ckpt_dir``. Returns
    {'state': nested tree of full numpy arrays, 'epoch': int, 'config': ...}
    — place onto any mesh with ``parallel.mesh.shard_state`` / device_put
    (mesh-shape independent restore)."""
    files = sorted(glob.glob(os.path.join(ckpt_dir,
                                          f"{prefix}{epoch}.host*.npz")))
    if not files:
        raise FileNotFoundError(
            f"no {prefix}{epoch}.host*.npz under {ckpt_dir}")
    flat: dict = {}
    parts: dict = {}   # leaf key -> {offsets: array}, plus global shape
    epoch_out, config = epoch, None
    for f in files:
        with np.load(f, allow_pickle=False) as data:
            for key in data.files:
                if key == "epoch":
                    epoch_out = int(data[key])
                    continue
                if key == "config_json":
                    config = config_from_dict(json.loads(str(data[key])))
                    continue
                leaf_key, _, tail = key.partition("@")
                if tail == "r":  # unsharded host scalar/array
                    flat[leaf_key] = data[key]
                    continue
                gshape_s, _, off_s = tail.partition("@")
                gshape = tuple(int(d) for d in gshape_s.split(",") if d)
                offs = tuple(int(o) for o in off_s.split("-") if o != "")
                entry = parts.setdefault(leaf_key, {"shape": gshape,
                                                    "shards": {}})
                entry["shards"].setdefault(offs, data[key])
    for leaf_key, entry in parts.items():
        gshape = entry["shape"]
        shards = entry["shards"]
        sample = next(iter(shards.values()))
        if not gshape:  # scalar
            flat[leaf_key] = sample
            continue
        full = np.zeros(gshape, dtype=sample.dtype)
        for offs, block in shards.items():
            idx = tuple(slice(o, o + s) for o, s in zip(offs, block.shape))
            full[idx] = block
        flat[leaf_key] = full
    return {"state": unflatten_tree(flat), "epoch": epoch_out,
            "config": config}


def orbax_available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except ImportError:
        return False


def save_checkpoint_orbax(tree, epoch: int, ckpt_dir: str = "checkpoints_orbax",
                          config=None, keep: int = 5) -> str:
    """Orbax interop backend (SURVEY §5.4 "orbax-style checkpointing";
    docs/ROADMAP.md): the same nested state tree written through
    ``orbax.checkpoint.CheckpointManager`` so external TPU tooling that
    speaks orbax (multi-host array serialization, async saves, GCS paths)
    can consume the run directly. ``config`` rides along as JSON metadata.
    The single-file npz (``save_checkpoint``) stays the interchange format;
    the first-party sharded-npz backend stays the dependency-free scale
    path."""
    import orbax.checkpoint as ocp
    root = os.path.abspath(ckpt_dir)
    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    with ocp.CheckpointManager(root, options=options) as mgr:
        args = {"state": ocp.args.StandardSave(tree)}
        if config is not None:
            args["config"] = ocp.args.JsonSave(to_dict(config))
        mgr.save(int(epoch), args=ocp.args.Composite(**args))
        mgr.wait_until_finished()
    return os.path.join(root, str(int(epoch)))


def load_checkpoint_orbax(ckpt_dir: str, epoch: Optional[int] = None) -> dict:
    """Restore an orbax checkpoint written by ``save_checkpoint_orbax``.
    ``epoch=None`` restores the latest step. Returns
    {'state': nested tree of numpy/jax arrays, 'epoch': int, 'config':
    Config or None} — same contract as ``load_checkpoint_sharded``."""
    import orbax.checkpoint as ocp
    root = os.path.abspath(ckpt_dir)
    with ocp.CheckpointManager(root) as mgr:
        step = int(epoch) if epoch is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {root}")
        out = mgr.restore(step)
    config = None
    if getattr(out, "config", None) is not None:
        config = config_from_dict(dict(out.config))
    return {"state": out.state, "epoch": step, "config": config}


def load_into_tree(template, state_dict: dict, strict: bool = True):
    """Restore arrays into the structure of ``template``. With strict=False,
    missing keys keep template values and extra keys are ignored (the
    reference's strict=False old-checkpoint path, codecs.py:737)."""
    flat_t = flatten_tree(template)
    missing = [k for k in flat_t if k not in state_dict]
    extra = [k for k in state_dict if k not in flat_t]
    if strict and (missing or extra):
        raise KeyError(f"checkpoint mismatch: missing={missing[:5]} extra={extra[:5]}")
    flat_new = {}
    for k, v in flat_t.items():
        if k in state_dict:
            arr = np.asarray(state_dict[k])
            if arr.shape != v.shape:
                if strict:
                    raise ValueError(f"shape mismatch for {k}: {arr.shape} vs {v.shape}")
                arr = v
            # restore as device arrays: numpy leaves break traced fancy
            # indexing (e.g. RVQ codebook lookup under jit)
            flat_new[k] = jnp.asarray(np.asarray(arr).astype(v.dtype))
        else:
            flat_new[k] = jnp.asarray(v)
    nested = unflatten_tree(flat_new)
    leaves_new = [flat_new[k] for k in flat_t]  # same order as template flatten
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves_new)


def keep_recent_files(keep: int, directory: str, pattern: str = "*") -> None:
    """mtime-based GC (reference: general.py:77-81)."""
    files = sorted(glob.glob(os.path.join(directory, pattern)),
                   key=os.path.getmtime)
    for f in files[:-keep] if keep > 0 else files:
        try:
            os.remove(f)
        except OSError:
            pass


def latest_checkpoint(ckpt_dir: str, prefix: str = "flow_") -> Optional[str]:
    files = glob.glob(os.path.join(ckpt_dir, f"{prefix}*.npz"))
    return max(files, key=os.path.getmtime) if files else None


def transfer_outer_layers(target_params: dict, source_state: dict,
                          encoder_prefixes=("encoder/params/EncDecResidualBlock_0",
                                            "encoder/params/EncDecResidualBlock_1"),
                          decoder_suffix_count: int = 2) -> tuple:
    """Partial transfer learning (reference: codecs.py:746-774): copy the
    first two encoder blocks and the last ``decoder_suffix_count`` decoder
    conv layers from a source checkpoint into a freshly-initialized codec,
    returning ``(params, frozen_mask)`` where ``frozen_mask`` is a pytree of
    bools marking transferred leaves (pair with ``optax.masked`` /
    ``optax.set_to_zero`` to freeze them — JAX has no requires_grad)."""
    flat_t = flatten_tree(target_params)
    decoder_keys = sorted(k for k in flat_t if k.startswith("decoder/"))
    # last N decoder conv layers by module index ordering
    conv_ids = sorted({k.split("/")[2] for k in decoder_keys
                       if k.split("/")[2].startswith("Conv_")},
                      key=lambda s: int(s.split("_")[1]))
    tail_convs = set(conv_ids[-decoder_suffix_count:]) if conv_ids else set()

    def transferred(key: str) -> bool:
        if any(key.startswith(p) for p in encoder_prefixes):
            return True
        parts = key.split("/")
        return (key.startswith("decoder/") and len(parts) > 2
                and parts[2] in tail_convs)

    new_flat, frozen_flat = {}, {}
    n_done = 0
    for k, v in flat_t.items():
        if transferred(k) and k in source_state and \
                np.asarray(source_state[k]).shape == v.shape:
            new_flat[k] = np.asarray(source_state[k]).astype(v.dtype)
            frozen_flat[k] = True
            n_done += 1
        else:
            new_flat[k] = v
            frozen_flat[k] = False
    treedef = jax.tree_util.tree_structure(target_params)
    params = jax.tree_util.tree_unflatten(treedef,
                                          [new_flat[k] for k in flat_t])
    frozen = jax.tree_util.tree_unflatten(treedef,
                                          [frozen_flat[k] for k in flat_t])
    print(f"transfer_outer_layers: transferred {n_done} arrays")
    return params, frozen
