"""FID InceptionV3 feature extractor (pool3, 2048-d), NHWC flax.

Reference: flocoder/metrics.py:265-308 computes FID with torchmetrics
``FrechetInceptionDistance(feature=2048)``, whose backbone is the
"FID Inception" — torchvision's ``inception_v3`` topology with the
TF-ported quirks (count_include_pad=False average pools in the A/C blocks
and in Mixed_7b, a max pool in Mixed_7c's pool branch). This module
reimplements that network in flax/NHWC so FID becomes reference-comparable
the moment converted weights exist:

- ``InceptionV3Features`` — the backbone through the global average pool
  (2048-d), ``fid_variant=True`` reproduces the FID-Inception pooling quirks.
- ``convert_torch_inception(state_dict)`` — maps a torch ``inception_v3``
  state_dict (torchvision / pytorch-fid naming: ``Mixed_5b.branch1x1.conv
  .weight`` …) onto flax variables; run once where weights exist, save npz.
- ``load_inception_weights(path)`` — restores the flat npz.
- ``make_inception_feature_fn`` — the ``feature_fn(images)->(N,2048)``
  consumed by ops.fid.fid_score, including the torch-fidelity input
  pipeline (bilinear resize to 299², then (x−128)/128).

Submodule names deliberately mirror the torch module tree so conversion is
mechanical and auditable.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["InceptionV3Features", "convert_torch_inception",
           "load_inception_weights", "save_inception_weights",
           "make_inception_feature_fn"]

Pad = Union[int, Tuple[int, int]]


def _pad2(p: Pad):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class BasicConv(nn.Module):
    """Conv(no bias) + BatchNorm(eps=1e-3, inference) + ReLU — torchvision's
    ``BasicConv2d``."""
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Pad = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=_pad2(self.padding), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg3(x, count_include_pad: bool):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=count_include_pad)


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg3(x, count_include_pad=not self.fid_variant)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg3(x, count_include_pad=not self.fid_variant)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # pool branch: 'avg' (torchvision), 'avg_nopad' (FID Mixed_7b),
    # 'max' (FID Mixed_7c)
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avg3(x, count_include_pad=(self.pool == "avg"))
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """InceptionV3 through the global average pool → (N, 2048) features.
    Input: NHWC float32 at 299×299 already normalized to ≈[-1, 1]
    (use ``make_inception_feature_fn`` for the full torch-fidelity input
    pipeline)."""
    fid_variant: bool = True

    @nn.compact
    def __call__(self, x):
        fid = self.fid_variant
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, fid_variant=fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid_variant=fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid_variant=fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid_variant=fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid_variant=fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid_variant=fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid_variant=fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg_nopad" if fid else "avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max" if fid else "avg", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool → (N, 2048)


# ---------------------------------------------------------------------------
# weight conversion (torch inception_v3 state_dict → flax variables)

_SKIP_PREFIXES = ("fc.", "AuxLogits.")


def convert_torch_inception(state_dict) -> dict:
    """Map a torch ``inception_v3`` state_dict (torchvision / pytorch-fid
    naming) onto this module's flax variables ``{'params': …,
    'batch_stats': …}``. Tensors may be torch tensors or numpy arrays."""
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for part in path:
            node = node.setdefault(part, {})
        node[leaf] = jnp.asarray(value)

    for key, val in state_dict.items():
        if key.startswith(_SKIP_PREFIXES) or key.endswith(
                "num_batches_tracked"):
            continue
        v = np.asarray(getattr(val, "numpy", lambda: val)())
        parts = key.split(".")
        *mod_path, sub, leaf = parts  # e.g. Mixed_5b.branch1x1 | conv | weight
        if sub == "conv" and leaf == "weight":
            put(params, mod_path + ["conv"], "kernel",
                v.transpose(2, 3, 1, 0))  # OIHW → HWIO
        elif sub == "bn":
            if leaf in ("weight", "bias"):
                put(params, mod_path + ["bn"],
                    "scale" if leaf == "weight" else "bias", v)
            elif leaf == "running_mean":
                put(stats, mod_path + ["bn"], "mean", v)
            elif leaf == "running_var":
                put(stats, mod_path + ["bn"], "var", v)
        else:
            raise ValueError(f"unrecognized inception key: {key}")
    return {"params": params, "batch_stats": stats}


def save_inception_weights(variables: dict, path: str) -> None:
    """Flatten converted variables to a flat npz (collection/a/b/leaf)."""
    flat = {}

    def walk(prefix, node):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(p, v)
            else:
                flat[p] = np.asarray(v)
    walk("", variables)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_inception_weights(path: str) -> Optional[dict]:
    """Load converted FID-Inception weights (flat npz) if present."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    tree: dict = {}
    for key, v in flat.items():
        *path_parts, leaf = key.split("/")
        node = tree
        for part in path_parts:
            node = node.setdefault(part, {})
        node[leaf] = jnp.asarray(v)
    return tree


# ---------------------------------------------------------------------------
# feature_fn for ops.fid

def make_inception_feature_fn(
        weights_path: str = "weights/fid_inception.npz",
        variables: Optional[dict] = None, seed: int = 0,
        jit: bool = True):
    """Build ``feature_fn(images) -> (N, 2048)`` with the torch-fidelity
    input pipeline: accept NHWC uint8 [0,255] or float ≈[-1,1] (channels 1 or
    3; gray is channel-repeated per reference metrics.py:296-300), bilinear
    resize to 299² (half-pixel centers = torch align_corners=False), then
    normalize (x−128)/128.

    Uses ``variables`` if given, else converted weights from ``weights_path``
    if the file exists, else a fixed random init (features then remain
    self-consistent but not reference-comparable). The returned fn carries
    ``backend_name`` ('fid_inception' or 'fid_inception_random_init') so
    logged FIDs can be stamped with their feature backend."""
    model = InceptionV3Features(fid_variant=True)
    pretrained = True
    if variables is None:
        variables = load_inception_weights(weights_path)
        if variables is None:
            pretrained = False
            variables = model.init(jax.random.PRNGKey(seed),
                                   jnp.zeros((1, 299, 299, 3)))

    def feature_fn(images):
        x = jnp.asarray(images)
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(jnp.float32)
        else:
            # float inputs in [-1,1] → [0,255] pixel scale
            x = jnp.clip(x.astype(jnp.float32), -1.0, 1.0) * 127.5 + 127.5
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        b = x.shape[0]
        x = jax.image.resize(x, (b, 299, 299, 3), "bilinear")
        x = (x - 128.0) / 128.0
        return model.apply(variables, x)

    compiled = jax.jit(feature_fn) if jit else feature_fn

    def wrapper(images):
        return compiled(images)
    wrapper.backend_name = (
        "fid_inception" if pretrained else "fid_inception_random_init")
    return wrapper
