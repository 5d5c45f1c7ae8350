"""Perceptual feature extractors (VGG16-style), NHWC linen.

Reference: train_vqgan.py:138-140 uses frozen torchvision ``vgg16.features[:16]``
(conv1_1..conv3_3) for the perceptual loss (metrics.py:103-115), and
vqgan_plus.py:232-257 uses ResNet50 logits. Pretrained weights cannot be
downloaded in this environment (zero egress), so:

- ``VGG16Features`` reproduces the conv1_1..conv3_3 topology; weights load
  from a local ``.npz`` (``load_vgg16_weights``) when available — the file
  format is a flat {layer_i/kernel, layer_i/bias} mapping convertible from
  torchvision with the included converter snippet — otherwise a fixed
  Kaiming-initialized network is used (random conv features are a known
  usable perceptual proxy; absolute loss scales differ from the reference).
- ``make_perceptual_fn`` returns the ``feature_fn`` consumed by
  metrics.perceptual_loss.
"""
from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["VGG16Features", "make_perceptual_fn", "load_vgg16_weights"]

# torchvision vgg16.features[:16]: channel plan per conv, 'M' = maxpool
_VGG16_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256)


class VGG16Features(nn.Module):
    """conv1_1..conv3_3 feature pyramid; returns the post-ReLU activation of
    the last conv in each block (3 feature maps)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        feats = []
        for spec in _VGG16_PLAN:
            if spec == "M":
                feats.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding=1, dtype=self.dtype)(x)
                x = nn.relu(x)
        feats.append(x)
        return feats


def load_vgg16_weights(path: str) -> Optional[dict]:
    """Load converted torchvision VGG16 weights (flat npz of
    {Conv_i/kernel (HWIO), Conv_i/bias}) if the file exists."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params: dict = {}
    for k, v in flat.items():
        layer, leaf = k.split("/")
        params.setdefault(layer, {})[leaf] = jnp.asarray(v)
    return {"params": params}


def make_perceptual_fn(image_size: int = 128, weights_path: str =
                       "weights/vgg16_features.npz", seed: int = 0):
    """Build ``feature_fn(images_imagenet_normalized) -> [feature maps]``
    for metrics.perceptual_loss. Uses converted pretrained weights when
    present, else a fixed random-init network."""
    model = VGG16Features()
    variables = load_vgg16_weights(weights_path)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, image_size, image_size, 3)))

    def feature_fn(x):
        return model.apply(variables, x)

    return feature_fn
