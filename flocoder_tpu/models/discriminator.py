"""Patch discriminators for VQGAN adversarial training, NHWC linen.

Reference: flocoder/patch_discriminator.py (original spectral-norm PatchGAN,
kept for parity) and flocoder/vqgan_plus.py:440-507
(``VQGANPlusPatchDiscriminator`` — the one actually used for training, chosen
at metrics.py:220) with its anti-aliasing GaussianBlur before strided
downsamples (vqgan_plus.py:511-524).

Spectral normalization uses ``flax.linen.SpectralNorm`` (power iteration
state lives in the 'batch_stats' collection; pass ``update_stats=True`` during
discriminator steps). Both discriminators return ``(patch_logits, features)``
for the feature-matching loss (metrics.py:232-236).
"""
from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PatchDiscriminator", "VQGANPlusPatchDiscriminator",
           "VQGANPlusDiscriminator", "DiscrResBlock", "GaussianBlur",
           "init_discriminator", "make_disc_apply"]


class GaussianBlur(nn.Module):
    """Fixed 4×4 Gaussian depthwise conv, stride 2 — anti-aliased downsample
    (reference: vqgan_plus.py:138-153). No learnable parameters."""

    @nn.compact
    def __call__(self, x):
        k = (jnp.asarray([[1., 2., 2., 1.],
                          [2., 4., 4., 2.],
                          [2., 4., 4., 2.],
                          [1., 2., 2., 1.]]) / 36.0).astype(x.dtype)
        c = x.shape[-1]
        kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _sn(layer: nn.Module) -> nn.Module:
    return nn.SpectralNorm(layer)


class DiscrResBlock(nn.Module):
    """Spectral-norm residual block with GroupNorm + LeakyReLU
    (reference: patch_discriminator.py:7-32 / vqgan_plus.py:155-189)."""
    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        c_in = x.shape[-1]
        groups = min(32, max(1, self.out_channels // 4))
        if self.stride != 1 or c_in != self.out_channels:
            identity = _sn(nn.Conv(self.out_channels, (1, 1),
                                   strides=self.stride, dtype=self.dtype))(
                                       x, update_stats=update_stats)
        else:
            identity = x
        h = _sn(nn.Conv(self.out_channels, (3, 3), strides=self.stride,
                        padding=1, dtype=self.dtype))(x, update_stats=update_stats)
        h = nn.GroupNorm(num_groups=groups, dtype=self.dtype, epsilon=1e-5)(h)
        h = nn.leaky_relu(h, 0.2)
        h = _sn(nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype))(h, update_stats=update_stats)
        h = nn.GroupNorm(num_groups=groups, dtype=self.dtype, epsilon=1e-5)(h)
        return nn.leaky_relu(h + identity, 0.2)


class PatchDiscriminator(nn.Module):
    """Original PatchGAN discriminator (reference:
    patch_discriminator.py:34-75): 4×4 stem, strided DiscrResBlocks, 4×4
    patch head; returns (logits, feature list)."""
    in_channels: int = 3
    hidden_channels: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        features = []
        h = _sn(nn.Conv(self.hidden_channels, (4, 4), padding=1,
                        dtype=self.dtype))(x, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        features.append(h)
        cur = self.hidden_channels
        for i in range(self.n_layers):
            nxt = min(self.hidden_channels * (2 ** (i + 1)), 512)
            h = DiscrResBlock(nxt, stride=2 if i < self.n_layers - 1 else 1,
                              dtype=self.dtype)(h, update_stats=update_stats)
            features.append(h)
            cur = nxt
        logits = _sn(nn.Conv(1, (4, 4), padding=1, dtype=self.dtype))(
            h, update_stats=update_stats)
        return logits, features


class VQGANPlusPatchDiscriminator(nn.Module):
    """VQGAN+-style patch discriminator (reference: vqgan_plus.py:469-507):
    3×3 stem, GaussianBlur anti-aliasing before each strided resblock, 3×3
    patch head; returns (logits, feature list)."""
    in_channels: int = 3
    hidden_channels: int = 64
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        features = []
        h = _sn(nn.Conv(self.hidden_channels, (3, 3), padding=1,
                        dtype=self.dtype))(x, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        features.append(h)
        cur = self.hidden_channels
        for i in range(self.n_layers):
            nxt = min(self.hidden_channels * (2 ** (i + 1)), 512)
            if i < self.n_layers - 1:
                h = GaussianBlur()(h)
                h = DiscrResBlock(nxt, stride=2, dtype=self.dtype)(
                    h, update_stats=update_stats)
            else:
                h = DiscrResBlock(nxt, stride=1, dtype=self.dtype)(
                    h, update_stats=update_stats)
            features.append(h)
            cur = nxt
        logits = _sn(nn.Conv(1, (3, 3), padding=1, dtype=self.dtype))(
            h, update_stats=update_stats)
        return logits, features


class VQGANPlusDiscriminator(nn.Module):
    """The full VQGAN+ discriminator (reference: vqgan_plus.py:191-229) —
    distinct from the patch variant above: base_channels=128, all resblocks
    stride-1, spatial downsampling done ONLY by the stride-2 GaussianBlur
    before each non-final block; features tapped after the stem LeakyReLU and
    after every resblock. Pairs with the LeCAM-regularized adversarial loss
    (metrics.discriminator_loss_lecam; reference: vqgan_plus.py:270-299)."""
    in_channels: int = 3
    base_channels: int = 128
    n_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False
                 ) -> Tuple[jax.Array, List[jax.Array]]:
        features = []
        h = _sn(nn.Conv(self.base_channels, (3, 3), padding=1,
                        dtype=self.dtype))(x, update_stats=update_stats)
        h = nn.leaky_relu(h, 0.2)
        features.append(h)
        for i in range(self.n_layers):
            nxt = min(self.base_channels * (2 ** (i + 1)), 512)
            if i < self.n_layers - 1:
                h = GaussianBlur()(h)
            h = DiscrResBlock(nxt, stride=1, dtype=self.dtype)(
                h, update_stats=update_stats)
            features.append(h)
        logits = _sn(nn.Conv(1, (3, 3), padding=1, dtype=self.dtype))(
            h, update_stats=update_stats)
        return logits, features


def init_discriminator(disc: nn.Module, rng, sample) -> dict:
    """Init variables (params + spectral-norm power-iteration stats)."""
    return disc.init(rng, sample, update_stats=False)


def make_disc_apply(disc: nn.Module, update_stats: bool = False):
    """Build ``disc_apply(variables, x) -> ((logits, features), new_vars?)``.
    With ``update_stats`` the spectral-norm u/v vectors advance one power
    iteration and the new variables are returned via mutable collection."""
    if update_stats:
        def apply_fn(variables, x):
            (logits, feats), new_vars = disc.apply(
                variables, x, update_stats=True, mutable=["batch_stats"])
            return (logits, feats), new_vars
        return apply_fn

    def apply_fn(variables, x):
        return disc.apply(variables, x, update_stats=False)
    return apply_fn
