"""Stable-Diffusion VAE (AutoencoderKL) in flax, NHWC.

Reference: flocoder/codecs.py:631-663 wraps diffusers
``AutoencoderKL.from_pretrained("stabilityai/sd-vae-ft-mse")`` and uses
``encode(x).latent_dist.mean`` (no 0.18215 scaling) / ``decode(z).sample``.
This is a first-party flax implementation of the same architecture
(128→512 channel encoder with 4 stages of 2 resnets, mid resnet-attn-resnet,
8-channel moment head + 1×1 quant convs; mirrored decoder with 3-resnet up
stages), 512×512-class topology at any input size, latents H/8 × W/8 × 4.

Weights: ``load_sd_vae_weights`` reads a converted ``.npz`` (flat
{path: array} with HWIO conv kernels — produce it once from the diffusers
checkpoint with ``convert_diffusers_sd_vae`` where network access exists).
Without a weights file the model runs randomly initialized — the full
pipeline stays exercisable; fidelity requires the converted weights
(documented divergence: this environment has no egress).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.quant import QuantConv
from .codecs import gn_groups

__all__ = ["SDVAE", "SDVAEEncoder", "SDVAEDecoder", "load_sd_vae_weights",
           "convert_sd_vae_state_dict", "convert_diffusers_sd_vae"]

_CH = (128, 256, 512, 512)


def _conv(quant: bool, features, kernel_size, name, dtype, **kw):
    """nn.Conv or its W8A8 drop-in (ops/quant.py), under an EXPLICIT name
    matching nn.Conv's autonames ("Conv_<i>") so the parameter pytree — and
    every checkpoint/converter — is identical either way."""
    cls = QuantConv if quant else nn.Conv
    return cls(features, kernel_size, name=name, dtype=dtype, **kw)


class _Resnet(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=gn_groups(32, x.shape[-1]), epsilon=1e-6,
                         dtype=self.dtype)(x)
        h = nn.silu(h)
        h = _conv(self.quant, self.out_ch, (3, 3), "Conv_0", self.dtype,
                  padding=1)(h)
        h = nn.GroupNorm(num_groups=gn_groups(32, h.shape[-1]), epsilon=1e-6,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        h = _conv(self.quant, self.out_ch, (3, 3), "Conv_1", self.dtype,
                  padding=1)(h)
        if x.shape[-1] != self.out_ch:
            x = _conv(self.quant, self.out_ch, (1, 1), "Conv_2",
                      self.dtype)(x)
        return x + h


class _Attn(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=gn_groups(32, x.shape[-1]), epsilon=1e-6,
                         dtype=self.dtype)(x)
        q = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        k = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        v = nn.Dense(c, dtype=self.dtype)(h).reshape(b, hh * ww, c)
        logits = jnp.einsum("bnc,bmc->bnm", q, k,
                            preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, hh, ww, c)
        return x + nn.Dense(c, dtype=self.dtype)(out)


class SDVAEEncoder(nn.Module):
    latent_channels: int = 4
    channels: tuple = _CH   # (128,256,512,512) for sd-vae-ft-mse
    dtype: Any = jnp.float32
    # W8A8 int8 convs for the inference-only pre-encode pass (ops/quant.py);
    # param tree unchanged. conv_in (3→128), the moment head (512→8) and the
    # 1×1 quant_conv fall below MIN_QUANT_CHANNELS and stay in self.dtype,
    # so the latent head keeps full precision either way.
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        _ch = tuple(self.channels)
        n_conv = 0  # explicit names must mirror nn.Conv autonaming

        def cname():
            nonlocal n_conv
            n_conv += 1
            return f"Conv_{n_conv - 1}"

        h = _conv(self.quant, _ch[0], (3, 3), cname(), self.dtype,
                  padding=1)(x)
        for i, ch in enumerate(_ch):
            h = _Resnet(ch, self.dtype, self.quant)(h)
            h = _Resnet(ch, self.dtype, self.quant)(h)
            if i < len(_ch) - 1:
                # asymmetric pad then stride-2 conv (diffusers downsample)
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = _conv(self.quant, ch, (3, 3), cname(), self.dtype,
                          strides=2, padding="VALID")(h)
        h = _Resnet(_ch[-1], self.dtype, self.quant)(h)
        h = _Attn(self.dtype)(h)
        h = _Resnet(_ch[-1], self.dtype, self.quant)(h)
        h = nn.GroupNorm(num_groups=gn_groups(32, h.shape[-1]), epsilon=1e-6,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        h = _conv(self.quant, 2 * self.latent_channels, (3, 3), cname(),
                  self.dtype, padding=1)(h)
        # quant_conv
        return _conv(self.quant, 2 * self.latent_channels, (1, 1), cname(),
                     self.dtype)(h)


class SDVAEDecoder(nn.Module):
    out_channels: int = 3
    latent_channels: int = 4
    channels: tuple = _CH
    dtype: Any = jnp.float32
    # W8A8 int8 convs for serving (ops/quant.py); param tree unchanged.
    # The attention block and the output head stay in self.dtype.
    quant: bool = False

    @nn.compact
    def __call__(self, z):
        _ch = tuple(self.channels)
        n_conv = 0  # explicit names must mirror nn.Conv autonaming

        def cname():
            nonlocal n_conv
            n_conv += 1
            return f"Conv_{n_conv - 1}"

        # post_quant_conv (4→4: below the quant channel floor either way)
        h = _conv(self.quant, self.latent_channels, (1, 1), cname(),
                  self.dtype)(z)
        h = _conv(self.quant, _ch[-1], (3, 3), cname(), self.dtype,
                  padding=1)(h)
        h = _Resnet(_ch[-1], self.dtype, self.quant)(h)
        h = _Attn(self.dtype)(h)
        h = _Resnet(_ch[-1], self.dtype, self.quant)(h)
        for i, ch in enumerate(reversed(_ch)):
            h = _Resnet(ch, self.dtype, self.quant)(h)
            h = _Resnet(ch, self.dtype, self.quant)(h)
            h = _Resnet(ch, self.dtype, self.quant)(h)
            if i < len(_ch) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = _conv(self.quant, c, (3, 3), cname(), self.dtype,
                          padding=1)(h)
        h = nn.GroupNorm(num_groups=gn_groups(32, h.shape[-1]), epsilon=1e-6,
                         dtype=self.dtype)(h)
        h = nn.silu(h)
        # output head: high precision protects final pixel values
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name=cname())(h)


class SDVAE:
    """Codec-interface wrapper (same contract as models.codecs codecs):
    ``encode`` returns the posterior MEAN (reference: codecs.py:647 uses
    latent_dist.mean, not a sample, and no 0.18215 scaling)."""
    in_channels = 3

    def __init__(self, image_size: int = 128, latent_channels: int = 4,
                 weights_path: str = "weights/sd_vae_ft_mse.npz",
                 channels: tuple = _CH, dtype=jnp.float32,
                 quant_decode: bool = False, quant_encode: bool = False):
        self.image_size = image_size
        self.latent_channels = latent_channels
        self.weights_path = weights_path
        self.channels = tuple(channels)
        self.encoder = SDVAEEncoder(latent_channels, self.channels, dtype,
                                    quant=quant_encode)
        self.decoder = SDVAEDecoder(3, latent_channels, self.channels, dtype,
                                    quant=quant_decode)

    def init(self, rng, sample) -> dict:
        k_e, k_d = jax.random.split(rng)
        enc = self.encoder.init(k_e, sample)
        moments = self.encoder.apply(enc, sample)
        z = moments[..., : self.latent_channels]
        dec = self.decoder.init(k_d, z)
        params = {"encoder": enc, "decoder": dec}
        loaded = load_sd_vae_weights(self.weights_path, params)
        if loaded is not None:
            params = loaded
            print(f"SDVAE: loaded converted weights from {self.weights_path}")
        else:
            print(f"SDVAE: no weights at {self.weights_path}; running "
                  "randomly initialized (convert with "
                  "convert_diffusers_sd_vae where egress exists)")
        return params

    def encode(self, params, x, **_):
        moments = self.encoder.apply(params["encoder"], x)
        return moments[..., : self.latent_channels]  # posterior mean

    def decode(self, params, z, **_):
        return self.decoder.apply(params["decoder"], z)

    def forward(self, params, x, **_):
        z = self.encode(params, x)
        return self.decode(params, z), jnp.zeros(()), None, None

    def latent_shape(self, image_size: int) -> Tuple[int, int, int]:
        s = image_size // 8
        return (s, s, self.latent_channels)


def load_sd_vae_weights(path: str, template: dict) -> Optional[dict]:
    """Restore converted weights into the init template (strict=False
    semantics via training.checkpoint.load_into_tree)."""
    if not path or not os.path.exists(path):
        return None
    from ..training.checkpoint import load_into_tree
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    try:
        return load_into_tree(template, flat, strict=True)
    except (KeyError, ValueError) as e:
        print(f"SDVAE weight load failed ({e}); using random init")
        return None


def convert_sd_vae_state_dict(sd: dict) -> dict:
    """Map a diffusers-format AutoencoderKL state dict (numpy values, keys
    like ``encoder.down_blocks.0.resnets.0.conv1.weight``) onto this module's
    flat parameter paths. Pure mapping — proven against a randomly
    initialized torch AutoencoderKL oracle in tests/test_parity_sd_vae.py,
    so the converter is trusted the moment real weights can be fetched."""
    def conv(w):  # OIHW → HWIO
        return np.transpose(w, (2, 3, 1, 0))

    flat: dict = {}

    def put(path, w, b):
        flat[f"{path}/kernel"] = conv(w) if w.ndim == 4 else w.T
        flat[f"{path}/bias"] = b

    def gn(path, g, b):
        flat[f"{path}/scale"] = g
        flat[f"{path}/bias"] = b

    # -- encoder ------------------------------------------------------------
    e = "encoder/params"
    put(f"{e}/Conv_0", sd["encoder.conv_in.weight"], sd["encoder.conv_in.bias"])
    conv_i = 1
    res_i = 0
    gn_i = 0

    def put_resnet(prefix, tree_prefix, has_short):
        nonlocal flat
        gn(f"{tree_prefix}/GroupNorm_0", sd[f"{prefix}.norm1.weight"],
           sd[f"{prefix}.norm1.bias"])
        put(f"{tree_prefix}/Conv_0", sd[f"{prefix}.conv1.weight"],
            sd[f"{prefix}.conv1.bias"])
        gn(f"{tree_prefix}/GroupNorm_1", sd[f"{prefix}.norm2.weight"],
           sd[f"{prefix}.norm2.bias"])
        put(f"{tree_prefix}/Conv_1", sd[f"{prefix}.conv2.weight"],
            sd[f"{prefix}.conv2.bias"])
        if has_short:
            put(f"{tree_prefix}/Conv_2", sd[f"{prefix}.conv_shortcut.weight"],
                sd[f"{prefix}.conv_shortcut.bias"])

    for blk in range(4):
        for r in range(2):
            p = f"encoder.down_blocks.{blk}.resnets.{r}"
            has_short = f"{p}.conv_shortcut.weight" in sd
            put_resnet(p, f"{e}/_Resnet_{res_i}", has_short)
            res_i += 1
        if blk < 3:
            put(f"{e}/Conv_{conv_i}",
                sd[f"encoder.down_blocks.{blk}.downsamplers.0.conv.weight"],
                sd[f"encoder.down_blocks.{blk}.downsamplers.0.conv.bias"])
            conv_i += 1
    put_resnet("encoder.mid_block.resnets.0", f"{e}/_Resnet_{res_i}",
               False); res_i += 1
    a = f"{e}/_Attn_0"
    gn(f"{a}/GroupNorm_0", sd["encoder.mid_block.attentions.0.group_norm.weight"],
       sd["encoder.mid_block.attentions.0.group_norm.bias"])
    for i, nm in enumerate(("to_q", "to_k", "to_v", "to_out.0")):
        put(f"{a}/Dense_{i}",
            sd[f"encoder.mid_block.attentions.0.{nm}.weight"],
            sd[f"encoder.mid_block.attentions.0.{nm}.bias"])
    put_resnet("encoder.mid_block.resnets.1", f"{e}/_Resnet_{res_i}", False)
    gn(f"{e}/GroupNorm_0", sd["encoder.conv_norm_out.weight"],
       sd["encoder.conv_norm_out.bias"])
    put(f"{e}/Conv_{conv_i}", sd["encoder.conv_out.weight"],
        sd["encoder.conv_out.bias"]); conv_i += 1
    put(f"{e}/Conv_{conv_i}", sd["quant_conv.weight"], sd["quant_conv.bias"])

    # -- decoder ------------------------------------------------------------
    d = "decoder/params"
    put(f"{d}/Conv_0", sd["post_quant_conv.weight"], sd["post_quant_conv.bias"])
    put(f"{d}/Conv_1", sd["decoder.conv_in.weight"], sd["decoder.conv_in.bias"])
    res_i = 0
    conv_i = 2
    put_d = lambda p, t, s: put_resnet(p, t, s)
    put_d("decoder.mid_block.resnets.0", f"{d}/_Resnet_{res_i}", False); res_i += 1
    a = f"{d}/_Attn_0"
    gn(f"{a}/GroupNorm_0", sd["decoder.mid_block.attentions.0.group_norm.weight"],
       sd["decoder.mid_block.attentions.0.group_norm.bias"])
    for i, nm in enumerate(("to_q", "to_k", "to_v", "to_out.0")):
        put(f"{a}/Dense_{i}",
            sd[f"decoder.mid_block.attentions.0.{nm}.weight"],
            sd[f"decoder.mid_block.attentions.0.{nm}.bias"])
    put_d("decoder.mid_block.resnets.1", f"{d}/_Resnet_{res_i}", False); res_i += 1
    for blk in range(4):
        for r in range(3):
            p = f"decoder.up_blocks.{blk}.resnets.{r}"
            has_short = f"{p}.conv_shortcut.weight" in sd
            put_resnet(p, f"{d}/_Resnet_{res_i}", has_short)
            res_i += 1
        if blk < 3:
            put(f"{d}/Conv_{conv_i}",
                sd[f"decoder.up_blocks.{blk}.upsamplers.0.conv.weight"],
                sd[f"decoder.up_blocks.{blk}.upsamplers.0.conv.bias"])
            conv_i += 1
    gn(f"{d}/GroupNorm_0", sd["decoder.conv_norm_out.weight"],
       sd["decoder.conv_norm_out.bias"])
    put(f"{d}/Conv_{conv_i}", sd["decoder.conv_out.weight"],
        sd["decoder.conv_out.bias"])
    return flat


def convert_diffusers_sd_vae(out_path: str = "weights/sd_vae_ft_mse.npz",
                             model_name: str = "stabilityai/sd-vae-ft-mse"):
    """One-time converter (requires network + torch + diffusers): fetches the
    pretrained AutoencoderKL, converts with ``convert_sd_vae_state_dict`` and
    saves the flat npz that ``load_sd_vae_weights`` consumes. Run on a
    machine with egress; ship only the npz."""
    from diffusers.models import AutoencoderKL  # type: ignore

    vae = AutoencoderKL.from_pretrained(model_name)
    sd = {k: v.detach().numpy() for k, v in vae.state_dict().items()}
    flat = convert_sd_vae_state_dict(sd)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **flat)
    print(f"wrote {out_path} ({len(flat)} arrays)")
