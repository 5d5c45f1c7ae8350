"""Dynamic W8A8 int8 quantization for serving-time convolutions.

TPU rationale: the MXU runs int8×int8→int32 at ~2× the bf16 rate (v5e:
394 int8 TOPS vs 197 bf16 TFLOPs). Measured through XLA on this chip
(benchmarks/int8_probe.py, value-fetch timing): int8 conv beats bf16 by
1.27–1.29× at the SD-VAE-decoder-dominant shapes (64×128²×128,
64×64²×256, 64×32²×512, k=3) — less than the 2× paper ratio because the
dequant/requant elementwise traffic rides the VPU, but a real win on the
serving path, where the decode is ~73% of the e2e sampler step
(69.7 ms of ~95 ms at B=64, AB4-25).

Scheme (post-training, no calibration pass needed):
- weights: symmetric per-output-channel int8, scales from max-|w| —
  computed from the fp32/bf16 kernel at trace time, so any existing
  checkpoint (including converted diffusers weights, models/sd_vae.py)
  works unchanged;
- activations: symmetric per-tensor DYNAMIC int8 (max-|x| of the live
  tensor), quantized in bf16 arithmetic (cheap; int8's own step is ~0.8%
  so bf16's ~0.4% mantissa error is immaterial);
- accumulation in int32 on the MXU (``preferred_element_type``), dequant
  to fp32 scale, bias add, cast back to the module dtype.

``QuantConv`` is a drop-in for the ``nn.Conv`` call sites in the codec
decoders: same param names ("kernel"/"bias"), shapes and initializers, so
the parameter pytree — and therefore every checkpoint and weight
converter — is IDENTICAL to the unquantized model's. Convs too small to
earn MXU int8 time (min(C_in, C_out) < 32, e.g. 4-channel post-quant 1×1s
and the 3-channel output head) silently run the plain dtype path; the
output head additionally stays high-precision to protect final pixel
values.

This is a serving feature (reference has no quantization story; TPU-native
addition): wire with ``+quant=int8`` in generate_samples.py or
``codec.quant_decode: int8`` in configs.
"""
from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["int8_conv", "QuantConv", "MIN_QUANT_CHANNELS"]

MIN_QUANT_CHANNELS = 32


def _normalize_padding(padding, kernel_size):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return tuple((padding, padding) for _ in kernel_size)
    # sequence of ints or pairs
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return tuple(out)


def int8_conv(x: jax.Array, kernel: jax.Array, bias, strides, padding,
              out_dtype) -> jax.Array:
    """W8A8 dynamic-quantized NHWC conv: int8 operands, int32 MXU
    accumulation, fp32 dequant. ``kernel`` is HWIO (flax layout)."""
    # weights: per-output-channel symmetric scales from the live kernel
    w32 = kernel.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(w32), axis=(0, 1, 2)) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(w32 / s_w), -127, 127).astype(jnp.int8)

    # activations: per-tensor dynamic scale, quantize in bf16 (see module
    # docstring for the precision argument)
    x_bf = x.astype(jnp.bfloat16)
    s_x = jnp.maximum(jnp.max(jnp.abs(x_bf.astype(jnp.float32))) / 127.0,
                      1e-12)
    x_q = jnp.clip(jnp.round(x_bf / s_x.astype(jnp.bfloat16)),
                   -127, 127).astype(jnp.int8)

    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=tuple(strides), padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantConv(nn.Module):
    """Drop-in for the ``nn.Conv`` call sites in codec encoders/decoders
    (SD-VAE, VQVAE, VQGAN+ — all behind ``codec.quant_{encode,decode}``), with the
    identical parameter tree ("kernel" HWIO + "bias"; lecun_normal/zeros
    init — flax nn.Conv defaults), running the W8A8 path when both channel
    counts are ≥ MIN_QUANT_CHANNELS and the plain-dtype conv otherwise."""
    features: int
    kernel_size: Sequence[int]
    strides: Union[int, Sequence[int]] = 1
    padding: Any = "SAME"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            ks + (in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        strides = ((self.strides,) * len(ks)
                   if isinstance(self.strides, int) else tuple(self.strides))
        padding = _normalize_padding(self.padding, ks)
        if min(in_ch, self.features) >= MIN_QUANT_CHANNELS:
            return int8_conv(x, kernel, bias, strides, padding, self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=strides, padding=padding,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")))
        return y + bias.astype(self.dtype)
