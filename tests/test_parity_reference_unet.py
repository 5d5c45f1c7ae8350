"""Golden-activation parity: the reference's torch U-Net vs our NHWC flax
U-Net with converted weights (SURVEY.md §4b / §7 'numerical parity audits').

Skips when /root/reference or torch is unavailable. The reference module is
imported (never copied); a stub satisfies its omegaconf dependency.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference repo not mounted", allow_module_level=True)

# stub omegaconf so flocoder.general imports
if "omegaconf" not in sys.modules:
    stub = types.ModuleType("omegaconf")
    stub.OmegaConf = object
    sys.modules["omegaconf"] = stub
sys.path.insert(0, REF)

from flocoder.unet import Unet as RefUnet  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flocoder_tpu.models.unet import Unet  # noqa: E402
from flocoder_tpu.training.checkpoint import (flatten_tree, load_into_tree)  # noqa: E402

DIM, MULTS, CH, NCLS = 8, (1, 2), 2, 4


def _conv(w):  # OIHW → HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):  # (out,in) → (in,out)
    return w.T


def convert_reference_unet(sd: dict) -> dict:
    """Map the reference torch state_dict onto our flat param paths for the
    (dim=8, mults=(1,2), channels=2, n_classes=4) configuration."""
    out = {}

    def conv_mod(path, prefix, bias=True):
        out[f"{path}/kernel"] = _conv(sd[f"{prefix}.weight"])
        if bias:
            out[f"{path}/bias"] = sd[f"{prefix}.bias"]

    def lin_mod(path, prefix):
        out[f"{path}/kernel"] = _lin(sd[f"{prefix}.weight"])
        out[f"{path}/bias"] = sd[f"{prefix}.bias"]

    def gn_mod(path, prefix):
        out[f"{path}/scale"] = sd[f"{prefix}.weight"]
        out[f"{path}/bias"] = sd[f"{prefix}.bias"]

    def resnet(our, ref):
        lin_mod(f"{our}/Dense_0", f"{ref}.mlp.1")
        conv_mod(f"{our}/Block_0/Conv_0", f"{ref}.block1.proj")
        gn_mod(f"{our}/Block_0/GroupNorm_0", f"{ref}.block1.norm")
        conv_mod(f"{our}/Block_1/Conv_0", f"{ref}.block2.proj")
        gn_mod(f"{our}/Block_1/GroupNorm_0", f"{ref}.block2.norm")
        if f"{ref}.res_conv.weight" in sd:
            conv_mod(f"{our}/Conv_0", f"{ref}.res_conv")

    def lin_attn(pre_our, attn_our, ref):
        gn_mod(f"{pre_our}/GroupNorm_0", f"{ref}.fn.norm")
        conv_mod(f"{attn_our}/Conv_0", f"{ref}.fn.fn.to_qkv", bias=False)
        conv_mod(f"{attn_our}/Conv_1", f"{ref}.fn.fn.to_out.0")
        gn_mod(f"{attn_our}/GroupNorm_0", f"{ref}.fn.fn.to_out.1")

    p = "params"
    conv_mod(f"{p}/init_conv", "init_conv")
    lin_mod(f"{p}/Dense_0", "time_mlp.1")
    lin_mod(f"{p}/Dense_1", "time_mlp.3")
    out[f"{p}/Embed_0/embedding"] = sd["class_cond_mlp.0.weight"]
    lin_mod(f"{p}/Dense_2", "class_cond_mlp.1")
    lin_mod(f"{p}/Dense_3", "class_cond_mlp.3")
    # downs: scale 0 (has Downsample), scale 1 (is_last → plain conv)
    resnet(f"{p}/ResnetBlock_0", "downs.0.0")
    resnet(f"{p}/ResnetBlock_1", "downs.0.1")
    lin_attn(f"{p}/PreNormResidual_0", f"{p}/LinearAttention_0", "downs.0.2")
    conv_mod(f"{p}/Downsample_0/Conv_0", "downs.0.3.1")
    resnet(f"{p}/ResnetBlock_2", "downs.1.0")
    resnet(f"{p}/ResnetBlock_3", "downs.1.1")
    lin_attn(f"{p}/PreNormResidual_1", f"{p}/LinearAttention_1", "downs.1.2")
    conv_mod(f"{p}/Conv_0", "downs.1.3")
    # mid
    resnet(f"{p}/ResnetBlock_4", "mid_block1")
    gn_mod(f"{p}/PreNormResidual_2/GroupNorm_0", "mid_attn.fn.norm")
    conv_mod(f"{p}/Attention_0/Conv_0", "mid_attn.fn.fn.to_qkv", bias=False)
    conv_mod(f"{p}/Attention_0/Conv_1", "mid_attn.fn.fn.to_out")
    resnet(f"{p}/ResnetBlock_5", "mid_block2")
    # ups: iter 0 (has Upsample), iter 1 (is_last → plain conv)
    resnet(f"{p}/ResnetBlock_6", "ups.0.0")
    resnet(f"{p}/ResnetBlock_7", "ups.0.1")
    lin_attn(f"{p}/PreNormResidual_3", f"{p}/LinearAttention_2", "ups.0.2")
    conv_mod(f"{p}/Upsample_0/Conv_0", "ups.0.3.1")
    resnet(f"{p}/ResnetBlock_8", "ups.1.0")
    resnet(f"{p}/ResnetBlock_9", "ups.1.1")
    lin_attn(f"{p}/PreNormResidual_4", f"{p}/LinearAttention_3", "ups.1.2")
    conv_mod(f"{p}/Conv_1", "ups.1.3")
    # final
    resnet(f"{p}/ResnetBlock_10", "final_res_block")
    conv_mod(f"{p}/final_conv", "final_conv")
    return out


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref = RefUnet(dim=DIM, dim_mults=MULTS, channels=CH, n_classes=NCLS)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    ours = Unet(dim=DIM, dim_mults=MULTS, channels=CH, n_classes=NCLS)
    template = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, CH)),
                         jnp.zeros((1,)),
                         {"class_cond": jnp.zeros((1,), jnp.int32),
                          "mask_cond": None})
    converted = convert_reference_unet(sd)
    params = load_into_tree(template, converted, strict=True)
    return ref, ours, params


def _run_both(models, x_nhwc, t, class_cond):
    ref, ours, params = models
    with torch.no_grad():
        cond = None
        if class_cond is not None:
            cond = {"class_cond": torch.tensor(np.asarray(class_cond)),
                    "mask_cond": None}
        ref_out = ref(torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2))),
                      torch.tensor(t), cond)
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    our_cond = None
    if class_cond is not None:
        our_cond = {"class_cond": jnp.asarray(class_cond), "mask_cond": None}
    our_out = np.asarray(ours.apply(params, jnp.asarray(x_nhwc),
                                    jnp.asarray(t), our_cond))
    return ref_out, our_out


def test_unconditional_forward_matches(models):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, CH)).astype(np.float32)
    t = np.asarray([100.0, 500.0], np.float32)
    ref_out, our_out = _run_both(models, x, t, None)
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4, rtol=1e-3)


def test_class_conditional_forward_matches(models):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, CH)).astype(np.float32)
    t = np.asarray([7.0, 999.0], np.float32)
    cls = np.asarray([1, 3], np.int32)
    ref_out, our_out = _run_both(models, x, t, cls)
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4, rtol=1e-3)
