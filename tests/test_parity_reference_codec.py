"""Golden-activation parity for codec building blocks vs the reference torch
implementations (EncDecResidualBlock, AttnBlock). The reference module is
imported with stubs for its unavailable deps (vector_quantize_pytorch,
natten); never copied."""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
if not os.path.isdir(REF):
    pytest.skip("reference repo not mounted", allow_module_level=True)

for name, attrs in [("omegaconf", {"OmegaConf": object}),
                    ("vector_quantize_pytorch", {"ResidualVQ": object,
                                                 "VectorQuantize": object})]:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
sys.path.insert(0, REF)

from flocoder.codecs import EncDecResidualBlock as RefBlock  # noqa: E402
from flocoder.codecs import AttnBlock as RefAttn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flocoder_tpu.models.codecs import EncDecResidualBlock, AttnBlock  # noqa: E402
from flocoder_tpu.training.checkpoint import load_into_tree  # noqa: E402


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def test_encdec_residual_block_matches(capsys):
    torch.manual_seed(0)
    ref = RefBlock(8, 16, stride=2, attention=None, dropout_rate=0.0)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    ours = EncDecResidualBlock(out_channels=16, stride=2, attention=None,
                               dropout_rate=0.0)
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 8)).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = {
        "params/Conv_0/kernel": _conv(sd["conv1.weight"]),
        "params/Conv_0/bias": sd["conv1.bias"],
        "params/GroupNorm_0/scale": sd["norm1.weight"],
        "params/GroupNorm_0/bias": sd["norm1.bias"],
        "params/Conv_1/kernel": _conv(sd["conv2.weight"]),
        "params/Conv_1/bias": sd["conv2.bias"],
        "params/GroupNorm_1/scale": sd["norm2.weight"],
        "params/GroupNorm_1/bias": sd["norm2.bias"],
        "params/Conv_2/kernel": _conv(sd["downsample.0.weight"]),
        "params/Conv_2/bias": sd["downsample.0.bias"],
        "params/GroupNorm_2/scale": sd["downsample.1.weight"],
        "params/GroupNorm_2/bias": sd["downsample.1.bias"],
    }
    params = load_into_tree(template, converted, strict=True)
    our_out = np.asarray(ours.apply(params, jnp.asarray(x),
                                    deterministic=True))
    with torch.no_grad():
        ref_out = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    capsys.readouterr()  # swallow the reference's NaN-probe prints
    assert our_out.shape == ref_out.shape == (2, 4, 4, 16)
    np.testing.assert_allclose(our_out, ref_out, atol=2e-5, rtol=1e-4)


def test_attn_block_matches():
    torch.manual_seed(1)
    ref = RefAttn(16)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = AttnBlock()
    x = np.random.default_rng(1).normal(size=(1, 6, 6, 16)).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted = {
        "params/GroupNorm_0/scale": sd["norm.norm.weight"],
        "params/GroupNorm_0/bias": sd["norm.norm.bias"],
        "params/Conv_0/kernel": _conv(sd["q.weight"]),
        "params/Conv_0/bias": sd["q.bias"],
        "params/Conv_1/kernel": _conv(sd["k.weight"]),
        "params/Conv_1/bias": sd["k.bias"],
        "params/Conv_2/kernel": _conv(sd["v.weight"]),
        "params/Conv_2/bias": sd["v.bias"],
        "params/Conv_3/kernel": _conv(sd["proj_out.weight"]),
        "params/Conv_3/bias": sd["proj_out.bias"],
    }
    params = load_into_tree(template, converted, strict=True)
    our_out = np.asarray(ours.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        ref_out = ref(torch.tensor(np.transpose(x, (0, 3, 1, 2))))
    ref_out = np.transpose(ref_out.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-5, rtol=1e-4)
