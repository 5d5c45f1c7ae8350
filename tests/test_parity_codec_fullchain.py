"""Full-chain golden parity: the reference torch VQVAE's complete
encoder→(identity VQ)→decoder forward vs our flax VQVAE with converted
weights (VERDICT r1 item 3; extends the 2-block parity of
test_parity_reference_codec.py to the whole chain incl. the compression
head, RoPE SpatialNonLocalAttention, NoiseInjection convs, PixelShuffle
upsampling and the full AttnBlock decoder block).

The RVQ bottleneck is identity-stubbed on the torch side
(vector_quantize_pytorch is not installed here); our RVQ numerics are
covered by tests/test_rvq.py. natten is absent → reference built with
no_natten=True, matching our use_attention=False.
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


class _IdentityRVQ(torch.nn.Module):
    """Shape-faithful identity stand-in for vector_quantize_pytorch's
    ResidualVQ: z_q = z, zero indices/commit-loss."""

    def __init__(self, dim=4, num_quantizers=1, **_):
        super().__init__()
        self.dim, self.num_quantizers = dim, num_quantizers

    def forward(self, z):
        idx = torch.zeros(z.shape[0], self.num_quantizers, dtype=torch.long)
        return z, idx, torch.zeros(self.num_quantizers)


def _install_stubs():
    for name, attrs in [("omegaconf", {"OmegaConf": object}),
                        ("vector_quantize_pytorch",
                         {"ResidualVQ": _IdentityRVQ,
                          "VectorQuantize": _IdentityRVQ})]:
        mod = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


_install_stubs()
sys.path.insert(0, REF)
import flocoder.codecs as ref_codecs  # noqa: E402

# flocoder.codecs may have been imported earlier with an inert stub bound in
# its namespace — rebind the functional identity RVQ unconditionally.
ref_codecs.ResidualVQ = _IdentityRVQ

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flocoder_tpu.models.codecs import VQVAE  # noqa: E402
from flocoder_tpu.training.checkpoint import load_into_tree  # noqa: E402

# tiny flagship-shaped config: 3→[8,16]→internal 16→vq_dim 4, 16² images
CFG = dict(in_channels=3, hidden_channels=8, num_downsamples=2,
           internal_dim=16, vq_embedding_dim=4, codebook_levels=2,
           vq_num_embeddings=16)


def _conv(w):  # OIHW → HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _convert_block(out, sd, our, ref, attn=None):
    """EncDecResidualBlock mapping (same scheme as the 2-block test)."""
    out[f"{our}/Conv_0/kernel"] = _conv(sd[f"{ref}.conv1.weight"])
    out[f"{our}/Conv_0/bias"] = sd[f"{ref}.conv1.bias"]
    out[f"{our}/GroupNorm_0/scale"] = sd[f"{ref}.norm1.weight"]
    out[f"{our}/GroupNorm_0/bias"] = sd[f"{ref}.norm1.bias"]
    out[f"{our}/Conv_1/kernel"] = _conv(sd[f"{ref}.conv2.weight"])
    out[f"{our}/Conv_1/bias"] = sd[f"{ref}.conv2.bias"]
    out[f"{our}/GroupNorm_1/scale"] = sd[f"{ref}.norm2.weight"]
    out[f"{our}/GroupNorm_1/bias"] = sd[f"{ref}.norm2.bias"]
    if f"{ref}.downsample.0.weight" in sd:
        out[f"{our}/Conv_2/kernel"] = _conv(sd[f"{ref}.downsample.0.weight"])
        out[f"{our}/Conv_2/bias"] = sd[f"{ref}.downsample.0.bias"]
        out[f"{our}/GroupNorm_2/scale"] = sd[f"{ref}.downsample.1.weight"]
        out[f"{our}/GroupNorm_2/bias"] = sd[f"{ref}.downsample.1.bias"]
    if attn == "full":
        a = f"{our}/AttnBlock_0"
        out[f"{a}/GroupNorm_0/scale"] = sd[f"{ref}.attn.norm.norm.weight"]
        out[f"{a}/GroupNorm_0/bias"] = sd[f"{ref}.attn.norm.norm.bias"]
        for i, nm in enumerate(["q", "k", "v", "proj_out"]):
            out[f"{a}/Conv_{i}/kernel"] = _conv(sd[f"{ref}.attn.{nm}.weight"])
            out[f"{a}/Conv_{i}/bias"] = sd[f"{ref}.attn.{nm}.bias"]


def _convert_noise(out, sd, our, ref):
    out[f"{our}/Conv_0/kernel"] = _conv(sd[f"{ref}.to_noise_scale.weight"])
    out[f"{our}/Conv_0/bias"] = sd[f"{ref}.to_noise_scale.bias"]
    out[f"{our}/Conv_1/kernel"] = _conv(sd[f"{ref}.to_noise_bias.weight"])
    out[f"{our}/Conv_1/bias"] = sd[f"{ref}.to_noise_bias.bias"]


def _convert_conv(out, sd, our, ref):
    out[f"{our}/kernel"] = _conv(sd[f"{ref}.weight"])
    out[f"{our}/bias"] = sd[f"{ref}.bias"]


def _convert_gn(out, sd, our, ref):
    out[f"{our}/scale"] = sd[f"{ref}.weight"]
    out[f"{our}/bias"] = sd[f"{ref}.bias"]


def convert_encoder(sd):
    """Reference DebuggingSequential indices (codecs.py:413-443) → our
    VQVAEEncoder auto-names, for num_downsamples=2."""
    out = {}
    for b in range(5):  # 2 per scale ×2 scales + the internal_dim block
        _convert_block(out, sd, f"params/EncDecResidualBlock_{b}",
                       f"encoder.{b}")
    _convert_conv(out, sd, "params/Conv_0", "encoder.5")   # internal 1×1
    _convert_conv(out, sd, "params/Conv_1", "encoder.6")   # compress 1×1
    _convert_gn(out, sd, "params/GroupNorm_0", "encoder.7")
    _convert_conv(out, sd, "params/Conv_2", "encoder.9")   # compress 3×3
    return out


def convert_decoder(sd):
    """Reference Decoder.layers indices (codecs.py:245-316) → our
    VQVAEDecoder auto-names, for num_downsamples=2 + decoder_nonlocal."""
    out = {}
    p = "params/SpatialNonLocalAttention_0"
    for i, nm in enumerate(["q_proj", "k_proj", "v_proj", "out_proj"]):
        _convert_conv(out, sd, f"{p}/Conv_{i}", f"decoder.layers.0.{nm}")
    _convert_conv(out, sd, "params/Conv_0", "decoder.layers.1")
    _convert_gn(out, sd, "params/GroupNorm_0", "decoder.layers.2")
    _convert_conv(out, sd, "params/Conv_1", "decoder.layers.4")
    _convert_noise(out, sd, "params/NoiseInjection_0", "decoder.layers.5")
    _convert_block(out, sd, "params/EncDecResidualBlock_0",
                   "decoder.layers.6", attn="full")
    # two upsampling scales: layers 7-13 then 14-20
    for s, base in enumerate([7, 14]):
        _convert_conv(out, sd, f"params/Conv_{2 + s}",
                      f"decoder.layers.{base}")
        _convert_noise(out, sd, f"params/NoiseInjection_{1 + 2 * s}",
                       f"decoder.layers.{base + 3}")
        _convert_block(out, sd, f"params/EncDecResidualBlock_{1 + 2 * s}",
                       f"decoder.layers.{base + 4}")
        _convert_noise(out, sd, f"params/NoiseInjection_{2 + 2 * s}",
                       f"decoder.layers.{base + 5}")
        _convert_block(out, sd, f"params/EncDecResidualBlock_{2 + 2 * s}",
                       f"decoder.layers.{base + 6}")
    _convert_noise(out, sd, "params/NoiseInjection_5", "decoder.layers.21")
    _convert_conv(out, sd, "params/Conv_4", "decoder.layers.22")
    _convert_noise(out, sd, "params/NoiseInjection_6", "decoder.layers.24")
    _convert_conv(out, sd, "params/Conv_5", "decoder.layers.25")
    return out


@pytest.mark.slow
def test_vqvae_fullchain_matches_reference(capsys):
    torch.manual_seed(0)
    ref = ref_codecs.VQVAE(no_natten=True, **CFG).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    ours = VQVAE(use_attention=False, **CFG)
    x = np.random.default_rng(0).normal(
        size=(2, 16, 16, 3)).astype(np.float32) * 0.5
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(params)
    params["encoder"] = load_into_tree(params["encoder"],
                                       convert_encoder(sd), strict=True)
    params["decoder"] = load_into_tree(params["decoder"],
                                       convert_decoder(sd), strict=True)

    x_t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        z_ref = ref.encode(x_t, debug=False)
        recon_ref, _ = ref(x_t)
    capsys.readouterr()  # swallow the reference's debug prints

    z_ours = np.asarray(ours.encode(params, jnp.asarray(x)))
    z_ref_nhwc = np.transpose(z_ref.numpy(), (0, 2, 3, 1))
    assert z_ours.shape == z_ref_nhwc.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(z_ours, z_ref_nhwc, atol=5e-5, rtol=1e-4)

    # identity-VQ full chain: decode(encode(x)) must match reference forward
    recon_ours = np.asarray(ours.decode(params, jnp.asarray(z_ours)))
    recon_ref_nhwc = np.transpose(recon_ref.numpy(), (0, 2, 3, 1))
    assert recon_ours.shape == recon_ref_nhwc.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(recon_ours, recon_ref_nhwc,
                               atol=1e-4, rtol=1e-3)
