"""SD-VAE converter + forward parity (VERDICT r1 item 3): run
`convert_sd_vae_state_dict` against a randomly-initialized torch
AutoencoderKL with diffusers state_dict naming (oracles/torch_sd_vae.py) and
verify the flax encode/decode matches the torch forward ≤1e-4 — proving the
converter and architecture are reference-grade before real weights exist
(reference: flocoder/codecs.py:631-663, no egress here for the actual
sd-vae-ft-mse checkpoint)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flocoder_tpu.models.sd_vae import (SDVAE,  # noqa: E402
                                        convert_sd_vae_state_dict)
from flocoder_tpu.training.checkpoint import load_into_tree  # noqa: E402

CH = (32, 32, 64, 64)  # small but GroupNorm(32)-compatible, like diffusers


@pytest.mark.slow
def test_sd_vae_converter_and_forward_match_torch_oracle():
    from oracles.torch_sd_vae import AutoencoderKL
    torch.manual_seed(0)
    oracle = AutoencoderKL(channels=CH).eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    flat = convert_sd_vae_state_dict(sd)
    assert len(flat) == len(sd), (len(flat), len(sd))  # nothing dropped

    ours = SDVAE(image_size=32, channels=CH, weights_path="")
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
        np.float32) * 0.5
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = load_into_tree(params, flat, strict=True)

    with torch.no_grad():
        x_t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
        z_ref = oracle.encode_mean(x_t)
        rec_ref = oracle.decode(z_ref)

    z_ours = np.asarray(ours.encode(params, jnp.asarray(x)))
    z_ref_nhwc = np.transpose(z_ref.numpy(), (0, 2, 3, 1))
    assert z_ours.shape == z_ref_nhwc.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(z_ours, z_ref_nhwc, atol=1e-4, rtol=1e-3)

    rec_ours = np.asarray(ours.decode(params, jnp.asarray(z_ours)))
    rec_ref_nhwc = np.transpose(rec_ref.numpy(), (0, 2, 3, 1))
    assert rec_ours.shape == rec_ref_nhwc.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(rec_ours, rec_ref_nhwc, atol=2e-4, rtol=1e-3)
