"""W8A8 int8 serving decode (ops/quant.py): pytree compatibility with the
unquantized model, quantization exactness on representable values, and
end-to-end decode closeness at serving scale."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.models.sd_vae import SDVAE, SDVAEDecoder
from flocoder_tpu.ops.quant import MIN_QUANT_CHANNELS, QuantConv, int8_conv


def test_param_tree_identical_to_nn_conv():
    """quant=True must produce the exact same parameter pytree (names,
    shapes) as the plain decoder, so checkpoints and weight converters
    work unchanged."""
    z = jnp.zeros((1, 4, 4, 4))
    p_plain = SDVAEDecoder(channels=(32, 64)).init(jax.random.PRNGKey(0), z)
    p_quant = SDVAEDecoder(channels=(32, 64), quant=True).init(
        jax.random.PRNGKey(0), z)
    flat_p = jax.tree_util.tree_map_with_path(lambda k, v: v.shape, p_plain)
    flat_q = jax.tree_util.tree_map_with_path(lambda k, v: v.shape, p_quant)
    assert jax.tree_util.tree_structure(flat_p) == \
        jax.tree_util.tree_structure(flat_q)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, flat_p, flat_q))


def test_int8_conv_exact_on_representable_values():
    """With integer-valued inputs/weights scaled so the dynamic scales are
    exactly 1, the quantized conv must be bit-exact vs the fp32 conv."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 32, 32)), jnp.float32)
    # force max-abs = 127 so s = 1 exactly
    x = x.at[0, 0, 0, 0].set(127.0)
    w = w.at[0, 0, 0, :].set(127.0)
    b = jnp.zeros((32,), jnp.float32)
    y_q = int8_conv(x, w, b, (1, 1), ((1, 1), (1, 1)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y_f = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                       dimension_numbers=dn)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_f))


def test_quantconv_small_channels_fall_back():
    """Below MIN_QUANT_CHANNELS the module must match plain nn.Conv to
    dtype precision (it IS the plain path)."""
    from flax import linen as nn
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 6, 6, 4)),
                    jnp.float32)
    qc = QuantConv(4, (1, 1), dtype=jnp.float32)
    pc = nn.Conv(4, (1, 1), dtype=jnp.float32)
    pq = qc.init(jax.random.PRNGKey(2), x)
    assert 4 < MIN_QUANT_CHANNELS
    y_q = qc.apply(pq, x)
    y_p = pc.apply(pq, x)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_p),
                               rtol=1e-5, atol=1e-5)


def test_quantconv_close_to_fp32_conv():
    """At quantized channel counts, W8A8 output stays within int8 error of
    the fp32 conv (relative L2 well under the ~1% quant step)."""
    from flax import linen as nn
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)), jnp.float32)
    qc = QuantConv(64, (3, 3), padding=1, dtype=jnp.float32)
    pc = nn.Conv(64, (3, 3), padding=1, dtype=jnp.float32)
    p = qc.init(jax.random.PRNGKey(4), x)
    y_q = np.asarray(qc.apply(p, x), np.float32)
    y_p = np.asarray(pc.apply(p, x), np.float32)
    rel = np.linalg.norm(y_q - y_p) / np.linalg.norm(y_p)
    assert rel < 0.02, rel


def test_sdvae_quant_decode_close_and_checkpoint_compatible():
    """Full decoder: init the PLAIN model, decode the same latents through
    the quantized decoder USING THE PLAIN PARAMS (checkpoint interop), and
    require the int8 image to stay close to the fp32 one."""
    sd_plain = SDVAE(image_size=32, channels=(32, 64), dtype=jnp.float32)
    sd_quant = SDVAE(image_size=32, channels=(32, 64), dtype=jnp.float32,
                     quant_decode=True)
    x = jnp.zeros((1, 32, 32, 3))
    params = sd_plain.init(jax.random.PRNGKey(0), x)
    z = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 4, 4, 4)) * 4.0,
        jnp.float32)
    img_p = np.asarray(sd_plain.decode(params, z), np.float32)
    img_q = np.asarray(sd_quant.decode(params, z), np.float32)
    rel = np.linalg.norm(img_q - img_p) / max(np.linalg.norm(img_p), 1e-9)
    # random-init decoder; per-layer int8 error compounds over ~25 convs
    assert rel < 0.10, rel
    assert np.isfinite(img_q).all()


def test_setup_codec_quant_decode_flag():
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.codecs import setup_codec
    cfg = config_from_dict({"image_size": 32,
                            "codec": {"choice": "sd",
                                      "quant_decode": "int8"}})
    codec = setup_codec(cfg)
    assert codec.decoder.quant is True
    assert codec.encoder.quant is False
    cfg2 = config_from_dict({"image_size": 32, "codec": {"choice": "sd"}})
    assert setup_codec(cfg2).decoder.quant is False


def test_encoder_param_tree_identical_to_nn_conv():
    """quant_encode=True must produce the exact same parameter pytree as the
    plain encoder — explicit Conv_i names mirror nn.Conv autonaming."""
    from flocoder_tpu.models.sd_vae import SDVAEEncoder
    x = jnp.zeros((1, 16, 16, 3))
    p_plain = SDVAEEncoder(channels=(32, 64)).init(jax.random.PRNGKey(0), x)
    p_quant = SDVAEEncoder(channels=(32, 64), quant=True).init(
        jax.random.PRNGKey(0), x)
    flat_p = jax.tree_util.tree_map_with_path(lambda k, v: v.shape, p_plain)
    flat_q = jax.tree_util.tree_map_with_path(lambda k, v: v.shape, p_quant)
    assert jax.tree_util.tree_structure(flat_p) == \
        jax.tree_util.tree_structure(flat_q)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, flat_p, flat_q))


def test_sdvae_quant_encode_close_and_checkpoint_compatible():
    """Full encoder: init the PLAIN model, encode the same images through
    the quantized encoder USING THE PLAIN PARAMS (checkpoint interop), and
    require the int8 latents to stay close to the fp32 ones."""
    sd_plain = SDVAE(image_size=32, channels=(32, 64), dtype=jnp.float32,
                     weights_path="")
    sd_quant = SDVAE(image_size=32, channels=(32, 64), dtype=jnp.float32,
                     weights_path="", quant_encode=True)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = sd_plain.init(jax.random.PRNGKey(0), x0)
    x = jnp.asarray(
        np.random.default_rng(6).standard_normal((2, 32, 32, 3)),
        jnp.float32)
    z_p = np.asarray(sd_plain.encode(params, x), np.float32)
    z_q = np.asarray(sd_quant.encode(params, x), np.float32)
    rel = np.linalg.norm(z_q - z_p) / max(np.linalg.norm(z_p), 1e-9)
    # random-init encoder; per-layer int8 error compounds over ~12 convs
    assert rel < 0.10, rel
    assert np.isfinite(z_q).all()


def test_setup_codec_quant_encode_flag():
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.codecs import setup_codec
    cfg = config_from_dict({"image_size": 32,
                            "codec": {"choice": "sd",
                                      "quant_encode": "int8"}})
    codec = setup_codec(cfg)
    assert codec.encoder.quant is True
    assert codec.decoder.quant is False


@pytest.mark.parametrize("which", ["vqgan", "vqgan_plus"])
def test_vqgan_quant_param_tree_identical_and_close(which):
    """Both VQGAN-family codecs: the quantized model must share the plain
    model's exact parameter pytree (checkpoint interop) and stay close to
    the fp32 forward on the same params."""
    from flocoder_tpu.models.codecs import VQVAE
    from flocoder_tpu.models.vqgan_plus import VQGANPlus

    kw = dict(in_channels=3, hidden_channels=32, num_downsamples=3,
              internal_dim=64, vq_embedding_dim=4, codebook_levels=2,
              vq_num_embeddings=32)
    cls = VQVAE if which == "vqgan" else VQGANPlus
    plain = cls(**kw)
    quant = cls(**kw, quant_decode=True, quant_encode=True)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 32, 32, 3)),
        jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)
    p_q = quant.init(jax.random.PRNGKey(0), x)
    shapes = lambda t: jax.tree_util.tree_map(lambda v: jnp.shape(v), t)
    assert jax.tree_util.tree_structure(shapes(params)) == \
        jax.tree_util.tree_structure(shapes(p_q))

    z_p = np.asarray(plain.encode(params, x), np.float32)
    z_q = np.asarray(quant.encode(params, x), np.float32)
    rel = np.linalg.norm(z_q - z_p) / max(np.linalg.norm(z_p), 1e-9)
    assert rel < 0.15, rel

    lat = jnp.asarray(z_p)
    img_p = np.asarray(plain.decode(params, lat), np.float32)
    img_q = np.asarray(quant.decode(params, lat), np.float32)
    rel = np.linalg.norm(img_q - img_p) / max(np.linalg.norm(img_p), 1e-9)
    assert rel < 0.15, rel
    assert np.isfinite(img_q).all()


def test_setup_codec_vqgan_quant_flags():
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.codecs import setup_codec
    cfg = config_from_dict({"image_size": 32,
                            "codec": {"choice": "vqgan",
                                      "hidden_channels": 32,
                                      "internal_dim": 64,
                                      "quant_decode": "int8",
                                      "quant_encode": "int8"}})
    codec = setup_codec(cfg)
    assert codec.decoder.quant is True
    assert codec.encoder.quant is True
    cfg2 = config_from_dict({"image_size": 32,
                             "codec": {"choice": "vqgan_plus",
                                       "hidden_channels": 32}})
    codec2 = setup_codec(cfg2)
    assert codec2.decoder.quant is False
    assert codec2.encoder.quant is False
