"""U-Net shape/conditioning tests (SURVEY.md §4 strategy (a))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.models.unet import Unet, sinusoidal_embedding, pixel_shuffle, pixel_unshuffle


def test_sinusoidal_embedding_shape_and_range():
    t = jnp.array([0.0, 500.0, 999.0])
    e = sinusoidal_embedding(t, 16)
    assert e.shape == (3, 16)
    assert float(jnp.max(jnp.abs(e))) <= 1.0 + 1e-6


def test_pixel_shuffle_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12))
    y = pixel_unshuffle(x, 2)
    assert y.shape == (2, 4, 4, 48)
    z = pixel_shuffle(y, 2)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-6)


@pytest.fixture(scope="module")
def small_unet():
    model = Unet(dim=16, dim_mults=(1, 2), channels=4, n_classes=10)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.zeros((2,))
    cond = {"class_cond": jnp.zeros((2,), jnp.int32), "mask_cond": None}
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    return model, params


def test_unet_output_shape(small_unet):
    model, params = small_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.full((2,), 500.0)
    cond = {"class_cond": jnp.array([1, 2]), "mask_cond": None}
    v = model.apply(params, x, t, cond)
    assert v.shape == x.shape
    assert v.dtype == jnp.float32


def test_unet_class_conditioning_matters(small_unet):
    model, params = small_unet
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    t = jnp.full((2,), 100.0)
    v1 = model.apply(params, x, t, {"class_cond": jnp.array([1, 1]), "mask_cond": None})
    v2 = model.apply(params, x, t, {"class_cond": jnp.array([5, 5]), "mask_cond": None})
    assert float(jnp.max(jnp.abs(v1 - v2))) > 1e-6


def test_unet_null_class_equals_no_cond(small_unet):
    """Class id -1 (CFG null token) must equal cond=None exactly."""
    model, params = small_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 4))
    t = jnp.full((2,), 100.0)
    v_null = model.apply(params, x, t, {"class_cond": jnp.array([-1, -1]), "mask_cond": None})
    v_none = model.apply(params, x, t, None)
    np.testing.assert_allclose(np.asarray(v_null), np.asarray(v_none), atol=1e-5)


def test_unet_jit_compiles(small_unet):
    model, params = small_unet
    x = jnp.ones((2, 16, 16, 4))
    t = jnp.full((2,), 10.0)
    f = jax.jit(lambda p, x, t: model.apply(p, x, t, None))
    v = f(params, x, t)
    assert v.shape == x.shape


def test_unet_mask_cond():
    model = Unet(dim=8, dim_mults=(1, 2), channels=2, n_classes=0,
                 mask_cond=True, mask_channels=2)
    x = jnp.zeros((2, 16, 16, 2))
    t = jnp.zeros((2,))
    mask = jnp.zeros((2, 16, 16, 2))
    cond = {"class_cond": None, "mask_cond": mask}
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    v = model.apply(params, x, t, cond)
    assert v.shape == x.shape
    # half-masked input differs from all-zeros mask
    mask2 = mask.at[:, :8].set(1.0)
    v2 = model.apply(params, x, t, {"class_cond": None, "mask_cond": mask2})
    assert float(jnp.max(jnp.abs(v - v2))) > 1e-7


def test_unet_3_scales_odd_latent():
    model = Unet(dim=16, dim_mults=(1, 2, 4), channels=3, n_classes=0)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, t, None)
    v = model.apply(params, x, t, None)
    assert v.shape == x.shape
