"""On-device augmentation pipeline (data/device_augs.py) vs the host
reference pipeline (data/transforms.py; reference: data.py:97-111)."""
import jax
import jax.numpy as jnp
import numpy as np

from flocoder_tpu.data.device_augs import (default_src_size, load_resized,
                                           make_device_augment)


def _imgs(b=4, s0=40, c=3, seed=0):
    return np.random.default_rng(seed).random((b, s0, s0, c)).astype(
        np.float32)


def test_identity_configuration_is_resize():
    """rotate=0, crop=1.0, scale=(1,1), ratio=(1,1), no flip, src==out size
    → the pipeline is the identity (up to normalize)."""
    S = 32
    aug = make_device_augment(S, src_size=S, rotate_deg=0.0, center_crop=1.0,
                              rrc_scale=(1.0, 1.0), rrc_ratio=(1.0, 1.0),
                              hflip=0.0)
    x = _imgs(2, S)
    out = np.asarray(aug(jnp.asarray(x), jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out, (x - 0.5) / 0.5, atol=1e-5)


def test_shapes_range_determinism():
    S, S0, B = 24, default_src_size(24), 6
    aug = make_device_augment(S, src_size=S0)
    x = jnp.asarray(_imgs(B, S0))
    o1 = np.asarray(aug(x, jax.random.PRNGKey(3)))
    o2 = np.asarray(aug(x, jax.random.PRNGKey(3)))
    o3 = np.asarray(aug(x, jax.random.PRNGKey(4)))
    assert o1.shape == (B, S, S, 3)
    assert o1.min() >= -1.0 - 1e-5 and o1.max() <= 1.0 + 1e-5
    np.testing.assert_array_equal(o1, o2)     # frozen-aug reproducibility
    assert np.abs(o1 - o3).max() > 1e-3       # different key → different augs


def test_flip_occurs_and_preserves_content():
    """With hflip=1.0 and otherwise-identity config the output is exactly the
    mirrored input."""
    S = 16
    aug = make_device_augment(S, src_size=S, rotate_deg=0.0, center_crop=1.0,
                              rrc_scale=(1.0, 1.0), rrc_ratio=(1.0, 1.0),
                              hflip=1.0)
    x = _imgs(1, S)
    out = np.asarray(aug(jnp.asarray(x), jax.random.PRNGKey(0)))
    np.testing.assert_allclose(out, (x[:, :, ::-1] - 0.5) / 0.5, atol=1e-5)


def test_distribution_matches_host_pipeline():
    """Aggregate statistics of many device augs of one image track the host
    PIL pipeline (same laws, different samplers — loose tolerance)."""
    from PIL import Image
    from flocoder_tpu.data.transforms import image_transforms

    S = 24
    rng = np.random.default_rng(7)
    base = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    pil = Image.fromarray(base)

    host_tf = image_transforms(S)
    host = np.stack([host_tf(pil, np.random.default_rng(i))
                     for i in range(64)])

    S0 = default_src_size(S)
    src = np.stack([load_resized(pil, S0)] * 64)
    aug = make_device_augment(S, src_size=S0)
    dev = np.asarray(aug(jnp.asarray(src), jax.random.PRNGKey(0)))

    assert abs(host.mean() - dev.mean()) < 0.05
    assert abs(host.std() - dev.std()) < 0.05


def test_rotation_fills_corners_with_black():
    """A large rotation on an all-ones image pulls zero fill into corners
    (PIL rotate semantics) once the crop window spans the full frame."""
    S = 32
    aug = make_device_augment(S, src_size=S, rotate_deg=45.0,
                              center_crop=1.0, rrc_scale=(1.0, 1.0),
                              rrc_ratio=(1.0, 1.0), hflip=0.0)
    x = jnp.ones((8, S, S, 3), jnp.float32)
    out = np.asarray(aug(x, jax.random.PRNGKey(1)))
    # normalized zero-fill is -1; some sample must show it in a corner
    corners = out[:, [0, 0, -1, -1], [0, -1, 0, -1], :]
    assert corners.min() < -0.9
