"""Native C++ image decode/resize (native/fcimage.cpp) vs PIL parity.

The native path must reproduce PIL's convert("RGB") decode semantics
exactly (PNG is lossless; JPEG decode is bit-exact against this box's
libjpeg, which PIL links too) and PIL's BILINEAR triangle resample within
fixed-point quantization (±2/255 — PIL quantizes filter coefficients to
8-bit, the native kernel accumulates in float32).
"""
import os

import numpy as np
import pytest

from flocoder_tpu.data.native_image import (NativeLoadResized, available,
                                            decode_resize,
                                            decode_resize_batch)

pytestmark = pytest.mark.skipif(not available(),
                                reason="native image lib unavailable")


@pytest.fixture()
def images(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    sq = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (128, 96, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    paths = {}
    Image.fromarray(sq).save(tmp_path / "sq.png")
    Image.fromarray(big).save(tmp_path / "big.png")
    Image.fromarray(big).save(tmp_path / "big.jpg", quality=95)
    Image.fromarray(gray, "L").save(tmp_path / "gray.png")
    rgba = np.dstack([sq, rng.integers(0, 256, (40, 40), dtype=np.uint8)])
    Image.fromarray(rgba, "RGBA").save(tmp_path / "rgba.png")
    paths.update(sq=sq, big=big, gray=gray, rgba=rgba, dir=tmp_path)
    return paths


def test_png_decode_exact(images):
    out = decode_resize(str(images["dir"] / "sq.png"), 40)
    np.testing.assert_array_equal(out, images["sq"])


def test_gray_and_alpha_match_pil_convert_rgb(images):
    out = decode_resize(str(images["dir"] / "gray.png"), 40)
    np.testing.assert_array_equal(out, np.stack([images["gray"]] * 3, -1))
    # PIL convert("RGB") drops alpha without compositing
    out = decode_resize(str(images["dir"] / "rgba.png"), 40)
    np.testing.assert_array_equal(out, images["rgba"][..., :3])


def test_jpeg_decode_matches_pil(images):
    from PIL import Image
    pil = np.asarray(Image.open(images["dir"] / "big.jpg").convert("RGB"))
    # decoding at the JPEG's own (non-square) size isn't expressible through
    # the square API; resample both through the same target instead
    ours = decode_resize(str(images["dir"] / "big.jpg"), 64).astype(np.int16)
    ref = np.asarray(Image.fromarray(pil).resize((64, 64), Image.BILINEAR)
                     ).astype(np.int16)
    assert np.abs(ours - ref).max() <= 2


@pytest.mark.parametrize("target", [48, 96, 200])
def test_resample_matches_pil_bilinear(images, target):
    from PIL import Image
    ours = decode_resize(str(images["dir"] / "big.png"),
                         target).astype(np.int16)
    ref = np.asarray(Image.fromarray(images["big"]).resize(
        (target, target), Image.BILINEAR)).astype(np.int16)
    assert np.abs(ours - ref).max() <= 2


def test_batch_threaded_matches_single_and_flags_failures(images, tmp_path):
    paths = [str(images["dir"] / n) for n in
             ("sq.png", "big.png", "big.jpg", "gray.png")]
    bad = str(tmp_path / "missing.png")
    out, ok = decode_resize_batch(paths + [bad], 48, n_threads=4)
    assert ok.tolist() == [True, True, True, True, False]
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(out[i], decode_resize(p, 48))


def test_native_load_resized_transform(images):
    """The wants_path transform returns float32 [0,1] and plugs into
    ImageFolderDataset's path-based fast lane."""
    from flocoder_tpu.data.datasets import ImageFolderDataset
    tf = NativeLoadResized(32)
    assert tf.wants_path
    arr = tf(str(images["dir"] / "sq.png"))
    assert arr.shape == (32, 32, 3) and arr.dtype == np.float32
    assert 0.0 <= arr.min() and arr.max() <= 1.0

    ds = ImageFolderDataset(str(images["dir"]), transform=tf)
    rng = np.random.default_rng(0)
    x, label = ds.get(0, rng)
    assert x.shape == (32, 32, 3) and x.dtype == np.float32

    # PIL-image input (datasets without paths) still works
    from PIL import Image
    arr2 = tf(Image.fromarray(images["sq"]))
    assert arr2.shape == (32, 32, 3)
