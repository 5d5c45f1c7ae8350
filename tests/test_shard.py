"""Native shard loader tests: format roundtrip, native vs numpy parity."""
import numpy as np
import pytest

from flocoder_tpu.data.shard import (ShardWriter, ShardReader, ShardDataset,
                                     native_available)
from flocoder_tpu.data.datasets import Loader


def _write(tmp_path, n=50, shape=(4, 4, 2), extras=False):
    extra_fields = ({"source_latents": shape, "mask_pixels": (8, 8, 1)}
                    if extras else None)
    w = ShardWriter(str(tmp_path / "s.fcshard"), shape,
                    extra_fields=extra_fields)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n,) + shape).astype(np.float32)
    masks = rng.standard_normal((n, 8, 8, 1)).astype(np.float32)
    for i in range(n):
        ex = ({"source_latents": data[i] * 0.5, "mask_pixels": masks[i]}
              if extras else None)
        w.add(data[i], label=i % 5, extras=ex)
    w.close()
    return str(tmp_path / "s.fcshard"), data, masks


def test_roundtrip_numpy_fallback(tmp_path):
    path, data, _ = _write(tmp_path)
    r = ShardReader(path, use_native=False)
    idx = np.asarray([3, 0, 49, 7])
    fields, labels = r.gather(idx)
    np.testing.assert_allclose(fields["target"], data[idx])
    np.testing.assert_array_equal(labels, idx % 5)


@pytest.mark.skipif(not native_available(), reason="native lib unavailable")
def test_native_matches_numpy(tmp_path):
    path, data, _ = _write(tmp_path, n=200)
    rn = ShardReader(path, use_native=True)
    rp = ShardReader(path, use_native=False)
    assert rn.is_native
    idx = np.random.default_rng(1).integers(0, 200, 64)
    fn, ln = rn.gather(idx)
    fp, lp = rp.gather(idx)
    np.testing.assert_array_equal(fn["target"], fp["target"])
    np.testing.assert_array_equal(ln, lp)


def test_extra_fields_inpainting(tmp_path):
    path, data, masks = _write(tmp_path, extras=True)
    r = ShardReader(path)
    fields, _ = r.gather(np.asarray([1, 2]))
    assert set(fields) == {"target", "source_latents", "mask_pixels"}
    np.testing.assert_allclose(fields["source_latents"], data[[1, 2]] * 0.5)
    np.testing.assert_allclose(fields["mask_pixels"], masks[[1, 2]])


def test_add_batch_matches_per_sample(tmp_path):
    """Vectorized add_batch writes byte-identical shards to per-sample add,
    including the interleaved extras layout."""
    rng = np.random.default_rng(2)
    shape, n = (4, 4, 2), 30
    data = rng.standard_normal((n,) + shape).astype(np.float32)
    masks = rng.standard_normal((n, 8, 8, 1)).astype(np.float32)
    labels = np.arange(n) % 5
    extra_fields = {"source_latents": shape, "mask_pixels": (8, 8, 1)}

    w1 = ShardWriter(str(tmp_path / "a.fcshard"), shape,
                     extra_fields=extra_fields)
    for i in range(n):
        w1.add(data[i], label=labels[i],
               extras={"source_latents": data[i] * 0.5,
                       "mask_pixels": masks[i]})
    w1.close()

    w2 = ShardWriter(str(tmp_path / "b.fcshard"), shape,
                     extra_fields=extra_fields)
    nb = w2.add_batch(data, labels, extras={"source_latents": data * 0.5,
                                            "mask_pixels": masks})
    assert nb == n * w2._record_bytes
    w2.close()

    with open(tmp_path / "a.fcshard", "rb") as f1, \
            open(tmp_path / "b.fcshard", "rb") as f2:
        assert f1.read() == f2.read()


def test_shard_dataset_with_loader(tmp_path):
    path, data, _ = _write(tmp_path, n=64)
    ds = ShardDataset(path)
    loader = Loader(ds, batch_size=16, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0]["target"].shape == (16, 4, 4, 2)
    assert batches[0]["class_cond"].shape == (16,)
