"""Viz + logging shim tests."""
import json
import os

import numpy as np

from flocoder_tpu.utils.viz import denormalize, make_grid, save_img, save_img_grid
from flocoder_tpu.utils import logging as wblog


def test_denormalize_roundtrip():
    x = np.random.default_rng(0).random((4, 4, 3)).astype(np.float32)
    normed = (x - 0.5) / 0.5
    np.testing.assert_allclose(denormalize(normed), x, atol=1e-6)


def test_make_grid_layout():
    imgs = np.ones((7, 8, 8, 3), np.float32)
    grid = make_grid(imgs, ncols=3, pad=2)
    # 3 rows x 3 cols of 8px + padding
    assert grid.shape == (3 * 10 + 2, 3 * 10 + 2, 3)


def test_save_img_grid_writes_png(tmp_path):
    imgs = np.random.default_rng(1).random((5, 8, 8, 3)).astype(np.float32)
    path = save_img_grid(imgs, epoch=2, tag="t", use_wandb=False,
                         output_dir=str(tmp_path))
    assert os.path.exists(path) and path.endswith(".png")


def test_save_img_grid_latents_take_first3(tmp_path):
    lat = np.random.default_rng(2).random((4, 8, 8, 7)).astype(np.float32)
    path = save_img_grid(lat, epoch=1, tag="lat", use_wandb=False,
                         output_dir=str(tmp_path))
    assert os.path.exists(path)


def test_jsonl_logging_backend(tmp_path):
    wblog.init(project="t", name="r", config={"a": 1},
               output_dir=str(tmp_path))
    assert wblog.is_active()
    wblog.log({"loss": 0.5}, step=3)
    wblog.finish()
    path = tmp_path / "t" / "r" / "metrics.jsonl"
    lines = [json.loads(l) for l in open(path)]
    assert lines[0] == {"_config": {"a": 1}}
    assert lines[1]["loss"] == 0.5 and lines[1]["_step"] == 3
