"""Config system tests: composition, overrides, ldcfg precedence."""
import os

import pytest
import yaml

from flocoder_tpu.config import Config, load_config, ldcfg, parse_cli

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_defaults_composition_order(tmp_path):
    (tmp_path / "common").mkdir()
    (tmp_path / "common" / "base.yaml").write_text("a: 1\nb: {x: 1, y: 2}\n")
    (tmp_path / "rec.yaml").write_text(
        "defaults:\n  - common/base\n  - _self_\nb: {x: 9}\nc: 3\n")
    cfg = load_config("rec", config_dir=str(tmp_path))
    assert cfg.a == 1
    assert cfg.b.x == 9      # recipe overrides fragment
    assert cfg.b.y == 2      # deep merge keeps sibling
    assert cfg.c == 3


def test_self_position_controls_precedence(tmp_path):
    (tmp_path / "frag.yaml").write_text("k: frag\n")
    (tmp_path / "first.yaml").write_text(
        "defaults:\n  - _self_\n  - frag\nk: own\n")
    cfg = load_config("first", config_dir=str(tmp_path))
    assert cfg.k == "frag"   # fragment merged after _self_ wins


def test_cli_overrides():
    cfg = parse_cli(["--config-name", "flowers_sd", "flow.epochs=7",
                     "+new.nested=hi", "~flow.unet"], config_dir=CONFIG_DIR)
    assert cfg.flow.epochs == 7
    assert cfg.new.nested == "hi"
    assert "unet" not in cfg.flow


def test_config_name_full_path(tmp_path):
    p = tmp_path / "x.yaml"
    p.write_text("v: 5\n")
    cfg = parse_cli(["--config-name", str(p)], config_dir="/nonexistent")
    assert cfg.v == 5


def test_ldcfg_precedence():
    cfg = Config({"lr": 1, "codec": {"lr": 2}, "preencoding": {"lr": 3},
                  "flow": {"lr": 4, "unet": {"n_classes": 9}}})
    assert ldcfg(cfg, "lr") == 4                  # flow wins
    assert ldcfg(cfg, "n_classes") == 9           # flow.unet searched
    del cfg.flow["lr"]
    assert ldcfg(cfg, "lr") == 3                  # then preencoding
    assert ldcfg(cfg, "nope", default="d") == "d"


def test_reference_recipes_compose():
    for name in ("flowers_sd", "flowers_resize", "smoke", "smoke_vqgan"):
        cfg = load_config(name, config_dir=CONFIG_DIR)
        assert "codec" in cfg and "flow" in cfg
        assert ldcfg(cfg, "batch_size") is not None


def test_value_parsing():
    cfg = parse_cli(["--config-name", "smoke", "a=1e-4", "b=true", "c=~",
                     "d=[1,2]"], config_dir=CONFIG_DIR)
    assert cfg.a == 1e-4 and cfg.b is True and cfg.c is None
    assert list(cfg.d) == [1, 2]
