"""Config system tests: composition, interpolation, overrides, CLI shorthand."""

import os

import pytest
import yaml

from spherical_dyffusion_tpu.utils.config import (
    apply_dotlist,
    deep_update,
    load_config,
    resolve_interpolations,
)


def write(path, content):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(content, f)


def test_deep_update_nested():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = deep_update(base, {"a": {"b": 10}, "e": 4})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    assert base["a"]["b"] == 1  # no mutation


def test_dotlist_overrides():
    cfg = {"model": {"dim": 8}}
    out = apply_dotlist(cfg, ["model.dim=16", "++new.key=true"])
    assert out["model"]["dim"] == 16
    assert out["new"]["key"] is True
    with pytest.raises(KeyError):
        apply_dotlist(cfg, ["missing.key=1"])


def test_interpolation_resolution():
    cfg = {"datamodule": {"horizon": 6}, "diffusion": {"timesteps": "${datamodule.horizon}"},
           "name": "h${datamodule.horizon}"}
    out = resolve_interpolations(cfg)
    assert out["diffusion"]["timesteps"] == 6
    assert out["name"] == "h6"


def test_defaults_composition(tmp_path):
    root = str(tmp_path)
    write(f"{root}/model/small.yaml", {"dim": 8, "kind": "sfno"})
    write(f"{root}/base.yaml", {"defaults": [{"model": "small"}, "_self_"],
                                "seed": 1, "model": {"dim": 16}})
    cfg = load_config(f"{root}/base.yaml")
    # _self_ after the group: own values win
    assert cfg["model"] == {"dim": 16, "kind": "sfno"}
    assert cfg["seed"] == 1

    # overrides at load time
    cfg2 = load_config(f"{root}/base.yaml", ["model.dim=32"])
    assert cfg2["model"]["dim"] == 32


def test_relative_parent_defaults(tmp_path):
    root = str(tmp_path)
    write(f"{root}/main.yaml", {"a": 1})
    write(f"{root}/experiment/exp.yaml", {"defaults": ["../main", "_self_"], "b": 2})
    cfg = load_config(f"{root}/experiment/exp.yaml")
    assert cfg == {"a": 1, "b": 2}


def test_sibling_group_fallback(tmp_path):
    """A {group: name} entry in a subdir resolves against the configs root."""
    root = str(tmp_path)
    write(f"{root}/diffusion/dyff.yaml", {"timesteps": 6})
    write(f"{root}/experiment/exp.yaml",
          {"defaults": [{"diffusion": "dyff"}, "_self_"], "x": 1})
    cfg = load_config(f"{root}/experiment/exp.yaml")
    assert cfg["diffusion"]["timesteps"] == 6
