"""Lightweight YAML config system with composition and dotlist overrides.

Replaces the reference's Hydra/OmegaConf stack (src/configs/, run.py:12-24,
config_utils.py) with a dependency-free implementation providing the pieces
actually used:

* ``defaults:`` composition (a config file lists other files to merge under
  keys, like hydra's defaults tree),
* ``${a.b.c}`` interpolation,
* dotlist overrides (``model.embed_dim=128``, ``++new.key=1``),
* deep merge of override dicts (the inference ``overrides:`` mechanism,
  reference utils.update_dict_with_other, utils.py:715).
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional, Sequence

import yaml

__all__ = ["load_config", "deep_update", "apply_dotlist", "resolve_interpolations"]

_INTERP_RE = re.compile(r"^\$\{([a-zA-Z0-9_.]+)\}$")
_INTERP_INLINE_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def deep_update(base: Dict, other: Dict) -> Dict:
    """Recursive dict merge; ``other`` wins (reference update_dict_with_other)."""
    out = copy.deepcopy(base)
    for k, v in (other or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_update(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(s: str) -> Any:
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def apply_dotlist(cfg: Dict, overrides: Sequence[str]) -> Dict:
    """Apply ``a.b.c=value`` overrides (++ prefix allows new keys, like hydra)."""
    cfg = copy.deepcopy(cfg)
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"Override {item!r} must be key=value")
        key, val = item.split("=", 1)
        allow_new = key.startswith("++") or key.startswith("+")
        key = key.lstrip("+")
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            if p not in node:
                if not allow_new:
                    raise KeyError(f"Unknown config key {key!r} (use ++ to add)")
                node[p] = {}
            node = node[p]
        if parts[-1] not in node and not allow_new:
            raise KeyError(f"Unknown config key {key!r} (use ++ to add)")
        node[parts[-1]] = _parse_value(val)
    return cfg


def _lookup(cfg: Dict, dotted: str) -> Any:
    node = cfg
    for p in dotted.split("."):
        node = node[p]
    return node


def resolve_interpolations(cfg: Dict, root: Optional[Dict] = None) -> Dict:
    """Resolve ``${a.b}`` references against the root config."""
    root = root if root is not None else cfg

    def resolve(v):
        if isinstance(v, dict):
            return {k: resolve(x) for k, x in v.items()}
        if isinstance(v, list):
            return [resolve(x) for x in v]
        if isinstance(v, str):
            m = _INTERP_RE.match(v)
            if m:
                return resolve(_lookup(root, m.group(1)))
            if _INTERP_INLINE_RE.search(v):
                return _INTERP_INLINE_RE.sub(
                    lambda mm: str(resolve(_lookup(root, mm.group(1)))), v
                )
        return v

    # iterate to fixpoint over nested references (bounded)
    out = cfg
    for _ in range(5):
        new = resolve(out)
        if new == out:
            break
        out = new
    return out


def load_config(
    path: str,
    overrides: Sequence[str] = (),
    config_dir: Optional[str] = None,
) -> Dict:
    """Load a YAML config, compose its ``defaults`` list, apply overrides and
    resolve interpolations.

    ``defaults`` entries may be:
      - ``name`` or ``name.yaml``: merged at the root,
      - ``{group: name}``: loads ``<dir>/<group>/<name>.yaml`` under key
        ``group`` (or at root if the file has a ``_global_: true`` marker).
    ``_self_`` positions the current file's own content in the merge order.
    """
    # group references always resolve relative to the file being loaded, so
    # nested defaults compose correctly across directories
    config_dir = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    defaults = raw.pop("defaults", None)
    own = raw
    if defaults is None:
        merged = own
    else:
        merged: Dict = {}
        placed_self = False
        for entry in defaults:
            if entry == "_self_":
                merged = deep_update(merged, own)
                placed_self = True
                continue
            if isinstance(entry, str):
                sub = load_config(_resolve_path(config_dir, entry), config_dir=config_dir)
                merged = deep_update(merged, sub)
            elif isinstance(entry, dict):
                (group, name), = entry.items()
                if name in (None, "null"):
                    continue
                sub_path = _resolve_path(config_dir, os.path.join(str(group), str(name)))
                if not os.path.exists(sub_path):
                    # fall back to sibling group dirs (configs/<group>/<name>)
                    alt = _resolve_path(
                        os.path.dirname(config_dir), os.path.join(str(group), str(name))
                    )
                    if os.path.exists(alt):
                        sub_path = alt
                sub = load_config(sub_path, config_dir=config_dir)
                if sub.pop("_global_", False):
                    merged = deep_update(merged, sub)
                else:
                    merged = deep_update(merged, {str(group): sub})
            else:
                raise ValueError(f"Bad defaults entry: {entry!r}")
        if not placed_self:
            merged = deep_update(merged, own)
    if overrides:
        merged = apply_dotlist(merged, overrides)
    return resolve_interpolations(merged)


def _resolve_path(config_dir: str, name: str) -> str:
    if not name.endswith(".yaml"):
        name = name + ".yaml"
    if os.path.isabs(name):
        return name
    return os.path.join(config_dir, name)
