"""Parameter-tree utilities: wildcard matching, freezing, partial loading.

Equivalents of the reference's parameter plumbing:
* wildcard.py:7 — fnmatch-style parameter-name pattern matching,
* core/parameter_init.py:14-58 — frozen-parameter and fine-tune-from-weights
  configuration,
* core/weight_ops.py:11-160 — overwriting a model's weights from another
  (possibly differently-shaped) model.

Parameter names here are '/'-joined pytree paths (e.g.
``block_0/filter/weight``).
"""

from __future__ import annotations

import dataclasses
import fnmatch
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "param_names",
    "matches_any",
    "freeze_mask",
    "frozen_param_optimizer",
    "overwrite_weights",
    "adapt_block_layout",
    "stack_block_params",
    "unstack_block_params",
    "ParameterInitConfig",
    "apply_parameter_init",
]


def _name(path) -> str:
    return "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)


def param_names(tree) -> List[str]:
    return [_name(p) for p, _ in jax.tree_util.tree_leaves_with_path(tree)]


def matches_any(name: str, patterns: Sequence[str]) -> bool:
    """fnmatch wildcard matching (reference wildcard.py:7)."""
    return any(fnmatch.fnmatch(name, pat) for pat in patterns)


def freeze_mask(tree, frozen_patterns: Sequence[str]):
    """Boolean pytree: True where the parameter is trainable."""
    return jax.tree_util.tree_map_with_path(
        lambda p, _: not matches_any(_name(p), frozen_patterns), tree
    )


def frozen_param_optimizer(tx: optax.GradientTransformation,
                           frozen_patterns: Sequence[str]):
    """Wrap an optimizer so parameters matching the patterns receive zero
    updates (the reference freezes via requires_grad; in optax this is a
    masked transform)."""

    def mask_fn(params):
        return freeze_mask(params, frozen_patterns)

    return optax.chain(tx, optax.masked(optax.set_to_zero(),
                                        lambda p: jax.tree_util.tree_map_with_path(
                                            lambda pa, _: matches_any(_name(pa), frozen_patterns), p)))


def overwrite_weights(target, source, include: Optional[Sequence[str]] = None,
                      exclude: Sequence[str] = ()) -> Any:
    """Copy leaves from ``source`` into ``target`` by matching path names;
    shape-mismatched leaves copy the overlapping top-left hyper-slab
    (reference weight_ops.py:11-160 supports growing models this way)."""
    src_map = {_name(p): leaf for p, leaf in jax.tree_util.tree_leaves_with_path(source)}

    def copy(path, leaf):
        name = _name(path)
        if include is not None and not matches_any(name, include):
            return leaf
        if matches_any(name, exclude):
            return leaf
        if name not in src_map:
            return leaf
        src = src_map[name]
        if src.shape == leaf.shape:
            return jnp.asarray(src, leaf.dtype)
        if len(src.shape) != len(leaf.shape):
            return leaf
        out = np.array(jax.device_get(leaf))
        sl = tuple(slice(0, min(a, b)) for a, b in zip(leaf.shape, src.shape))
        out[sl] = np.asarray(jax.device_get(src))[sl]
        return jnp.asarray(out, leaf.dtype)

    return jax.tree_util.tree_map_with_path(copy, target)


@dataclasses.dataclass(frozen=True)
class ParameterInitConfig:
    """Mirrors reference parameter_init.py: optionally start from another
    checkpoint's weights and freeze a subset of parameters."""

    weights_path: Optional[str] = None
    include: Optional[Sequence[str]] = None
    exclude: Sequence[str] = ()
    frozen_parameters: Sequence[str] = ()


def apply_parameter_init(params, cfg: ParameterInitConfig, load_fn=None):
    """Apply the init config to a freshly-initialized parameter tree.
    ``load_fn(path) -> source tree`` defaults to the trainer checkpoint
    loader."""
    if cfg.weights_path:
        if load_fn is None:
            from ..training.trainer import Trainer

            def load_fn(p):
                return Trainer.load_checkpoint(p)["params"]
        source = load_fn(cfg.weights_path)
        params = overwrite_weights(params, source, cfg.include, cfg.exclude)
    return params


def _is_blockkeyed(d) -> bool:
    return isinstance(d, dict) and any(k.startswith("block_") for k in d)


def stack_block_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Convert an unrolled SFNO param mapping (block_0..block_{L-1} keys) to
    the ``scan_layers`` layout: the middle blocks 1..L-2 fold into
    ``blocks_mid/block`` with leaves stacked on a new leading layer axis;
    first/last blocks stay unrolled. Works on the inner 'params' mapping of
    one network (the dict that holds the block_i keys); other keys pass
    through untouched.
    """
    if not _is_blockkeyed(params):
        raise ValueError("stack_block_params: no block_i keys found")
    n = 1 + max(int(k.split("_")[1]) for k in params if k.startswith("block_"))
    if n < 3:
        raise ValueError(f"stack_block_params: need >=3 blocks, got {n}")
    mid = [params[f"block_{i}"] for i in range(1, n - 1)]
    out = {k: v for k, v in params.items()
           if not (k.startswith("block_") and 0 < int(k.split("_")[1]) < n - 1)}
    # host-side numpy stacking: at checkpoint-load time the leaves are numpy
    # and an eager jnp.stack would round-trip every leaf through the (slow)
    # TPU tunnel (CLAUDE.md iron rule 4)
    out["blocks_mid"] = {
        "block": jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs], 0), *mid)
    }
    return out


def adapt_block_layout(template, source):
    """Recursively convert ``source`` param subtrees between the unrolled
    (``block_i``) and scanned (``blocks_mid/block``; SFNOConfig.scan_layers)
    layouts wherever ``template`` uses the other one, so checkpoints saved in
    either layout load into a model built with either setting. Subtrees whose
    layouts already agree (and non-SFNO subtrees) pass through untouched."""
    if not (isinstance(template, dict) and isinstance(source, dict)):
        return source
    t_mid, s_mid = "blocks_mid" in template, "blocks_mid" in source
    if t_mid and not s_mid and _is_blockkeyed(source):
        source = stack_block_params(source)
    elif s_mid and not t_mid and _is_blockkeyed(template):
        source = unstack_block_params(source)
    return {
        k: (adapt_block_layout(template[k], v) if k in template else v)
        for k, v in source.items()
    }


def unstack_block_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stack_block_params`: explode ``blocks_mid/block``
    back into block_1..block_{L-2} subtrees (the unrolled layout)."""
    if "blocks_mid" not in params:
        raise ValueError("unstack_block_params: no blocks_mid key found")
    stacked = params["blocks_mid"]["block"]
    L_mid = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    n = 1 + max(int(k.split("_")[1]) for k in params if k.startswith("block_"))
    assert n == L_mid + 2, (n, L_mid)  # block_0 and block_{L-1} present
    out = {k: v for k, v in params.items() if k != "blocks_mid"}
    stacked = jax.tree_util.tree_map(np.asarray, stacked)  # one host pull
    for i in range(L_mid):
        out[f"block_{i + 1}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked)
    return out
