"""Orbax checkpointing backend (optional, production-grade).

The default checkpoint format is a single msgpack file with the config
embedded (interface.py) — simple, portable, and what the CLIs use. For
pod-scale training, this module offers Orbax instead: sharded, async-capable
saves that restore directly onto a device mesh. Counterpart of the reference's
Lightning ModelCheckpoint machinery (SURVEY §5.4) at production scale.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax

__all__ = ["save_orbax", "restore_orbax", "OrbaxCheckpointManager"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_orbax(path: str, state, config: Optional[Dict[str, Any]] = None):
    """Save a TrainState pytree (params/opt_state/ema/step) to an Orbax dir."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    payload = {
        "params": jax.device_get(state.params),
        "ema_params": jax.device_get(state.ema.params) if state.ema is not None else None,
        "step": jax.device_get(state.step),
    }
    ckptr.save(path, payload, force=True)
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f)


def restore_orbax(path: str, template=None):
    """Restore the payload (optionally into a template pytree for sharded
    restoration). Returns (payload, config|None)."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    payload = ckptr.restore(path, item=template)
    cfg_path = os.path.join(path, "config.json")
    config = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return payload, config


class OrbaxCheckpointManager:
    """Rolling checkpoint management (keep-top-k by step, like the reference's
    ModelCheckpoint callbacks stack, configs/callbacks/default.yaml)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state):
        import orbax.checkpoint as ocp

        payload = {
            "params": jax.device_get(state.params),
            "ema_params": (
                jax.device_get(state.ema.params) if state.ema is not None else None
            ),
            "step": int(state.step),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None):
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        return self._mgr.restore(step)

    @property
    def all_steps(self):
        return self._mgr.all_steps()
