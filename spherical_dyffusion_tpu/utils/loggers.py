"""Experiment tracking: local-first metric logging with optional wandb.

Replaces the reference's wandb-centric observability stack (MyWandbLogger
wandb_callbacks.py:71, WandB singleton core/wandb.py:96, naming.py run-name
generation). The system of record here is a local JSONL file (one metric dict
per line, with step/time), mirrored to wandb only if the package is available
and requested — the framework never requires network access.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

__all__ = ["JsonlLogger", "WandbLogger", "MultiLogger", "make_logger", "run_name_from_config"]


class JsonlLogger:
    """Appends one JSON object per log call to <dir>/metrics.jsonl."""

    def __init__(self, out_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self._f = open(self.path, "a")

    def log_hyperparams(self, config: Dict[str, Any]):
        with open(os.path.join(os.path.dirname(self.path), "config.json"), "w") as f:
            json.dump(config, f, indent=1, default=str)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        row = {"_step": step, "_time": time.time()}
        for k, v in metrics.items():
            if isinstance(v, dict):
                # structured payloads (e.g. wandb histogram wire dicts from
                # watch_histograms) are already JSON-ready — keep them intact
                row[k] = v
                continue
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def finish(self):
        self._f.close()


class WandbLogger:
    """wandb mirror: prefers the SDK when installed, otherwise speaks the
    wire protocol directly through the native client
    (utils/wandb_client.py:NativeWandbRun) whenever ``WANDB_BASE_URL`` names
    an endpoint. No-op when neither is available — training never requires
    network access."""

    def __init__(self, project: str, name: Optional[str] = None,
                 entity: Optional[str] = None, **kwargs):
        self._run = None
        self._wandb = None
        self._native = None
        try:
            import wandb  # noqa

            self._run = wandb.init(project=project, name=name, entity=entity,
                                   **kwargs)
            self._wandb = wandb
            return
        except Exception:
            pass
        if os.environ.get("WANDB_BASE_URL"):
            try:
                from .wandb_client import NativeWandbRun

                self._native = NativeWandbRun(
                    entity or os.environ.get("WANDB_ENTITY", "local"),
                    project, name or "run")
            except Exception as e:
                print(f"[wandb-mirror] native run init failed (disabled): {e}")

    def log_hyperparams(self, config: Dict[str, Any]):
        if self._run is not None:
            self._run.config.update(config, allow_val_change=True)
        elif self._native is not None:
            self._native.update_config(config)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        if self._run is not None:
            self._wandb.log(metrics, step=step)
        elif self._native is not None:
            self._native.log(metrics, step=step)

    def save_file(self, path: str, name: Optional[str] = None):
        """Upload a file into the run's cloud files (the SDK's ``wandb.save``;
        the reference pushes checkpoints through it,
        wandb_callbacks.py:215-219). Best-effort on both paths."""
        if self._run is not None:
            try:
                self._wandb.save(path, policy="now")
            except Exception as e:
                print(f"[wandb] file save failed ({e})")
        elif self._native is not None:
            self._native.save(path, name=name)

    def log_code(self, root: str):
        """Snapshot the source tree into the run (the SDK's ``log_code``;
        reference MyWandbLogger, wandb_callbacks.py:118-133)."""
        if self._run is not None:
            try:
                self._run.log_code(root)
            except Exception as e:
                print(f"[wandb] log_code failed ({e})")
        elif self._native is not None:
            self._native.log_code(root)

    def finish(self):
        if self._run is not None:
            self._run.finish()
        elif self._native is not None:
            self._native.finish()


class MultiLogger:
    def __init__(self, loggers: List[Any]):
        self.loggers = [l for l in loggers if l is not None]

    def log_hyperparams(self, config):
        for l in self.loggers:
            l.log_hyperparams(config)

    def log(self, metrics, step=None):
        for l in self.loggers:
            l.log(metrics, step=step)

    def save_file(self, path, name=None):
        for l in self.loggers:
            if hasattr(l, "save_file"):
                l.save_file(path, name=name)

    def log_code(self, root):
        for l in self.loggers:
            if hasattr(l, "log_code"):
                l.log_code(root)

    def finish(self):
        for l in self.loggers:
            l.finish()


def make_logger(cfg: Dict[str, Any], out_dir: str = "logs"):
    """Build loggers from a config's ``logger:`` section."""
    log_cfg = cfg.get("logger", {}) or {}
    name = cfg.get("name") or run_name_from_config(cfg)
    loggers: List[Any] = [JsonlLogger(os.path.join(out_dir, name))]
    if log_cfg.get("wandb"):
        w = log_cfg["wandb"] or {}
        loggers.append(WandbLogger(project=w.get("project", "spherical-dyffusion-tpu"),
                                   name=name))
    return MultiLogger(loggers)


def run_name_from_config(cfg: Dict[str, Any]) -> str:
    """Compact descriptive run name (counterpart of reference naming.py:70-284)."""
    parts = []
    exp = cfg.get("experiment", "exp")
    parts.append({"interpolation": "Ipol", "dyffusion": "DY",
                  "simultaneous": "MH"}.get(exp, exp))
    dm = cfg.get("datamodule", {})
    if dm.get("kind") == "fv3gfs":
        parts.append("FV3GFS")
    if dm.get("horizon"):
        parts.append(f"h{dm['horizon']}")
    m = cfg.get("model", {})
    kind = m.get("kind", "sfno").upper()
    dims = m.get("embed_dim") or m.get("dim")
    parts.append(f"{kind}{dims}" if dims else kind)
    if m.get("num_layers"):
        parts.append(f"L{m['num_layers']}")
    if cfg.get("seed") is not None:
        parts.append(f"seed{cfg['seed']}")
    return "-".join(str(p) for p in parts)
