"""Checkpoint path resolution and distribution channels.

Equivalent of the reference checkpoint plumbing
(src/utilities/checkpointing.py:22-154: local dirs, ``hf:`` HuggingFace Hub
prefix with typed cache dirs, wandb run-dir search; s3utils.py for S3).
Network channels are optional: each is import-gated and raises a clear error
when unavailable (this environment has no egress).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

__all__ = ["resolve_checkpoint_path", "download_from_hf", "find_checkpoint_in_dir",
            "S3Client"]

HF_PREFIX = "hf:"
DEFAULT_CACHE = os.path.expanduser("~/.cache/spherical_dyffusion_tpu")


def resolve_checkpoint_path(path: str, cache_dir: Optional[str] = None) -> str:
    """Resolve a checkpoint spec to a local file path.

    Supports:
      * plain local paths,
      * ``hf:org/repo/filename.ckpt`` -> HuggingFace Hub download
        (reference checkpointing.py:99-154),
      * directories -> newest ``*.ckpt`` inside (wandb-run-dir style search,
        checkpointing.py:22-98).
    """
    if path.startswith(HF_PREFIX):
        return download_from_hf(path[len(HF_PREFIX):], cache_dir=cache_dir)
    if os.path.isdir(path):
        found = find_checkpoint_in_dir(path)
        if found is None:
            raise FileNotFoundError(f"No *.ckpt under {path}")
        return found
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    return path


def find_checkpoint_in_dir(d: str, pattern: str = "*.ckpt") -> Optional[str]:
    cands = sorted(glob.glob(os.path.join(d, "**", pattern), recursive=True),
                   key=os.path.getmtime)
    return cands[-1] if cands else None


def download_from_hf(spec: str, cache_dir: Optional[str] = None,
                     endpoint: Optional[str] = None) -> str:
    """``org/repo/filename`` -> local cached file via huggingface_hub.

    ``endpoint`` (or the ``HF_ENDPOINT`` env var) overrides the hub URL —
    used for mirrors, and by the offline loopback test
    (tests/test_metrics.py::test_hf_checkpoint_download_loopback) that
    exercises this leg against a local HTTP server.
    """
    parts = spec.split("/")
    if len(parts) < 3:
        raise ValueError(f"hf spec must be org/repo/filename, got {spec!r}")
    repo_id = "/".join(parts[:2])
    filename = "/".join(parts[2:])
    cache_dir = cache_dir or os.path.join(DEFAULT_CACHE, "hf")
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("huggingface_hub is not installed; cannot resolve hf: paths") from e
    endpoint = endpoint or os.environ.get("HF_ENDPOINT") or None
    return hf_hub_download(repo_id=repo_id, filename=filename,
                           cache_dir=cache_dir, endpoint=endpoint)


# Native dependency-free S3 client (SigV4 over urllib) — replaces the
# reference's boto3 plumbing (s3utils.py); see utils/s3.py and tests/test_s3.py.
from .s3 import S3Client  # noqa: E402,F401  (re-export, historical home)
