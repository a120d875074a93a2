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
            "S3Client", "CheckpointMirror"]

HF_PREFIX = "hf:"
WANDB_PREFIX = "wandb:"
DEFAULT_CACHE = os.path.expanduser("~/.cache/spherical_dyffusion_tpu")


def resolve_checkpoint_path(path: str, cache_dir: Optional[str] = None) -> str:
    """Resolve a checkpoint spec to a local file path.

    Supports:
      * plain local paths,
      * ``hf:org/repo/filename.ckpt`` -> HuggingFace Hub download
        (reference checkpointing.py:99-154),
      * ``wandb:entity/project/run_id[:best|last|EPOCH]`` -> cloud restore via
        the native wandb client (reference wandb_api.py:246-311; endpoint from
        ``WANDB_BASE_URL``, key from ``WANDB_API_KEY``),
      * directories -> newest ``*.ckpt`` inside (wandb-run-dir style search,
        checkpointing.py:22-98).
    """
    if path.startswith(HF_PREFIX):
        return download_from_hf(path[len(HF_PREFIX):], cache_dir=cache_dir)
    if path.startswith(WANDB_PREFIX):
        from .wandb_client import restore_checkpoint_from_wandb

        spec = path[len(WANDB_PREFIX):]
        run_path, _, epoch_s = spec.partition(":")
        # ':0' is a genuine epoch request — never collapse it to 'best'
        epoch = (int(epoch_s) if epoch_s.isdigit()
                 else (epoch_s if epoch_s else "best"))
        dest = cache_dir or os.path.join(DEFAULT_CACHE, "wandb")
        os.makedirs(dest, exist_ok=True)
        return restore_checkpoint_from_wandb(run_path, dest_dir=dest,
                                             epoch=epoch)
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


class CheckpointMirror:
    """Mirror training checkpoints to S3 with content-hash dedup.

    The distribution half of checkpointing: the reference's logger uploads
    every improved checkpoint out of the run dir, skipping files whose
    content hash was already uploaded (src/utilities/wandb_callbacks.py:
    74-140, MD5-based dedup). Here the destination is an
    ``s3://bucket/prefix`` URL served by the native SigV4 client — the
    endpoint override (``endpoint_url`` or ``S3_ENDPOINT_URL``) makes it
    loopback-testable with zero egress.

    Dedup is two-level: an in-process cache (fast path for the every-epoch
    ``last.ckpt`` re-save with unchanged weights) and a ``<key>.sha256``
    sidecar object so resumed runs also skip unchanged uploads.
    """

    def __init__(self, url: str, endpoint_url: Optional[str] = None,
                 region: str = "us-east-1"):
        if not url.startswith("s3://"):
            raise ValueError(f"ckpt_mirror must be an s3:// URL, got {url!r}")
        rest = url[len("s3://"):]
        bucket, _, prefix = rest.partition("/")
        if not bucket:
            raise ValueError(f"no bucket in ckpt_mirror URL {url!r}")
        self.client = S3Client(bucket, endpoint_url=endpoint_url, region=region)
        self.prefix = prefix.strip("/")
        self._uploaded: dict = {}  # full key -> sha256 hex

    def _key(self, name: str) -> str:
        return f"{self.prefix}/{name}" if self.prefix else name

    @staticmethod
    def _file_sha256(path: str) -> str:
        import hashlib

        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest()

    def mirror(self, local_path: str, name: Optional[str] = None) -> bool:
        """Upload ``local_path`` unless its content is already mirrored.

        Returns True when an upload actually happened. Never raises on
        network failure: training must not die because the mirror endpoint
        is down (the reference's uploads are best-effort for the same
        reason) — failures are printed and the ckpt stays local.
        """
        key = self._key(name or os.path.basename(local_path))
        sha = self._file_sha256(local_path)
        if self._uploaded.get(key) == sha:
            return False
        try:
            if key not in self._uploaded:
                # cross-run dedup: the sidecar records the last uploaded hash
                try:
                    remote = self.client.get_bytes(key + ".sha256").decode()
                except Exception:
                    remote = None
                if remote == sha:
                    self._uploaded[key] = sha
                    return False
            self.client.upload(local_path, key)
            self.client.put_bytes(key + ".sha256", sha.encode())
            self._uploaded[key] = sha
            return True
        except Exception as e:  # pragma: no cover - exercised via loopback
            print(f"[ckpt-mirror] upload of {key} failed (kept local): {e}")
            return False
