"""Run code snapshots.

Equivalent of the reference's ``log_code`` leg (MyWandbLogger uploads the
``src/`` python files with every run so results stay reproducible,
src/utilities/wandb_callbacks.py:118-133). Here the snapshot is a single
deterministic tar.gz of the package's source files, written beside the run's
checkpoints — and, when the native wandb mirror is live, uploaded into the
run's cloud files (``NativeWandbRun.log_code``).

Deterministic: fixed mtime/uid/ordering so identical source trees produce
byte-identical archives (the content-hash dedup in ``NativeWandbRun.save``
then skips re-uploads across epochs, like the reference's
``_hash_of_best_ckpts`` guard).
"""

from __future__ import annotations

import io
import os
import tarfile
from typing import Optional, Sequence

__all__ = ["snapshot_code"]

# source extensions worth reproducing a run from (the reference snapshots
# .py; configs are part of this repo's experiment definition so they ride too)
_EXTS = (".py", ".yaml", ".yml", ".cpp", ".h", ".md")
_EXCLUDE_DIRS = {"__pycache__", ".git", ".jax_cache", "checkpoints", "logs",
                 "results", "wandb"}


def _iter_files(root: str):
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d not in _EXCLUDE_DIRS
                             and not d.startswith("."))
        for fn in sorted(filenames):
            if fn.endswith(_EXTS):
                yield os.path.join(dirpath, fn)


def snapshot_code(out_path: str,
                  roots: Optional[Sequence[str]] = None) -> str:
    """Write a deterministic tar.gz of the source files under ``roots``
    (default: the installed ``spherical_dyffusion_tpu`` package) to
    ``out_path``; returns ``out_path``."""
    if roots is None:
        roots = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    # mtime=0 in gzip header + fixed tarinfo fields -> byte-stable archive
    with open(out_path, "wb") as raw:
        import gzip

        with gzip.GzipFile(fileobj=raw, filename="", mode="wb", mtime=0) as gz, \
                tarfile.open(fileobj=gz, mode="w") as tar:
            for root in roots:
                root = os.path.abspath(root)
                base = os.path.basename(root.rstrip(os.sep))
                for path in _iter_files(root):
                    arcname = os.path.join(base, os.path.relpath(path, root))
                    with open(path, "rb") as f:
                        data = f.read()
                    info = tarfile.TarInfo(arcname)
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    tar.addfile(info, io.BytesIO(data))
    return out_path
