"""Multi-host (pod) wireup.

TPU-native replacement for the reference's process-group bootstrap
(src/models/sfno/distributed/comm.py:112-179, which parses
WORLD_SIZE/RANK/MASTER_ADDR env vars and calls torch.distributed
init_process_group over NCCL): on JAX the single call
``jax.distributed.initialize()`` wires every host into one runtime, after
which ``jax.devices()`` spans the whole pod and the existing
``parallel.mesh.make_mesh`` shardings work unchanged — no per-collective
process groups are needed (XLA inserts collectives from sharding
annotations).

Opt-in by environment (a single-host run must not pay a coordinator
round-trip, and CI has no pod):

* ``SPHDY_MULTIHOST=1`` — auto-detected wireup: on Cloud TPU pods
  ``jax.distributed.initialize()`` discovers the coordinator, process count
  and process id from the TPU metadata; nothing else to set.
* ``SPHDY_COORDINATOR=host:port`` (+ ``SPHDY_NUM_PROCESSES``,
  ``SPHDY_PROCESS_ID``) — explicit wireup for non-TPU or custom launchers.

Launch recipe (one command per host of a v5e pod slice)::

    SPHDY_MULTIHOST=1 python run.py experiment=... trainer.fit_mode=streaming

Call :func:`maybe_init_multihost` BEFORE the first jax computation (the
backend initializes lazily on first use; initialize() must precede it).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Optional

__all__ = ["MultihostSpec", "parse_multihost_env", "maybe_init_multihost"]


@dataclasses.dataclass(frozen=True)
class MultihostSpec:
    """Parsed wireup parameters; ``None`` fields use JAX auto-detection."""

    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


def parse_multihost_env(env: Mapping[str, str]) -> Optional[MultihostSpec]:
    """Returns the wireup spec when the env opts in, else ``None``.

    Raises ``ValueError`` on a malformed opt-in (explicit coordinator with a
    port-less address, or num-processes/process-id that aren't integers) —
    a half-configured pod launch must fail loudly at startup, not hang in
    the coordinator handshake.
    """
    coord = env.get("SPHDY_COORDINATOR", "").strip()
    flag = env.get("SPHDY_MULTIHOST", "").strip()
    if not coord and flag not in ("1", "true", "yes"):
        return None
    if not coord:
        return MultihostSpec()  # full auto-detection (Cloud TPU metadata)
    host, sep, port = coord.rpartition(":")
    if not sep or not host or not port.isdigit():
        raise ValueError(
            f"SPHDY_COORDINATOR must be host:port, got {coord!r}")

    def _int(name: str) -> Optional[int]:
        raw = env.get(name, "").strip()
        if not raw:
            return None
        try:
            return int(raw)
        except ValueError:
            raise ValueError(f"{name} must be an integer, got {raw!r}") from None

    num = _int("SPHDY_NUM_PROCESSES")
    pid = _int("SPHDY_PROCESS_ID")
    if (num is None) != (pid is None):
        raise ValueError(
            "SPHDY_NUM_PROCESSES and SPHDY_PROCESS_ID must be set together "
            "(or both left unset for auto-detection)")
    return MultihostSpec(coordinator_address=coord, num_processes=num,
                         process_id=pid)


def maybe_init_multihost(env: Optional[Mapping[str, str]] = None) -> Optional[MultihostSpec]:
    """Guarded ``jax.distributed.initialize()``.

    No-ops (returns ``None``) unless the environment opts in via
    ``SPHDY_MULTIHOST=1`` or ``SPHDY_COORDINATOR=host:port``. On opt-in,
    wires the process into the pod runtime and logs the resulting process
    topology. Idempotent: a second call is a no-op (JAX raises if
    initialize() runs twice; we check its client state first).
    """
    spec = parse_multihost_env(os.environ if env is None else env)
    if spec is None:
        return None
    import jax

    state = jax.distributed.global_state
    if getattr(state, "client", None) is None:  # not yet initialized
        jax.distributed.initialize(
            coordinator_address=spec.coordinator_address,
            num_processes=spec.num_processes,
            process_id=spec.process_id,
        )
    print(
        f"[multihost] process {jax.process_index()}/{jax.process_count()} "
        f"initialized ({len(jax.local_devices())} local devices)",
        flush=True,
    )
    return spec
