"""Device mesh and sharding helpers.

TPU-native replacement for the reference's entire distributed stack
(src/models/sfno/distributed/comm.py:112-314 process-group wireup,
mappings.py autograd collectives, DistributedReal* layers): a single
``jax.sharding.Mesh`` with named axes

    ("data", "h", "w", "matmul")

covers data parallelism, spatial (lat/lon) model parallelism and tensor
(channel) parallelism. Collectives are inserted by XLA from sharding
annotations; there are no Distributed* module twins, no gradient hooks
(pjit-sharded optimizers sync gradients automatically), and no wireup
(``jax.distributed.initialize`` handles multi-host).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "P"]

AXIS_DATA = "data"
AXIS_H = "h"
AXIS_W = "w"
AXIS_MATMUL = "matmul"


def make_mesh(
    data: int = -1,
    h: int = 1,
    w: int = 1,
    matmul: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 4-axis mesh. ``data=-1`` absorbs all remaining devices.

    Axis semantics mirror the reference comm groups (comm.py:209-306):
    h/w shard the lat/lon grid (spatial model parallelism), matmul shards
    channels (tensor parallelism), data is pure data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = h * w * matmul
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model size {model}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{h}x{w}x{matmul} != {n} devices")
    arr = np.asarray(devices).reshape(data, h, w, matmul)
    return Mesh(arr, (AXIS_DATA, AXIS_H, AXIS_W, AXIS_MATMUL))


def batch_sharding(mesh: Mesh, ndim: int, spatial: bool = False) -> NamedSharding:
    """Sharding for a (B, ..., H, W, C) batch: batch over 'data', optionally
    lat/lon over 'h'/'w'."""
    spec = [None] * ndim
    spec[0] = AXIS_DATA
    if spatial and ndim >= 3:
        spec[-3] = AXIS_H
        spec[-2] = AXIS_W
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Device-put a (pytree of) host array(s) with batch/data sharding.

    On a single-device mesh this is a plain device_put: the axon TPU tunnel
    rejects host transfers of arrays carrying trivial mesh shardings."""
    if mesh.size == 1:
        return jax.tree_util.tree_map(jax.device_put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x), spatial)), batch
    )
