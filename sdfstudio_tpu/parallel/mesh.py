"""Device mesh + sharding helpers.

Replaces the reference's DDP/NCCL stack (scripts/train.py:93-217,
base_pipeline.py:242, utils/comms.py) with the TPU-native single-program
model: ONE jitted train step over a ``jax.sharding.Mesh``; the ray batch is
sharded along a ``data`` axis (ICI collectives inserted by XLA for the
gradient all-reduce), parameters are replicated. ``jax.process_index()==0``
gates host I/O like the reference's rank-0 checks.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Apply a with_sharding_constraint sharding the leading axis of every
    array leaf across the data axis (used inside jitted steps)."""
    spec = P(axis_name)

    def constrain(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
        return x

    return jax.tree_util.tree_map(constrain, tree)


def put_replicated(tree, mesh: Mesh):
    """Place every leaf fully replicated over ``mesh``, including meshes
    that span multiple processes.

    Single-process this is ``jax.device_put``; multi-process,
    ``jax.device_put`` cannot target non-addressable devices, so each
    process materializes its addressable shards via
    ``jax.make_array_from_callback`` (every host is assumed to hold the
    same value — true for params/opt state initialized from the same seed
    and for dataset tensors loaded from shared storage, matching the
    reference's assumption that all DDP ranks read the same data)."""
    sharding = NamedSharding(mesh, P())
    multiproc = jax.process_count() > 1

    def put(x):
        if not hasattr(x, "ndim"):  # python scalars etc: leave untouched
            return x
        if not multiproc:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def is_main_process() -> bool:
    """Rank-0 gate (reference utils/comms.py is_main_process)."""
    return jax.process_index() == 0
