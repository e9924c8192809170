"""Device mesh construction + sharding helpers.

TPU-native replacement for the reference's NCCL/torch.distributed plumbing
(Car_Plate-Restoration/basicsr/utils/dist_util.py, base_model.py:62-76):
no process groups, no ports — a `jax.sharding.Mesh` plus NamedSharding
annotations; XLA emits the collectives over ICI/DCN.

Axes:
  'data'  — batch (data parallel; gradients pmean over this axis)
  'tile'  — spatial tile parallelism for large-image inference (the
            conv-world analog of sequence parallelism, SURVEY §5)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over all (or given) devices.

    Default: 1-D 'data' mesh. Pass axes=('data','tile') with shape to split.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axes))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for NHWC tensors."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays batch-sharded on the mesh."""
    sharding = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
