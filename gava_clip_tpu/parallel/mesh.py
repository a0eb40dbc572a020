"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP layer (SURVEY.md §2.6):
a 1-D 'data' mesh shards the batch over chips; parameters are replicated;
the gradient all-reduce is inserted by XLA inside the jitted train step.
Metric syncs (all_reduce on loss/acc/confusion matrices, train.py:499-501,
531-534) become implicit: jitted reductions over sharded arrays.

The mesh generalizes to more axes (e.g. ('data', 'model')) for larger
backbones; the ~150M-param CLIP-B/16 needs DP only.
"""

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None,
                axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch dict onto the mesh, sharded along the batch axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
