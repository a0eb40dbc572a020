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
                axis_names: Sequence[str] = ("data",),
                mesh_shape: Optional[Sequence[int]] = None,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a named device mesh.

    Raises a clear error when fewer devices are available than requested
    (instead of an opaque reshape failure). Pass `devices` explicitly to
    build a mesh over a non-default backend (e.g. the virtual CPU mesh the
    driver's dryrun uses when real chips are short).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"create_mesh: {n_devices} devices requested but only "
                f"{len(devices)} available ({devices[0].platform} backend). "
                "For host emulation set XLA_FLAGS="
                "--xla_force_host_platform_device_count=<n> and force the "
                "cpu platform before any jax device use.")
        devices = devices[:n_devices]
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    want = int(np.prod(mesh_shape))
    if want != len(devices):
        raise ValueError(
            f"create_mesh: mesh_shape {tuple(mesh_shape)} needs {want} "
            f"devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(tuple(mesh_shape)), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, per_host: bool = False) -> Dict:
    """Place a host batch dict onto the mesh, sharded along the batch axis.

    per_host=False: every leaf is the GLOBAL batch (available on every
    process) — device_put slices out each process's addressable shards.
    per_host=True: every leaf is this process's SLICE of the global batch
    (loaders sliced by (process_index, process_count) — cli/train.py), the
    multi-host production path: each host decodes only its own videos and
    `make_array_from_process_local_data` assembles the global array without
    any cross-host copy. Identical to the global path on one process.
    """
    sh = batch_sharding(mesh)
    if per_host and jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            # precondition (enforced per-leaf; jax validates the rest):
            # every process contributes an equally-shaped slice along a
            # leading batch axis — the loaders guarantee this by slicing
            # step_sampler grids per (rank, world_size)
            assert x.ndim >= 1, \
                "per-host batch leaves need a leading batch axis"
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)
        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def tensor_parallel_spec(path, leaf, mesh: Mesh) -> P:
    """Megatron-style sharding rule for the CLIP towers over a 'model' axis:
    column-shard the up-projections (attention q/k/v, MLP fc1) and row-shard
    the down-projections (attention out, MLP fc2); everything else
    replicated. With GSPMD this is purely a placement annotation — XLA
    inserts the all-reduces (beyond reference parity: the torch stack is
    DP-only, SURVEY.md §2.6)."""
    keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
    name = "/".join(keys)
    ndim = np.asarray(leaf).ndim
    def spec(*tail):
        # blocks are stacked (L, in, out): prepend None for the layer axis
        lead = (None,) * (ndim - len(tail))
        return P(*lead, *tail)
    if "kernel" in name and ndim >= 2:
        if any(f"/{k}/" in name for k in ("q", "k", "v")) or "fc1" in name:
            return spec(None, "model")
        if "/out/" in name or "fc2" in name:
            return spec("model", None)
    if "bias" in name and ndim >= 1:
        if any(f"/{k}/" in name for k in ("q", "k", "v")) or "fc1" in name:
            return spec("model")
    return P()


def shard_params_tensor_parallel(params, mesh: Mesh):
    """Place a parameter pytree on a ('data', 'model') mesh with TP rules.
    Dimensions not divisible by the model-axis size fall back to replication."""
    model_size = mesh.shape.get("model", 1)

    def place(path, leaf):
        spec = tensor_parallel_spec(path, leaf, mesh)
        shape = np.asarray(leaf).shape
        for dim, axis in enumerate(spec):
            if axis is not None and shape[dim] % model_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
