"""Multi-host initialization + rank helpers.

TPU-native replacement for the reference's torch.distributed NCCL setup
(train.py:198-201 — hardcoded world_size=1). On a multi-host TPU slice,
call `init_distributed()` once per process before any jax use; the mesh in
parallel/mesh.py then spans all global devices and the loaders slice their
deterministic samplers by (process_index, process_count) exactly as the
reference sliced by (rank, world_size) (dataloader.py:113-120).
"""

import os
from typing import Optional, Tuple


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-process; no-op on a
    single host. Returns (process_index, process_count).

    Coordinator/rank resolution order: explicit arguments, then launcher env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID — the
    torchrun MASTER_ADDR/WORLD_SIZE/RANK analogue), then TPU-pod autodetect
    (MEGASCALE_COORDINATOR_ADDRESS, where jax.distributed.initialize fills
    in the rest from the metadata server)."""
    import jax
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = _env_int("JAX_NUM_PROCESSES")
    if process_id is None:
        process_id = _env_int("JAX_PROCESS_ID")
    if explicit or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(coordinator_address=explicit,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> int:
    import jax
    assert global_batch % jax.process_count() == 0
    return global_batch // jax.process_count()
