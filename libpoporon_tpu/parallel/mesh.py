"""Device mesh / sharding helpers.

The reference library is strictly single-threaded per call (SURVEY.md §2
"Parallelism"); the TPU-native scaling model is a 1-D mesh over ALL
chips with the codeword batch sharded across it.  Codewords are
independent, so the data path needs zero cross-device traffic; the only
collectives are statistics reductions (psum over ICI/DCN).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def distributed_init(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialise jax.distributed for a multi-host pod slice.

    No-op for single-process runs; on a pod slice call once per host
    before building the mesh (the TPU-native replacement for the
    reference's nonexistent communication backend).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def batch_mesh(devices=None) -> Mesh:
    """1-D mesh with a single 'batch' axis over all (or given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place a [B, ...] array with the leading axis sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(BATCH_AXIS)))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad the batch axis so it divides the mesh; returns (padded, orig_len)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, rem)
    return np.pad(np.asarray(x), pad_width), n
