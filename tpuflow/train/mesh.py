"""Device mesh and sharding rules — the distributed-communication layer.

Parity: SURVEY.md §5 "Distributed communication backend". The reference
moves gradients across GPUs with NCCL under a single-process
DataParallel wrapper; the TPU-native equivalent is a
``jax.sharding.Mesh`` with named axes ``("data", "ensemble")`` and
NamedSharding annotations — XLA inserts the gradient ``psum`` (training,
data axis) and keeps ensemble members independent (UQ sampling,
ensemble axis) as ICI collectives. No code above this module mentions
devices; multi-host (DCN) runs reuse the same mesh spanning hosts
(SURVEY.md §5: "no code change above the mesh definition").

The only distributed strategies the reference possesses — and therefore
the only ones built — are data parallelism and ensemble parallelism
(SURVEY.md §2 parallelism inventory).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
ENSEMBLE_AXIS = "ensemble"


def make_mesh(data: int = -1, ensemble: int = 1, devices=None) -> Mesh:
    """Build the (data, ensemble) mesh.

    Args:
      data: data-parallel axis size; -1 = all remaining devices.
      ensemble: ensemble-parallel axis size (UQ sampling fan-out).
      devices: explicit device list (default: all of jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % ensemble:
            raise ValueError(f"{n} devices not divisible by ensemble={ensemble}")
        data = n // ensemble
    if data < 1 or ensemble < 1:
        raise ValueError(
            f"mesh axes must be >=1, got data={data} ensemble={ensemble} "
            f"(devices available: {n})"
        )
    if data * ensemble > n:
        raise ValueError(
            f"mesh {data}x{ensemble} needs {data * ensemble} devices, have {n}"
        )
    grid = np.asarray(devices[: data * ensemble]).reshape(data, ensemble)
    return Mesh(grid, (DATA_AXIS, ENSEMBLE_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/trajectory) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def ensemble_sharding(mesh: Mesh, member_axis: int = 0) -> NamedSharding:
    """Shard the ensemble-member axis over BOTH mesh axes — at
    inference there is no gradient traffic, so every chip takes an
    equal slice of the ensemble (SURVEY.md §2 'Ensemble parallelism').

    ``member_axis``: position of the member axis in the tensors being
    constrained — 0 for nhwc flow layout, 2 for hwnc (H, W, N, ...)
    states (flows/layout.py)."""
    spec = [None] * member_axis + [(DATA_AXIS, ENSEMBLE_AXIS)]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, sharding: NamedSharding | None = None):
    """Place a host array pytree onto the mesh, batch axis sharded."""
    s = sharding or data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def initialize_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host (DCN) entry: jax.distributed.initialize, after which
    jax.devices() spans all hosts and the SAME mesh/sharding code runs
    unchanged — the stretch config of BASELINE.json (#5) / SURVEY.md §5
    ('no code change above the mesh definition'). Arguments default to
    cluster-environment auto-detection."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
