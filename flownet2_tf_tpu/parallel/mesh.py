"""Device mesh + sharding layer (the reference has NO distributed surface
— SURVEY.md §2.3; this is the TPU-native scaling plan built in its place).

Strategy: pure data parallelism over a 1-D ``('data',)`` mesh — FlowNet2
is ~160M params and fits on one chip, so DP over ICI is the right
parallelism (TP/PP columns in SURVEY §2.3 are explicitly n/a). Parameters
and optimizer state are replicated; the batch is sharded on 'data'. XLA
inserts the gradient all-reduce over ICI automatically from the sharding
annotations (no hand-written collectives needed for DP).

The mesh axis list is extensible: a future spatial-sharding axis for
beyond-HBM resolutions ('space', halo exchange via shard_map+ppermute) is
documented as the SP analogue but not wired in v0.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_initialize_distributed(enable: bool = False) -> bool:
    """Multi-host entry hook (SURVEY §2.3 comm-backend row): call
    jax.distributed.initialize() from env-provided coordinator config
    before any backend use. Single-host (this environment) stays a
    no-op; returns whether initialization ran.

    Requires the standard JAX cluster env (either an auto-detected
    managed environment, or COORDINATOR_ADDRESS + NUM_PROCESSES +
    PROCESS_ID for manual bring-up); fails fast with a clear error
    instead of letting jax.distributed block on a missing coordinator.
    """
    if not enable:
        return False
    import os

    import jax

    manual = all(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID")
    )
    managed = any(
        os.environ.get(k)
        for k in (
            "TPU_WORKER_HOSTNAMES",  # Cloud TPU pod
            "MEGASCALE_COORDINATOR_ADDRESS",
            "SLURM_JOB_ID",
            "OMPI_COMM_WORLD_SIZE",  # OpenMPI
        )
    )
    if not (manual or managed):
        raise RuntimeError(
            "--multihost requires cluster coordination env: set "
            "COORDINATOR_ADDRESS, NUM_PROCESSES and PROCESS_ID (or run "
            "under a managed TPU-pod/SLURM/MPI environment that JAX "
            "auto-detects)"
        )
    if manual:
        # jax.distributed.initialize() does NOT read these env names
        # (its auto-detection only covers the managed cluster plugins),
        # so the manual path must pass them as arguments.
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["NUM_PROCESSES"]),
            process_id=int(os.environ["PROCESS_ID"]),
        )
    else:
        jax.distributed.initialize()
    return True


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def mesh_for_batch(batch_size: int, mesh: Mesh = None) -> Mesh:
    """Largest device prefix whose size divides ``batch_size``.

    The DP batch axis must shard evenly; rather than failing deep inside
    pjit, shrink the mesh (a warning is the caller's job)."""
    if mesh is None:
        mesh = make_mesh()
    n = int(mesh.devices.size)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n == int(mesh.devices.size):
        return mesh
    return make_mesh(list(mesh.devices.flat)[:n], mesh.axis_names[0])


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put a host batch with the batch axis sharded on the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
