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
    try:
        if manual:
            # jax.distributed.initialize() does NOT read these env names
            # (its auto-detection only covers the managed cluster
            # plugins), so the manual path must pass them as arguments.
            jax.distributed.initialize(
                coordinator_address=os.environ["COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["NUM_PROCESSES"]),
                process_id=int(os.environ["PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()
    except RuntimeError as e:
        if "must be called before" in str(e):
            # importing Trainer/models first already initialized the
            # backend — a trap this hook's own verification drive hit
            raise RuntimeError(
                "maybe_initialize_distributed must run before anything "
                "touches the JAX backend: import "
                "flownet2_tf_tpu.parallel.mesh and call it FIRST, then "
                "import/construct Trainer, models, loaders (their "
                "imports may initialize XLA)"
            ) from e
        raise
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
    """device_put a host batch with the batch axis sharded on the mesh.

    Under multi-process SPMD (``jax.process_count() > 1``, after
    :func:`maybe_initialize_distributed`) the given batch is this
    PROCESS'S LOCAL SHARD — the standard each-host-loads-its-own-slice
    pattern — and the returned arrays are global, with global batch =
    local batch x process_count assembled via
    ``jax.make_array_from_process_local_data``. Single-process (this
    environment) keeps the plain sharded device_put. Cross-process
    semantics are pinned by tests/test_multiprocess.py (2 CPU
    processes, Gloo collectives)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        nproc = jax.process_count()

        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * nproc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape
            )

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


class DevicePrefetcher:
    """Stages host batches onto the device from a background thread.

    ``jax.device_put`` of a training batch BLOCKS the calling thread
    until the transfer lands (measured on the remote-attached v5e: 11.4
    ms for a 16 MB b8 batch, dispatch == completion — there is no async
    window to hide it in). Issued from the training thread it therefore
    serializes with the step; issued from this worker thread, batch
    k+1's transfer overlaps step k's device execution. This is the
    device-side half of the reference's queue-runner input pipeline
    (SURVEY §2.1 data-loader row): host decode threads (BatchLoader)
    feed this stage, this stage feeds the jitted step.

    Yields ``(host_batch, device_batch)`` pairs. Exceptions in the
    source iterator or the transfer propagate to the consumer. Call
    :meth:`close` (or exhaust it) to stop the worker.

    ``threaded=False`` keeps the interface but stages each batch
    inline on the consumer's thread — required through the axon relay,
    where concurrent RPCs from two threads head-of-line-block each
    other on the single tunneled connection (measured 3x slower than
    inline staging; ``TrainConfig.device_prefetch`` picks per
    environment).
    """

    _DONE = object()

    def __init__(self, batches, mesh: Mesh, depth: int = 2,
                 threaded: bool = True):
        import queue
        import threading

        self._src = batches
        self._mesh = mesh
        self._threaded = bool(threaded)
        if not self._threaded:
            self._it = iter(batches)
            self._thread = None
            return
        self._q = queue.Queue(maxsize=max(1, int(depth)))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="device-prefetch", daemon=True
        )
        self._thread.start()

    def _run(self):
        import queue

        def put(item):
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        try:
            for host_batch in self._src:
                if self._stop.is_set():
                    return
                device_batch = shard_batch(self._mesh, host_batch)
                if not put((host_batch, device_batch)):
                    return
            put((self._DONE, None))
        except BaseException as e:  # forwarded to the consumer
            put((e, None))

    def __iter__(self):
        return self

    def __next__(self):
        import queue

        if not self._threaded:
            host_batch = next(self._it)
            return host_batch, shard_batch(self._mesh, host_batch)
        while True:
            try:
                item, device_batch = self._q.get(timeout=0.2)
                break
            except queue.Empty:
                if not self._thread.is_alive() and self._q.empty():
                    raise StopIteration
        if item is self._DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item, device_batch

    def close(self):
        if self._thread is not None:
            self._stop.set()
            # The worker executes the source generator's frame; closing a
            # generator while another thread runs it raises
            # ValueError('generator already executing') and would leave the
            # source's own producer thread alive past close(). Join first —
            # the worker exits within one queue-put timeout (or one source
            # fetch) once _stop is set.
            self._thread.join(timeout=10.0)
        close = getattr(self._src, "close", None)
        if close is not None:
            try:
                close()
            except Exception:
                pass
