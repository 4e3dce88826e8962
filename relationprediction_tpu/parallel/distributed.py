"""Multi-host runtime: process-spanning meshes and per-host data feeding.

The reference is strictly single-process (one ``tf.Session``,
``code/train.py:278``); this module is the new TPU-native scale-out layer
that lets the edge-partitioned training step (parallel/mesh.py) span a
multi-host slice (e.g. v5p pods), where each host owns a subset of the
mesh's chips.

Design:

  * ``init_runtime`` wires ``jax.distributed.initialize`` so every process
    sees the GLOBAL device set; on CPU backends it selects the gloo
    cross-process collectives implementation so the same code path is
    testable without TPU hardware (two simulated processes, each with N
    virtual CPU devices).
  * The mesh is built over ``jax.devices()`` — all chips of all processes.
    Collectives inside the shard_map'd step ride ICI exactly as in the
    single-process case; XLA handles the cross-host legs (DCN) for mesh
    axes that span hosts.
  * Per-host batch feeding: every host runs the SAME deterministic
    ``BatchPipeline`` (same seed -> bit-identical batches, a property the
    resume tests already pin), and transfers ONLY the rows owned by its
    local devices. ``global_shard_batch`` slices the host-global batch to
    the process-local rows and assembles ``jax.Array``s with
    ``make_array_from_process_local_data``. No host<->host data traffic,
    no per-step host synchronization.
  * Parameters/optimizer state are replicated: every process feeds the
    full tree (identical by seeded init) and reads back any replica.

The per-device computation is IDENTICAL to the single-process mesh path:
the same shard_map'd step, the same RNG folding by mesh position — so a
2-process x 4-device run is bit-identical to a 1-process x 8-device run
(tests/test_multihost.py asserts loss parity).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import EDGE_AXIS, _graph_specs, _mesh_compatible


def init_runtime(coordinator_address: Optional[str] = None,
                 num_processes: Optional[int] = None,
                 process_id: Optional[int] = None,
                 local_device_count: Optional[int] = None,
                 platform: Optional[str] = None) -> None:
    """Initialize the multi-process JAX runtime.

    Call before any other JAX API touches the backend. With no arguments
    on a managed cluster, jax.distributed autodetects the topology; the
    explicit form is for manual launches and the CPU-simulated tests.

    platform='cpu' forces the host platform (the environment's TPU plugin
    ignores JAX_PLATFORMS, so this goes through jax.config) and selects
    gloo cross-process collectives; local_device_count then sets the
    number of virtual CPU devices this process contributes.
    """
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        if local_device_count is not None:
            jax.config.update("jax_num_cpu_devices", int(local_device_count))
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_coordinator() -> bool:
    """True on the process that should log / checkpoint / evaluate."""
    return jax.process_index() == 0


def make_global_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D edge-partition mesh over the GLOBAL device set (all processes).

    n_devices limits the mesh (must then be a multiple of the per-process
    device count so every process contributes whole chips)."""
    devices = jax.devices()
    if n_devices is not None:
        per_proc = jax.local_device_count()
        if n_devices % per_proc:
            raise ValueError(
                f"n_devices={n_devices} must be a multiple of the "
                f"per-process device count ({per_proc}): truncating "
                f"jax.devices() mid-process would leave some processes "
                f"with partial (or zero) device ownership and their "
                f"local batch rows unaddressable")
        if n_devices < per_proc * jax.process_count():
            raise ValueError(
                f"n_devices={n_devices} excludes whole processes "
                f"({jax.process_count()} processes x {per_proc} devices); "
                f"every participating process must contribute devices")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EDGE_AXIS,))


def _local_row_block(mesh: Mesh, n_rows: int) -> slice:
    """The contiguous row range of a [n_rows, ...] EDGE_AXIS-sharded array
    owned by this process's devices.

    The mesh is 1-D over jax.devices(), which orders devices by process;
    each device owns n_rows / mesh_size consecutive rows.
    """
    n_mesh = mesh.devices.size
    if n_rows % n_mesh:
        raise ValueError(f"leading dim {n_rows} not divisible by mesh size "
                         f"{n_mesh}")
    per_dev = n_rows // n_mesh
    local_ids = [i for i, d in enumerate(mesh.devices.flat)
                 if d.process_index == jax.process_index()]
    if not local_ids:
        return slice(0, 0)
    lo, hi = min(local_ids), max(local_ids)
    if local_ids != list(range(lo, hi + 1)):
        raise ValueError("process's devices are not contiguous in the mesh")
    return slice(lo * per_dev, (hi + 1) * per_dev)


def _shard_local(mesh: Mesh, x) -> jax.Array:
    """Host-global [N, ...] array -> EDGE_AXIS-sharded global jax.Array,
    transferring only the process-local rows."""
    sharding = NamedSharding(mesh, P(EDGE_AXIS))
    x = np.asarray(x)
    rows = _local_row_block(mesh, x.shape[0])
    return jax.make_array_from_process_local_data(sharding, x[rows],
                                                  x.shape)


def global_shard_batch(mesh: Mesh, graph, triples, labels, mask):
    """Multi-process counterpart of mesh.shard_batch: every process holds
    the same host-global batch and contributes its local row block."""
    rep_graph = None
    if graph is not None:
        graph = _mesh_compatible(graph, mesh.devices.size)
        rep_graph = jax.tree_util.tree_map(lambda x: _shard_local(mesh, x),
                                           graph)
    return (rep_graph, _shard_local(mesh, triples),
            _shard_local(mesh, labels), _shard_local(mesh, mask))


def global_replicate(mesh: Mesh, tree):
    """Replicated placement across a process-spanning mesh. Every process
    passes the identical host tree (seeded init guarantees this)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)

    return jax.tree_util.tree_map(put, tree)


def fetch_replicated(tree):
    """Replicated global jax.Arrays -> host numpy tree (reads the local
    replica; valid on every process). Use to hand params to a
    process-local evaluator."""
    def get(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)
