"""Multi-host (DCN) scaffolding: jax.distributed wiring + per-host batches.

The reference is strictly single-process/single-GPU (SURVEY.md §5.8); its
"cluster story" is shell scripts launching independent jobs. The TPU-native
multi-host design is greenfield:

  * every host runs this same program; `initialize_distributed()` wires up
    the JAX coordination service when launched under a multi-host runtime
    (TPU pod slices auto-detect; explicit env vars cover CPU/GPU clusters);
  * the ("data", "tile") mesh spans ALL devices in the job — the "data"
    axis crosses hosts, so camera-batch gradients reduce over DCN while
    tile-axis collectives stay inside a host's ICI domain (make_mesh lays
    hosts out along the leading axis);
  * batch distribution is index-based: every host computes the same global
    permutation from the same seed, takes its process's contiguous slice
    of each global batch, and `global_batch()` assembles the host-local
    slices into one global jax.Array for the jitted sharded step.

Single-process runs (the common case, and all tests) take the exact same
code path — process_count == 1 just makes every slice the whole batch.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Auto-detects TPU pod environments (jax.distributed.initialize with no
    args); CPU/GPU clusters pass coordinator/num_processes/process_id or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    Returns True when a multi-process runtime was initialized.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    # TPU pod slices: the runtime carries its own cluster metadata and
    # initialize() needs no arguments; only meaningful when more than one
    # process will join.
    if os.environ.get("TPU_WORKER_HOSTNAMES") or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def host_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of a global camera batch.

    All hosts draw the same global index permutation (same seed), so
    slicing by process index partitions the batch without communication.
    `global_batch` must be divisible by process_count (callers round the
    batch size up with `pad_batch_for_hosts`)."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def pad_batch_for_hosts(batch: int) -> int:
    """Round a batch size up to a multiple of the process count."""
    n = jax.process_count()
    return -(-batch // n) * n


def global_batch(local_tree, mesh: Mesh):
    """Assemble host-local batch arrays into a global jax.Array sharded
    along the mesh's "data" axis (leading dim). Identity reshard in
    single-process runs."""
    spec = P("data")
    if jax.process_count() == 1:
        sharding = NamedSharding(mesh, spec)
        return jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), local_tree)
    from jax.experimental import multihost_utils
    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            x, mesh, spec), local_tree)
