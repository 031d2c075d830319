"""Multi-process (multi-host) execution.

The reference's only scale-out is single-process nn.DataParallel
(reference train.py:104-105): one Python process owns every GPU and
`scatter` slices a host batch it fully materialized.  A TPU pod slice
beyond one host is MULTI-PROCESS by construction — each host's process
addresses only its local chips — so the TPU-native replacement has
three parts:

  1. `jax.distributed.initialize` (here: `init_distributed`) joins the
     processes into one runtime; `jax.devices()` then returns the
     GLOBAL device list and collectives span all of them.
  2. Each process loads ONLY its slice of every global batch
     (`EpisodicBatcher(process_id=, process_count=)` — the index
     sequence is seed-deterministic and identical on every process, so
     rank r materializing rows [r*B/P, (r+1)*B/P) of each batch
     reconstructs exactly the single-process batch, just partitioned).
  3. `jax.make_array_from_process_local_data` assembles the global
     sharded array from those per-process rows (`shard_batch` in
     dana_tpu.parallel dispatches here when process_count() > 1 —
     a plain device_put of host-global arrays only works when one
     process addresses every device).

The jitted train step is UNCHANGED: params replicated, batch sharded
over 'data' (or slice x data), XLA inserting the gradient all-reduce —
now riding ICI within a host/slice and DCN across, exactly the
two-level recipe make_mesh_dcn documents.

Verified by tests/test_distributed.py: a 2-process x 4-CPU-device run
(gloo collectives, coordinator on localhost) reproduces the
single-process 8-device step's loss and updated params at equal global
batch, and tools/dist_train_check.py is the standalone harness.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Join this process into a multi-process JAX runtime.

    On TPU pods all three arguments are auto-detected from the TPU
    metadata environment — call with no arguments.  On CPU/GPU (and in
    the 2-process CPU test) they must be passed explicitly.  Must run
    before the first backend query (any jax.devices()/jit call).
    """
    kwargs = {}
    if coordinator:
        kwargs['coordinator_address'] = coordinator
    if num_processes is not None:
        kwargs['num_processes'] = num_processes
    if process_id is not None:
        kwargs['process_id'] = process_id
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def barrier(name: str, timeout_ms: int | None = None) -> None:
    """Block until every process reaches this named barrier.

    Rides the coordination service (the jax.distributed KV store), NOT
    a device collective — so it works before any program has run and is
    not subject to the CPU gloo context's fixed 30s key-exchange
    timeout.  Use it to bound cross-process skew before the FIRST
    collective executes: XLA compile times differ across ranks (cold vs
    warm persistent cache), and a rank entering gloo context init more
    than 30s before its peers fails with GetKeyValue DEADLINE_EXCEEDED.
    No-op in single-process mode.

    Default timeout is 600s, overridable per call or globally via
    DANA_BARRIER_TIMEOUT_S.  Callers gating on work whose cross-rank
    skew is unbounded (e.g. a full detection pass where one rank has a
    cold compile cache) should pass a timeout sized to the WHOLE stage,
    not to the usual skew.
    """
    if jax.process_count() <= 1:
        return
    if timeout_ms is None:
        import os
        timeout_ms = 1000 * int(os.environ.get('DANA_BARRIER_TIMEOUT_S',
                                               '600'))
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def agree_stop(local_flag: bool) -> bool:
    """Collective OR of a per-process flag — the multi-process stop vote.

    A preemption SIGTERM may land on ONE host only, or at different step
    boundaries on different hosts; a rank that breaks out of the train
    loop alone strands its peers inside the gradient all-reduce of the
    step it never dispatches.  Every process must call this at the same
    loop boundary (the per-step metrics read already keeps hosts in
    lockstep); all return the identical decision, so every rank stops —
    or keeps going — at the same step.  No-op passthrough single-process.
    """
    if jax.process_count() <= 1:
        return bool(local_flag)
    from jax.experimental import multihost_utils
    votes = multihost_utils.process_allgather(
        np.int32(1 if local_flag else 0))
    return bool(np.asarray(votes).sum() > 0)


def batch_pspec(mesh: Mesh) -> P:
    """Leading-axis batch PartitionSpec for a 1-D ('data') or two-level
    ('slice', 'data') mesh."""
    if 'slice' in mesh.axis_names:
        return P(('slice', 'data'))
    return P('data')


def shard_batch_local(batch, mesh: Mesh, spec: P | None = None):
    """Assemble GLOBAL batch arrays from this process's LOCAL rows.

    `batch` holds only the rows this process loaded (1/process_count of
    the global batch, contiguous block in rank order).  Returns global
    jax.Arrays sharded over the mesh's batch axes whose addressable
    shards are backed by the local rows — no cross-host data movement.
    """
    spec = batch_pspec(mesh) if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def local_rows(global_batch_size: int,
               process_id: int | None = None,
               process_count: int | None = None) -> slice:
    """The contiguous row block of each global batch that this process
    loads (rank-ordered, matching jax.devices() process grouping)."""
    pid = jax.process_index() if process_id is None else process_id
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc:
        raise ValueError(
            f'global batch {global_batch_size} must divide evenly over '
            f'{pc} processes')
    per = global_batch_size // pc
    return slice(pid * per, (pid + 1) * per)


__all__ = ['init_distributed', 'is_multiprocess', 'agree_stop',
           'batch_pspec', 'shard_batch_local', 'local_rows']
