"""Device mesh + sharding helpers (single- and multi-host).

The reference's only parallelism is single-process ``nn.DataParallel``
(``trainval_net_instance_styleD_bilinear.py:200-201``, SURVEY.md §2.3). The
TPU-native equivalent is a named ``jax.sharding.Mesh`` with a data axis:
batches are sharded on their leading dim, params replicated, and XLA inserts
the gradient ``psum`` over ICI automatically when the jitted loss averages
over the global batch.

The mesh is built with a general (data, model) shape so tensor-parallel
shardings can be layered on later; today the model axis is size 1.

Multi-host: ``maybe_init_distributed()`` wires ``jax.distributed`` from the
standard coordinator env vars; ``make_mesh`` then spans the GLOBAL device
set, each host feeds its local shard of the global batch through
``shard_batch`` (``jax.make_array_from_process_local_data``), and
``host_shard`` slices a roidb per process for the input pipeline (DCN only
carries input data; gradient collectives ride ICI inside jit).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when coordinator env vars are present
    (I2VSGG_COORD or the standard JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID). Returns True when multi-process.

    Idempotent; single-process runs are untouched.
    """
    coord = (os.environ.get("I2VSGG_COORD")
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not coord:
        return False
    nproc = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if nproc <= 1:
        return False
    pid = int(os.environ.get("JAX_PROCESS_ID", "0"))
    global _DISTRIBUTED_UP
    if _DISTRIBUTED_UP:          # second call in-process would RuntimeError
        return True
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    _DISTRIBUTED_UP = True
    return True


_DISTRIBUTED_UP = False


def sync_global_devices(tag: str) -> None:
    """Cross-process barrier (e.g. after process-0-only checkpoint writes).
    No-op single-process."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def host_shard(entries: Sequence, batch_size: int):
    """This process's contiguous slice of a (ratio-sorted) roidb: each host
    loads 1/num_processes of the data, keeping aspect grouping intact.
    The per-host length is truncated to a common multiple of batch_size so
    every host steps the same number of times (collectives stay aligned)."""
    n = jax.process_count()
    if n == 1:
        return list(entries)
    i = jax.process_index()
    per = len(entries) // n
    per -= per % max(batch_size, 1)
    return list(entries[i * per:(i + 1) * per])


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n]).reshape(n // model_parallel,
                                              model_parallel)
    return Mesh(devices, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array's leading dim across the data axis.

    Single-process: a plain sharded device_put. Multi-process: each host
    passes its LOCAL batch (global_batch / process_count rows) and the
    global array is assembled from the per-process shards.
    """
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
