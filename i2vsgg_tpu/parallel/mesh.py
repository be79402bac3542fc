"""Device mesh + sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(``trainval_net_instance_styleD_bilinear.py:200-201``, SURVEY.md §2.3). The
TPU-native equivalent is a named ``jax.sharding.Mesh`` with a data axis:
batches are sharded on their leading dim, params replicated, and XLA inserts
the gradient ``psum`` over ICI automatically when the jitted loss averages
over the global batch.

The mesh is built with a general (data, model) shape so tensor-parallel
shardings can be layered on later; today the model axis is size 1.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    """Place every array's leading dim across the data axis."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
