"""Device mesh + sharding helpers (TPU-native data parallelism).

The reference's only parallelism is single-node DDP over NCCL
(reference pointcept/engines/launch.py:36-157, SURVEY.md §2.9). The
TPU-native equivalent is a 1-D ``data`` mesh: the train step is jitted
with batch inputs sharded over the ``data`` axis and parameters
replicated; XLA inserts the gradient all-reduce over ICI, and BatchNorm
statistics are computed on the global batch (SyncBatchNorm for free).
Multi-host execution shards the input pipeline per host
(Loader shard_id/num_shards) and relies on jax.distributed for DCN.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (all by default)."""
    devs = jax.devices()
    if num_devices is not None and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with the leading axis sharded over
    ``data``."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
