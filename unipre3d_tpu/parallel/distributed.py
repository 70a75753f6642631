"""Multi-host runtime glue (jax.distributed + cross-host reductions).

The reference forms its global runtime with
``dist.init_process_group("NCCL")`` + mp.spawn (reference
pointcept/engines/launch.py:36-157) and all-reduces the validation PSNR
across ranks (reference train_network.py:253-257). The TPU-native
equivalents:

* ``maybe_initialize()`` — guarded ``jax.distributed.initialize()``.
  On a real multi-host pod the coordinator/process env vars are set (by
  the launcher or the Cloud TPU metadata server) and the call forms the
  global runtime so ``jax.devices()`` spans every host; on the
  single-host dev box it is a no-op. No rendezvous code of our own: no
  TCP port scanning, no NCCL — ICI/DCN topology comes from the platform.
* ``shard_host_batch()`` — per-host batch -> one global jax.Array whose
  leading axis is sharded over the ``data`` mesh axis
  (``jax.make_array_from_process_local_data``); on one process it is a
  plain sharded device_put.
* ``all_reduce_mean()`` — weighted scalar mean over processes (the
  reference's ``dist.all_reduce(psnr) / world_size``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: env vars that signal a multi-process launch. JAX's own auto-detect
#: covers Cloud TPU pods / SLURM / OpenMPI; the UNIPRE3D_* ones let a
#: bare-metal launcher opt in explicitly.
_COORD_ENV = ("UNIPRE3D_COORDINATOR", "JAX_COORDINATOR_ADDRESS",
              "COORDINATOR_ADDRESS")


def maybe_initialize(force: Optional[bool] = None) -> bool:
    """Call ``jax.distributed.initialize()`` when a multi-process launch
    is requested; return True iff the global runtime was (already)
    formed.

    Launch contract (mirrors the reference's single mandatory
    ``launch(...)`` at pointcept/engines/launch.py:36): run the SAME
    training command on every host with either

    * Cloud TPU pod / SLURM / MPI — no env needed, JAX auto-detects; set
      ``UNIPRE3D_DIST=1`` to opt in, or
    * explicit ``UNIPRE3D_COORDINATOR=host:port``,
      ``UNIPRE3D_NUM_PROCESSES=N``, ``UNIPRE3D_PROCESS_ID=i``.
    """
    want = force
    if want is None:
        want = os.environ.get("UNIPRE3D_DIST", "") == "1" or any(
            os.environ.get(k) for k in _COORD_ENV)
    import jax._src.xla_bridge as xb
    if xb.backends_are_initialized():
        # too late to initialize; OK if the embedding program already
        # formed the runtime (or no multi-process launch was requested)
        if jax.process_count() > 1:
            return True
        if want:
            raise RuntimeError(
                "maybe_initialize(): a multi-process launch was "
                "requested but the XLA backend is already initialized — "
                "call maybe_initialize() before any jax device query.")
        return False
    if not want:
        return False
    kwargs = {}
    coord = (os.environ.get("UNIPRE3D_COORDINATOR")
             or os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    if coord:
        kwargs["coordinator_address"] = coord
    if os.environ.get("UNIPRE3D_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["UNIPRE3D_NUM_PROCESSES"])
    if os.environ.get("UNIPRE3D_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["UNIPRE3D_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def shard_host_batch(batch: Any, mesh: Mesh) -> Any:
    """Per-host batch pytree -> global arrays with the leading axis
    sharded over ``data``.

    Every process passes its LOCAL shard (global_batch / process_count
    examples); the result's shape has the GLOBAL leading dimension.
    Single-process: equivalent to ``shard_batch`` (device_put)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def all_reduce_mean(value: float, weight: float = 1.0) -> float:
    """Weighted mean of a host scalar across processes (reference
    ``dist.all_reduce(psnr); psnr /= world_size``,
    train_network.py:253-257). Weight 0 lets a host with an empty val
    shard participate without skewing the mean.

    Two val-reduction paths exist, by shard shape:

    * the TRAINING val loop (train_network.py) pads every host's shard
      to equal length and reduces inside the SPMD eval_step — the
      replicated batch mean IS the cross-host mean, no host collective;
    * standalone ``eval.py`` shards examples WITHOUT padding (no example
      scored twice) and combines the per-host means here with
      ``weight=len(local_examples)`` — exact for uneven shards."""
    if jax.process_count() == 1:
        return float(value)
    from jax.experimental import multihost_utils
    vw = multihost_utils.process_allgather(
        np.asarray([value * weight, weight], np.float64))
    total_w = float(vw[:, 1].sum())
    return float(vw[:, 0].sum() / total_w) if total_w > 0 else 0.0
