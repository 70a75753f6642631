"""Multi-host runtime glue: 2 real processes x 4 virtual CPU devices.

Exercises the path the reference covers with its NCCL process group
(reference pointcept/engines/launch.py:36-157 + the validation-PSNR
all-reduce at train_network.py:253-257): ``maybe_initialize`` forms the
global runtime from env vars, ``make_mesh`` spans both processes,
``shard_host_batch`` assembles a global data-sharded batch from per-host
shards, a jitted global mean reduces across hosts, and
``all_reduce_mean`` aggregates host scalars.

The workers are real OS processes (subprocess, not threads): JAX's
distributed client is per-process, exactly like one process per pod
host.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import numpy as np
import jax
import jax.numpy as jnp

from unipre3d_tpu.parallel import (all_reduce_mean, make_mesh,
                                   maybe_initialize, replicate,
                                   shard_host_batch)

assert maybe_initialize(), "maybe_initialize() did not form the runtime"
pid, nproc = jax.process_index(), jax.process_count()
assert nproc == 2, nproc
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

mesh = make_mesh()                      # global mesh over both processes
assert mesh.devices.size == 8

# per-host batch shard -> one global array [8, 16]
local = np.full((4, 16), float(pid), np.float32)
batch = {"x": local}
gb = shard_host_batch(batch, mesh)
assert gb["x"].shape == (8, 16), gb["x"].shape

# params live replicated on the global mesh
w = replicate({"w": np.float32(2.0)}, mesh)

# jitted global mean: the cross-host all-reduce happens inside XLA
step = jax.jit(lambda p, b: jnp.mean(b["x"]) * p["w"])
out = float(step(w, gb))                # mean of 4x0 and 4x1 rows = 0.5
assert abs(out - 1.0) < 1e-6, out

# host-scalar weighted mean (reference dist.all_reduce(psnr)/world)
m = all_reduce_mean(float(pid * 10), weight=1.0)
assert abs(m - 5.0) < 1e-6, m
# weight-0 hosts don't skew the mean
m2 = all_reduce_mean(123.0 if pid == 0 else 0.0,
                     weight=1.0 if pid == 0 else 0.0)
assert abs(m2 - 123.0) < 1e-6, m2

# UNEVEN val shards (the production eval.py path): 5 examples over 2
# processes with pad_shards=False -> shard lengths 3 and 2; the
# weighted all_reduce_mean reproduces the exact global mean, which a
# plain mean-of-host-means would get wrong.
from unipre3d_tpu.data.loader import Loader

class _DS:
    def __len__(self):
        return 5
    def __getitem__(self, i):
        return {"x": np.full((2,), float(i), np.float32)}

ld = Loader(_DS(), 1, shuffle=False, shard_id=pid, num_shards=nproc,
            pad_shards=False, drop_last=False, num_workers=1)
vals = [float(b["x"][0, 0]) for b in ld.epoch(0)]
assert len(vals) == (3 if pid == 0 else 2), vals
m3 = all_reduce_mean(float(np.mean(vals)), weight=float(len(vals)))
assert abs(m3 - 2.0) < 1e-6, m3          # mean(0..4) = 2.0
print(f"worker {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "UNIPRE3D_COORDINATOR": f"127.0.0.1:{port}",
            "UNIPRE3D_NUM_PROCESSES": "2",
            "UNIPRE3D_PROCESS_ID": str(pid),
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            raise AssertionError(f"worker timed out; output:\n{out}")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} rc={p.returncode}:\n{out}"
        assert f"worker {pid} OK" in out, out


def test_single_process_fallbacks():
    """Single-process semantics of the same helpers (no subprocs)."""
    import jax
    from unipre3d_tpu.parallel import (all_reduce_mean, make_mesh,
                                       shard_host_batch)
    mesh = make_mesh()
    b = shard_host_batch({"x": np.ones((mesh.devices.size, 3), np.float32)},
                         mesh)
    assert b["x"].shape == (mesh.devices.size, 3)
    assert all_reduce_mean(7.0) == 7.0
    from unipre3d_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize(force=False) in (False, True)
