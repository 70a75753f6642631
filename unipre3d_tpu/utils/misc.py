"""Runtime misc helpers (reference utils/general_utils.py parity).

``safe_state`` seeds every RNG source and installs a timestamped stdout
shim (reference utils/general_utils.py:209-248); ``to_device`` is the
recursive device-put (reference :296-327 — on TPU just a tree
device_put); ``seeded_worker`` mirrors the seeded worker_init_fn
(pointcept/engines/defaults.py:46-59) for loader threads.
"""

from __future__ import annotations

import random
import sys
import time
from typing import Any, Optional

import jax
import numpy as np


class _TimestampedStdout:
    def __init__(self, inner):
        self._inner = inner
        self._at_line_start = True

    def write(self, text):
        out = []
        for chunk in text.splitlines(keepends=True):
            if self._at_line_start and chunk.strip():
                out.append(time.strftime("[%d/%m %H:%M:%S] "))
            out.append(chunk)
            self._at_line_start = chunk.endswith("\n")
        self._inner.write("".join(out))

    def flush(self):
        self._inner.flush()

    def __getattr__(self, name):
        return getattr(self._inner, name)


def safe_state(seed: int, timestamp_stdout: bool = True) -> jax.Array:
    """Seed python/numpy and return a jax PRNG key; optionally wrap
    stdout with timestamps (reference safe_state)."""
    random.seed(seed)
    np.random.seed(seed)
    if timestamp_stdout and not isinstance(sys.stdout, _TimestampedStdout):
        sys.stdout = _TimestampedStdout(sys.stdout)
    return jax.random.PRNGKey(seed)


def seeded_worker(worker_id: int, base_seed: int) -> np.random.Generator:
    """Per-worker RNG stream (DistributedSampler worker_init_fn analog)."""
    return np.random.default_rng(base_seed + worker_id * 1013)


def to_device(tree: Any, sharding: Optional[Any] = None) -> Any:
    """Recursive device placement of a (possibly nested) batch."""
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jax.device_put
    return jax.tree_util.tree_map(put, tree)
