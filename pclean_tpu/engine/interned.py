"""Large host constants as program ARGUMENTS, not embedded literals.

Every step program traces over host-side model data: AddTypos pair
matrices, list-registry masks, observation code/state columns, dense CPT
tables. `jnp.asarray(host_array)` inside a jit embeds them as literals, so
each of the ~20 per-class programs carried its own copy of every table —
the rents sweep programs serialized to ~50 MB of StableHLO each (a
3,275^2 fp32 typo matrix alone is 43 MB), which made per-process program
load/deserialize/upload the dominant cost of a warm start on a tunneled
TPU (~0.7 s cache read per program on CPU, much worse over the tunnel;
measured ~320 s of a 422 s "warm" hospital-100k run).

The InternTable turns those literals into program arguments:

  * `register(arr)` (compile time): remember a host array by object
    identity; arrays below MIN_BYTES stay literals (tiny scalars/vectors
    fuse better as constants and don't bloat programs).
  * `use(arr)` (trace time): drop-in for `jnp.asarray(arr)` — inside a
    program built by `Engine._program` it returns the traced argument
    leaf for `arr`; outside (eager use, foreign jits like the sharded
    wrappers) it falls back to the literal, preserving old behavior.
  * `bind(leaves)` / `device_leaves()`: the Engine threads one tuple of
    device-resident arrays through every program call; the upload happens
    once per process instead of once per program.

The reference has no analogue (Julia JIT shares host memory); this is
TPU-transport engineering.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

MIN_BYTES = 1 << 16  # 64 KB: below this a literal is harmless


class InternTable:
    def __init__(self):
        self.arrays: list[np.ndarray] = []   # holds refs -> ids stay valid
        self.by_id: dict[int, int] = {}
        self._tls = threading.local()
        self._dev: tuple | None = None
        # {(shape, dtype): count} of LARGE ndarrays that use() saw while a
        # program was being traced but that were never registered — each one
        # silently embeds as a multi-MB literal (id()-based matching misses
        # equal-content copies; ADVICE r3). scripts/profile_costs.py prints
        # this so regressions of the ~50MB-program fix stay visible.
        self.misses: dict[tuple, int] = {}

    def register(self, arr):
        """Remember `arr` (if large) for argument-passing; returns arr."""
        if isinstance(arr, np.ndarray) and arr.nbytes >= MIN_BYTES \
                and id(arr) not in self.by_id:
            self.by_id[id(arr)] = len(self.arrays)
            self.arrays.append(arr)
            self._dev = None  # grew: re-snapshot on next device_leaves()
        return arr

    def register_tree(self, obj):
        """Register every large ndarray reachable in a dict/list/tuple or
        an object's attribute dict (kernel instances)."""
        if isinstance(obj, np.ndarray):
            self.register(obj)
        elif isinstance(obj, dict):
            for v in obj.values():
                self.register_tree(v)
        elif isinstance(obj, (list, tuple)):
            for v in obj:
                self.register_tree(v)
        elif hasattr(obj, "__dict__"):
            for v in vars(obj).values():
                if isinstance(v, (np.ndarray, dict, list, tuple)):
                    self.register_tree(v)
        return obj

    def use(self, arr):
        """jnp.asarray(arr), or the bound traced leaf when inside a
        program built by Engine._program."""
        leaves = getattr(self._tls, "leaves", None)
        if leaves is not None:
            idx = self.by_id.get(id(arr))
            if idx is not None and idx < len(leaves):
                return leaves[idx]
            if isinstance(arr, np.ndarray) and arr.nbytes >= MIN_BYTES:
                key = (arr.shape, str(arr.dtype))
                self.misses[key] = self.misses.get(key, 0) + 1
        return jnp.asarray(arr)

    @contextmanager
    def bind(self, leaves):
        prev = getattr(self._tls, "leaves", None)
        self._tls.leaves = tuple(leaves)
        try:
            yield
        finally:
            self._tls.leaves = prev

    def device_leaves(self) -> tuple:
        """The host arrays as device arrays, uploaded once per process."""
        if self._dev is None or len(self._dev) != len(self.arrays):
            self._dev = tuple(jax.device_put(a) for a in self.arrays)
        return self._dev
