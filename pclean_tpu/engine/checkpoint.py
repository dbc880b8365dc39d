"""Checkpoint / resume for inference state.

The reference has no resume story — save_results exports CSVs that nothing
can reload (SURVEY.md §5, analysis.jl:15-33). Here the entire inference
state is a pytree of fixed-shape arrays (arenas + parameter states + PRNG
key), so checkpointing falls out of the array representation: this module
provides a dependency-free .npz format, and because the state is a standard
pytree it is equally usable with orbax.checkpoint for multi-host
deployments.
"""
from __future__ import annotations

import io
import os
import pickle
from typing import Any, Optional

import jax
import numpy as np

from .aot import fingerprint

FORMAT_VERSION = 1


def save_checkpoint(path: str, cm, arenas: dict, params: dict, key,
                    meta: Optional[dict] = None) -> None:
    """Atomically write state; records the model/data fingerprint so resume
    into a different compiled model is rejected."""
    leaves, treedef = jax.tree_util.tree_flatten((arenas, params, key))
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload = {
        "version": FORMAT_VERSION,
        "fingerprint": fingerprint(cm),
        "treedef": pickle.dumps(treedef),
        "meta": meta or {},
    }
    buf = io.BytesIO()
    np.savez_compressed(buf, __payload__=np.frombuffer(pickle.dumps(payload),
                                                       dtype=np.uint8),
                        **arrays)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_checkpoint(path: str, cm, strict: bool = True):
    """Returns (arenas, params, key, meta)."""
    with np.load(path, allow_pickle=False) as z:
        payload = pickle.loads(z["__payload__"].tobytes())
        if payload["version"] != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {payload['version']}")
        if strict and payload["fingerprint"] != fingerprint(cm):
            raise ValueError(
                "checkpoint fingerprint does not match the compiled model "
                "(different model structure or dataset); pass strict=False "
                "to force")
        treedef = pickle.loads(payload["treedef"])
        n = sum(1 for k in z.files if k.startswith("leaf_"))
        leaves = [jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(n)]
    arenas, params, key = jax.tree_util.tree_unflatten(treedef, leaves)
    return arenas, params, key, payload["meta"]
