"""Ahead-of-time program cache built on jax.export.

The reference JIT-compiles proposal code lazily per missingness pattern at
run time (block_proposal.jl:169-175, world-age crossings via invokelatest),
repaying that cost every session. Here every (class, pass) program is traced
once, exported to StableHLO, and cached on disk keyed by a fingerprint of
(package source, model structure, interned data, shapes). Later sessions
deserialize and skip Python tracing entirely; the persistent XLA cache (see
smc._setup_compilation_cache) skips backend compilation as well, so a warm
start pays neither tracing nor compilation.
"""
from __future__ import annotations

import glob
import hashlib
import os
import re
from typing import Any, Callable, Optional

import jax
import numpy as np
from jax import export as jax_export

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_src_hash_cache: Optional[str] = None


def _source_hash() -> str:
    """Hash of the package sources — stale AOT programs must never outlive a
    code change."""
    global _src_hash_cache
    if _src_hash_cache is None:
        h = hashlib.sha256()
        for path in sorted(glob.glob(os.path.join(_PKG_DIR, "**", "*.py"),
                                     recursive=True)):
            with open(path, "rb") as f:
                h.update(f.read())
        _src_hash_cache = h.hexdigest()[:16]
    return _src_hash_cache


def _stable_repr(o, depth: int = 0) -> str:
    """Deterministic-across-processes repr: the default repr of functions
    (and anything else falling back to object.__repr__) embeds the object's
    memory address, which changes every process — a fingerprint built on it
    never matches, silently turning the AOT cache into a per-process cache
    that re-traces and recompiles everything (the round-1 warm-start floor).
    Functions hash by code object + closure contents instead."""
    if depth > 12:
        return "..."
    if callable(o) and hasattr(o, "__code__"):
        code = o.__code__
        h = hashlib.sha256(code.co_code)
        for c in code.co_consts:
            if isinstance(c, (str, bytes, int, float, bool, type(None))):
                h.update(repr(c).encode())
        if o.__closure__:
            for cell in o.__closure__:
                try:
                    h.update(_stable_repr(cell.cell_contents,
                                          depth + 1).encode("utf-8", "ignore"))
                except ValueError:
                    h.update(b"<empty-cell>")
        return (f"fn:{os.path.basename(code.co_filename)}:"
                f"{code.co_firstlineno}:{h.hexdigest()[:12]}")
    if isinstance(o, dict):
        try:
            items = sorted(o.items())
        except TypeError:
            items = list(o.items())
        return "{" + ",".join(f"{_stable_repr(k, depth + 1)}:"
                              f"{_stable_repr(v, depth + 1)}"
                              for k, v in items) + "}"
    if isinstance(o, (list, tuple, set, frozenset)):
        body = ",".join(_stable_repr(x, depth + 1) for x in o)
        return f"{type(o).__name__}({body})"
    if isinstance(o, np.ndarray):
        return f"nd{o.shape}{o.dtype}:" + hashlib.sha256(
            np.ascontiguousarray(o).tobytes()).hexdigest()[:12]
    if isinstance(o, (str, bytes, int, float, bool, type(None))):
        return repr(o)
    # objects (dist specs, Ref/ParamRef, ...): type + attribute dict
    d = getattr(o, "__dict__", None)
    if d is not None:
        return f"{type(o).__name__}({_stable_repr(d, depth + 1)})"
    return re.sub(r"0x[0-9a-f]+", "0x~", repr(o))


def fingerprint(cm) -> str:
    """Fingerprint of the compiled model: structure + interned data.

    Any input that shapes the traced programs must contribute: graph/node
    structure, domain contents, dense tables, observation arrays,
    capacities. Everything feeding the hash must be process-stable (see
    _stable_repr).
    """
    h = hashlib.sha256()
    h.update(_source_hash().encode())
    for cid in cm.model.class_order:
        c = cm.cls(cid)
        h.update(cid.encode())
        for n in c.nodes:
            h.update(type(n).__name__.encode())
            h.update(_stable_repr(
                sorted(vars(n).items())).encode("utf-8", "ignore"))
        h.update(repr(c.blocks).encode())
        h.update(repr(c.hash_keys).encode())
    for key in sorted(cm.tables):
        h.update(repr(key).encode())
        h.update(cm.tables[key].tobytes())
    for key in sorted(cm.list_reg):
        h.update(repr(key).encode())
        h.update(repr(cm.list_reg[key]._lists).encode())
    for (cid, vid), dom in sorted(cm.domains.items()):
        h.update(f"{cid}:{vid}".encode())
        if dom is not None and dom.vocab is not None:
            h.update(repr(dom.vocab.values)[:100000].encode("utf-8", "ignore"))
    for spec in cm.obs_specs:
        for vid in sorted(spec.columns):
            codes, state = spec.columns[vid]
            h.update(np.ascontiguousarray(codes).tobytes())
            h.update(np.ascontiguousarray(state).tobytes())
    for cid, lay in sorted(cm.layouts.items()):
        h.update(f"{cid}:{lay.capacity}".encode())
    return h.hexdigest()[:24]


class AotCache:
    def __init__(self, cm, extra: str = ""):
        self.enabled = os.environ.get("PCLEAN_AOT_CACHE", "1") != "0"
        if not self.enabled:
            return
        try:
            self.dir = os.path.join(
                os.path.expanduser("~/.cache/pclean_tpu_aot"),
                fingerprint(cm) + extra)
            os.makedirs(self.dir, exist_ok=True)
        except Exception:
            self.enabled = False

    def wrap(self, name: str, jitted_fn: Callable) -> Callable:
        """Return a callable with the same signature; on first call it either
        deserializes the exported program (no tracing) or traces, exports and
        persists it.

        jax.export only serializes string-keyed dict pytrees, while arena
        pytrees are keyed by integer vertex ids — so the program is exported
        over flattened leaves, with the in/out treedefs pickled alongside.
        """
        if not self.enabled:
            return jitted_fn
        path = os.path.join(self.dir, name + ".stablehlo")
        tree_path = os.path.join(self.dir, name + ".tree.pkl")
        state: dict[str, Any] = {"fn": None, "out_tree": None}

        def call(*args):
            import pickle

            from jax.tree_util import tree_flatten, tree_unflatten

            leaves, in_tree = tree_flatten(args)
            if state["fn"] is None:
                if os.path.exists(path) and os.path.exists(tree_path):
                    try:
                        with open(tree_path, "rb") as f:
                            saved_in, saved_out = pickle.load(f)
                        if saved_in == in_tree:
                            with open(path, "rb") as f:
                                exp = jax_export.deserialize(f.read())
                            state["fn"] = jax.jit(exp.call)
                            state["out_tree"] = saved_out
                            out_leaves = state["fn"](*leaves)
                            return tree_unflatten(saved_out, out_leaves)
                    except Exception:
                        pass  # stale/incompatible: fall through to re-export
                out_box: list = []

                def flat_fn(*ls):
                    out = jitted_fn(*tree_unflatten(in_tree, ls))
                    ol, ot = tree_flatten(out)
                    out_box.append(ot)
                    return tuple(ol)

                try:
                    exp = jax_export.export(jax.jit(flat_fn))(*leaves)
                    with open(path + ".tmp", "wb") as f:
                        f.write(exp.serialize())
                    with open(tree_path + ".tmp", "wb") as f:
                        pickle.dump((in_tree, out_box[0]), f)
                    os.replace(path + ".tmp", path)
                    os.replace(tree_path + ".tmp", tree_path)
                    state["fn"] = jax.jit(exp.call)
                    state["out_tree"] = out_box[0]
                except Exception:
                    state["fn"] = None
                    return jitted_fn(*args)
            if state["out_tree"] is None:
                return jitted_fn(*args)
            from jax.tree_util import tree_unflatten as _unf

            out_leaves = state["fn"](*leaves)
            return _unf(state["out_tree"], out_leaves)

        return call
