"""Accuracy evaluation and result export.

Counterpart of /root/reference/src/analysis.jl: cell-level repair scoring
(evaluate_accuracy, analysis.jl:36-88), its prefix-N variant (90-143), and
CSV export of the reconstructed dataset + inferred latent tables
(save_results/save_tables, analysis.jl:8-33).
"""
from __future__ import annotations

import csv
import datetime
import os
from typing import Any, Optional

import numpy as np

from .domains import CATEGORICAL, FLOAT
from .engine.compile import CompiledModel
from .engine.propose import row_value
from .engine.refresh import refresh
from .model.ir import ChoiceNode, ComputeNode, ForeignKeyNode, SubmodelNode
from .model.query import ObservedDataset, Query


def read_cell_values(cm: CompiledModel, arenas: dict, params: dict,
                     cid: str, vid: int) -> list:
    """Decode one queried vertex for every row of an observed class
    (jitted gather chains; computes re-derived through fk indirection)."""
    lay = cm.layouts[cid]
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda a, p: row_value(cm, a, p, cid, vid,
                                        jnp.arange(lay.capacity)))
    vals = np.asarray(fn(arenas, params))
    from .model.ir import strip_subnodes

    if isinstance(strip_subnodes(cm.node(cid, vid)), ForeignKeyNode):
        return [int(v) for v in vals]
    dom = cm.domain(cid, vid)
    if dom is None or dom.kind == FLOAT:
        return [float(v) for v in vals]
    return [dom.vocab.decode(int(v)) if 0 <= int(v) < len(dom.vocab) else None
            for v in vals]


def evaluate_accuracy(cm: CompiledModel, arenas: dict, params: dict,
                      dirty: dict[str, list], clean: dict[str, list],
                      query: Query, up_to: Optional[int] = None,
                      verbose: bool = False) -> dict:
    """Cell-level scoring (analysis.jl:36-88; up_to -> 90-143).

    dirty/clean: {column: values} with None for missing.
    """
    ours: dict[str, list] = {}
    for col, vid in query.cleanmap.items():
        ours[col] = read_cell_values(cm, arenas, params, query.class_id, vid)

    n_rows = len(next(iter(dirty.values())))
    errors = changed = cleaned = imputed = imputed_ok = 0
    for i in range(n_rows):
        if up_to is not None and i >= up_to:
            break
        for col in clean:
            if col not in dirty:
                continue
            d = dirty[col][i]
            c = clean[col][i]
            if d is None:
                if col in ours and c is not None:
                    imputed += 1
                    if _eq(ours[col][i], c):
                        imputed_ok += 1
                continue
            if not _eq(d, c):
                errors += 1
            if col in ours:
                o = ours[col][i]
                if not _eq(o, d):
                    changed += 1
                    if _eq(o, c):
                        cleaned += 1
                    elif verbose:
                        print(f"Changed: {d!r} -> {o!r} instead of {c!r}")
                elif verbose and not _eq(d, c):
                    print(f"Left unchanged: {d!r} (should be {c!r})")
    precision = (cleaned + imputed_ok) / max(changed + imputed, 1)
    recall = (cleaned + imputed_ok) / max(errors + imputed, 1)
    f1 = 0.0 if precision + recall == 0 else \
        2.0 / (1.0 / max(precision, 1e-12) + 1.0 / max(recall, 1e-12))
    return dict(f1=f1, errors=errors, changed=changed, cleaned=cleaned,
                precision=precision, recall=recall, imputed=imputed,
                correctly_imputed=imputed_ok)


def evaluate_accuracy_device(cm: CompiledModel, arenas: dict, params: dict,
                             dirty: dict[str, list], clean: dict[str, list],
                             query: Query, up_to: Optional[int] = None) -> dict:
    """evaluate_accuracy with all cell comparisons computed on-device.

    Same counts as the host version (analysis.jl:36-88), but only five
    scalars per column cross the device boundary — on tunneled backends bulk
    device->host fetches are both slow and fragile, and this also scales to
    sharded multi-host state.
    """
    import jax
    import jax.numpy as jnp

    n_rows = len(next(iter(dirty.values())))
    lay = cm.layouts[query.class_id]
    N = min(n_rows, lay.capacity)
    row_limit = N if up_to is None else min(up_to, N)

    cols = []
    for col in clean:
        if col not in dirty:
            continue
        vid = query.cleanmap.get(col)
        dom = cm.domain(query.class_id, vid) if vid is not None else None
        is_float = dom is not None and dom.kind == FLOAT
        dvals, cvals = dirty[col][:N], clean[col][:N]
        dp = np.array([v is not None and v == v for v in dvals], dtype=bool)
        cp = np.array([v is not None and v == v for v in cvals], dtype=bool)
        if is_float:
            d = np.array([float(v) if p else 0.0 for v, p in zip(dvals, dp)],
                         dtype=np.float32)
            c = np.array([float(v) if p else 0.0 for v, p in zip(cvals, cp)],
                         dtype=np.float32)
        elif dom is not None:
            d = np.array([dom.vocab.get(v, -1) if p else -1
                          for v, p in zip(dvals, dp)], dtype=np.int32)
            c = np.array([dom.vocab.get(v, -2) if p else -2
                          for v, p in zip(cvals, cp)], dtype=np.int32)
        else:
            # column not queried: only contributes error counts
            d = np.array([0] * N, dtype=np.int32)
            eq_dc = np.array([_eq(a, b) for a, b in zip(dvals, cvals)])
            cols.append((col, None, None, dp, cp, None, None, eq_dc))
            continue
        cols.append((col, vid, is_float, dp, cp, d, c, None))

    # column arrays ride in as ARGUMENTS (one upload, no multi-MB
    # embedded literals in the eval program - same rationale as
    # engine/interned.py)
    col_data = {col: tuple(jnp.asarray(x) for x in (d, c, dp, cp))
                for (col, vid, _isf, dp, cp, d, c, _e) in cols
                if vid is not None}

    def counts_fn(arenas, params, col_data):
        out = {}
        rows_mask = jnp.arange(N) < row_limit
        for (col, vid, is_float, _dp, _cp, _d, _c, eq_dc) in cols:
            if vid is None:
                continue
            dj, cj, dpj, cpj = col_data[col]
            ours = row_value(cm, arenas, params, query.class_id, vid,
                             jnp.arange(N))
            if is_float:
                ours = ours.astype(jnp.float32)
                eq = lambda a, b: jnp.abs(a - b) <= 1e-6 * jnp.maximum(
                    1.0, jnp.abs(b))
            else:
                ours = ours.astype(jnp.int32)
                eq = lambda a, b: a == b
            err = rows_mask & dpj & ~(eq(dj, cj) & cpj)
            chg = rows_mask & dpj & ~eq(ours, dj)
            cln = chg & eq(ours, cj) & cpj
            imp = rows_mask & ~dpj & cpj
            imp_ok = imp & eq(ours, cj)
            out[col] = jnp.stack([err.sum(), chg.sum(), cln.sum(),
                                  imp.sum(), imp_ok.sum()])
        return out

    got = jax.jit(counts_fn)(arenas, params, col_data)
    errors = changed = cleaned = imputed = imputed_ok = 0
    for (col, vid, _isf, dp, cp, _d, _c, eq_dc) in cols:
        if vid is None:
            lim = np.arange(N) < row_limit
            errors += int((lim & dp & ~(eq_dc & cp)).sum())
            continue
        e, ch, cl, im, io = [int(x) for x in np.asarray(got[col])]
        errors += e
        changed += ch
        cleaned += cl
        imputed += im
        imputed_ok += io
    precision = (cleaned + imputed_ok) / max(changed + imputed, 1)
    recall = (cleaned + imputed_ok) / max(errors + imputed, 1)
    f1 = 0.0 if precision + recall == 0 else \
        2.0 / (1.0 / max(precision, 1e-12) + 1.0 / max(recall, 1e-12))
    return dict(f1=f1, errors=errors, changed=changed, cleaned=cleaned,
                precision=precision, recall=recall, imputed=imputed,
                correctly_imputed=imputed_ok)


def _eq(a: Any, b: Any) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return abs(float(a) - float(b)) <= 1e-9 * max(1.0, abs(float(b)))
        except (TypeError, ValueError):
            return False
    return a == b


def save_results(cm: CompiledModel, arenas: dict, params: dict,
                     out_dir: str, name: str,
                     datasets: list[ObservedDataset],
                     timestamp: bool = True) -> str:
    """save_results (analysis.jl:15-33): reconstructed flat CSV per observed
    dataset + one CSV per latent class."""
    if timestamp:
        out_dir = os.path.join(out_dir,
                               f"{name}-{datetime.datetime.now().isoformat()}")
    else:
        out_dir = os.path.join(out_dir, name)
    os.makedirs(out_dir, exist_ok=True)
    for ds in datasets:
        q = ds.query
        cols = ds.columns()
        out = {}
        for col, vals in cols.items():
            if col in q.cleanmap:
                out[col] = read_cell_values(cm, arenas, params, q.class_id,
                                            q.cleanmap[col])[: len(vals)]
            else:
                out[col] = vals
        _write_csv(os.path.join(out_dir, f"reconstructed_{q.class_id}.csv"), out)
    save_tables(cm, arenas, params, out_dir)
    return out_dir


def save_tables(cm: CompiledModel, arenas: dict, params: dict,
                out_dir: str) -> None:
    """save_tables (analysis.jl:8-13): one CSV per latent class with its
    named choice/compute/fk attributes for live rows."""
    import jax.numpy as jnp

    obs_classes = {s.class_id for s in cm.obs_specs}
    obs_dev = {}
    for spec in cm.obs_specs:
        obs_dev[spec.class_id] = {v: (jnp.asarray(c), jnp.asarray(s))
                                  for v, (c, s) in spec.columns.items()}
    rel = refresh(cm, arenas, obs_dev)
    for cid in cm.model.class_order:
        if cid in obs_classes:
            continue
        c = cm.cls(cid)
        lay = cm.layouts[cid]
        alive = np.asarray(rel[cid]["alive"])
        ids = [int(i) for i in np.flatnonzero(alive)]
        out = {"id": ids}
        for nm, vid in c.names.items():
            node = c.nodes[vid]
            if not isinstance(node, (ChoiceNode, ComputeNode, ForeignKeyNode)):
                continue
            vals = read_cell_values(cm, arenas, params, cid, vid)
            out[nm] = [vals[i] for i in ids]
        _write_csv(os.path.join(out_dir, f"inferred_{cid}.csv"), out)


def _write_csv(path: str, cols: dict[str, list]) -> None:
    keys = list(cols)
    n = max((len(v) for v in cols.values()), default=0)
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(keys)
        for i in range(n):
            w.writerow([cols[k][i] if i < len(cols[k]) else "" for k in keys])
