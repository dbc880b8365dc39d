"""Relational state refresh: recompute-don't-track.

The reference maintains reference counts, row liveness, hashed keys and
propagated observations *incrementally* through ~250 lines of mutation
(/root/reference/src/model/dependency_tracking.jl: incorporate_row!,
unincorporate_row!, refer_to_row!, unrefer_to_row!,
incorporate/unincorporate_observations!). On TPU the same invariants are
cheaper to *recompute* as dense reductions over the arenas each step:

  * a latent row is alive iff its recomputed reference count is > 0 — this
    subsumes the reference's reference-counted garbage collection
    (dependency_tracking.jl:184-201), including transitive GC, because
    classes are processed in reverse declaration order (a class can only
    reference earlier-declared classes, so referrers are resolved first);
  * Pitman-Yor bookkeeping (total_references, K = #rows;
    trace.jl:24-44,53-61) falls out of the same histograms;
  * observations implied by reference slots (incorporate_observations!,
    dependency_tracking.jl:102-158) are re-propagated down slot chains with
    chained gathers + scatter-max.

`exclude` removes one row's outgoing contributions, which is the functional
equivalent of unincorporate_row! at the start of a CSMC rejuvenation
(row_inference.jl:119-126).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..model.ir import (ChoiceNode, ClassID, ForeignKeyNode, SubmodelNode,
                        VertexID)
from .compile import CompiledModel


def direct_references(cm: CompiledModel) -> dict[ClassID, list[tuple[ClassID, VertexID]]]:
    """target class -> [(source class, raw fk vertex in source)]."""
    out: dict[ClassID, list] = {cid: [] for cid in cm.model.class_order}
    for cid in cm.model.class_order:
        for vid in cm.layouts[cid].fk_vertices:
            node = cm.node(cid, vid)
            out[node.target_class].append((cid, vid))
    return out


def hop_chain(cm: CompiledModel, cid: ClassID, vid: VertexID):
    """For a submodel vertex, the chain of raw fk hops from `cid` down to the
    vertex's original class: ([(class, fk_vid), ...], (orig_class, orig_vid))."""
    node = cm.node(cid, vid)
    chain = []
    while isinstance(node, SubmodelNode):
        fk = cm.node(cid, node.fk_id)
        assert isinstance(fk, ForeignKeyNode)
        chain.append((cid, node.fk_id))
        cid, vid = fk.target_class, node.sub_id
        node = cm.node(cid, vid)
    return chain, (cid, vid)


def propagated_obs_specs(cm: CompiledModel):
    """[(source class, obs vertex, hop chain, (target class, target vid))]
    for every observed column that lands on a submodel vertex."""
    specs = []
    for spec in cm.obs_specs:
        for ov in spec.columns:
            node = cm.node(spec.class_id, ov)
            if isinstance(node, SubmodelNode):
                chain, (tc, tv) = hop_chain(cm, spec.class_id, ov)
                specs.append((spec.class_id, ov, chain, (tc, tv)))
    return specs


def refresh(cm: CompiledModel, arenas: dict, obs_arrays: dict,
            exclude_cid: Optional[ClassID] = None,
            exclude_slot=None) -> dict:
    """Recompute relational state.

    obs_arrays: {cid: {vid: (codes [N], state [N])}} device copies of the
    observation columns for observed classes.
    Returns rel: {cid: {'alive', 'refcount', 'total', 'nrows',
                        'prop': {vid: (code, count)}}}.
    """
    rel: dict = {}
    drefs = direct_references(cm)

    def live_mask(cid):
        alive = rel[cid]["alive"] if cid in rel else arenas[cid]["alive"]
        if exclude_cid == cid and exclude_slot is not None:
            alive = alive & (jnp.arange(alive.shape[0]) != exclude_slot)
        return alive

    for cid in reversed(cm.model.class_order):
        lay = cm.layouts[cid]
        C = lay.capacity
        if lay.observed:
            alive = arenas[cid]["alive"]
            rel[cid] = {"alive": alive,
                        "refcount": jnp.zeros((C,), jnp.int32),
                        "total": jnp.zeros((), jnp.int32),
                        "nrows": jnp.sum(alive.astype(jnp.int32)),
                        "prop": {}}
            continue
        refcount = jnp.zeros((C,), jnp.int32)
        for (src, fkv) in drefs[cid]:
            src_alive = live_mask(src)
            fk_col = arenas[src]["values"][fkv]
            refcount = refcount.at[fk_col].add(src_alive.astype(jnp.int32),
                                               mode="drop")
        alive = refcount > 0
        rel[cid] = {"alive": alive,
                    "refcount": refcount,
                    "total": jnp.sum(refcount),
                    "nrows": jnp.sum(alive.astype(jnp.int32)),
                    "prop": {}}

    # Propagated observations (multi-hop gathers, scatter into target class).
    for (src, ov, chain, (tc, tv)) in propagated_obs_specs(cm):
        codes, state = obs_arrays[src][ov]
        mask = live_mask(src) & (state == 1)
        slot = jnp.arange(cm.layouts[src].capacity)
        cur_cid = src
        target = None
        for (hop_cid, fkv) in chain:
            col = arenas[hop_cid]["values"][fkv]
            target = col[slot] if target is None else col[target]
            cur_cid = cm.node(hop_cid, fkv).target_class
        cnt = jnp.zeros((cm.layouts[tc].capacity,), jnp.int32)
        cnt = cnt.at[target].add(mask.astype(jnp.int32), mode="drop")
        code = jnp.zeros((cm.layouts[tc].capacity,), codes.dtype)
        code = code.at[target].max(jnp.where(mask, codes, codes.dtype.type(0)),
                                   mode="drop")
        prev = rel[tc]["prop"].get(tv)
        if prev is not None:
            code = jnp.maximum(code, prev[0])
            cnt = cnt + prev[1]
        rel[tc]["prop"][tv] = (code, cnt)
    return rel
