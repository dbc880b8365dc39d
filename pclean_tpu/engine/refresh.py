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


def _fk_delta(cm: CompiledModel, rel: dict, arenas: dict, cid: ClassID,
              slot, sign: int, m, dense: bool = False) -> None:
    """In-place (on the already-copied rel dict): ± row `slot`-of-class-
    `cid`'s foreign-key reference counts, cascading aliveness flips down the
    fk chain (the reference's recursive birth/GC,
    dependency_tracking.jl:184-236). `m` gates on the row contributing at
    all (its own liveness).

    dense=True replaces every single-index scatter with its elementwise
    one-hot form (`arange == t`). Semantically identical (out-of-range `t`
    matches no position, like mode="drop"), but under a per-row vmap the
    scatter form is poison: each `.at[t].add` materialises a full [B, cap]
    copy of the broadcast operand and is a fusion barrier, so a chain of
    chained deltas writes dozens of [B, cap] buffers to HBM per scan step
    (measured 6x sweep slowdown on hospital-100k B=64). The elementwise
    form fuses into the downstream block-enumeration consumers and never
    materialises the corrected arrays."""

    def bump(tc, t, dd):
        # dd: scalar int32 in {-1, 0, +1}
        r = rel[tc]
        cap = cm.layouts[tc].capacity
        inb = (t >= 0) & (t < cap)
        dd = jnp.where(inb, dd, 0)
        if dense:
            hit = jnp.arange(cap) == t  # False everywhere when t OOB
            rc_t = r["refcount"][t] + dd  # gather clamps; dd==0 when OOB
            rc = r["refcount"] + dd * hit.astype(jnp.int32)
            was = r["alive"][t]
            now = rc_t > 0
            alive = jnp.where(hit, now, r["alive"])
        else:
            rc = r["refcount"].at[t].add(dd, mode="drop")
            was = r["alive"][t]
            now = rc[t] > 0
            alive = r["alive"].at[t].set(now, mode="drop")
        rel[tc] = {**r,
                   "refcount": rc,
                   "alive": alive,
                   "total": r["total"] + dd,
                   "nrows": r["nrows"] + (now.astype(jnp.int32)
                                          - was.astype(jnp.int32))}
        flip = now.astype(jnp.int32) - was.astype(jnp.int32)
        for fkv2 in cm.layouts[tc].fk_vertices:
            t2 = arenas[tc]["values"][fkv2][t]
            bump(cm.node(tc, fkv2).target_class, t2, flip)

    d0 = jnp.asarray(sign, jnp.int32) * m.astype(jnp.int32)
    for fkv in cm.layouts[cid].fk_vertices:
        t = arenas[cid]["values"][fkv][slot]
        bump(cm.node(cid, fkv).target_class, t, d0)


def latent_row_delta(cm: CompiledModel, rel: dict, arenas: dict,
                     cid: ClassID, slot, sign: int,
                     dense: bool = False) -> dict:
    """rel ± latent row `slot`'s outgoing REFERENCE-COUNT contributions.

    Mirrors refresh's exclude semantics for a latent class exactly: the
    exclusion mask only removes the row from its targets' reference counts
    (live_mask gates refcount scatters); propagated observations are
    sourced from observed classes only and are untouched (their chained
    gathers pass through latent rows regardless of the row's own state).
    Complemented by hop_move for fk rewrites, which shifts the propagated
    observations of the row's whole referrer group."""
    assert not cm.layouts[cid].observed
    rel = {c: {**v, "prop": dict(v["prop"])} for c, v in rel.items()}
    slot = jnp.asarray(slot)
    cap0 = cm.layouts[cid].capacity
    m = rel[cid]["alive"][slot] & (slot >= 0) & (slot < cap0)
    _fk_delta(cm, rel, arenas, cid, slot, sign, m, dense=dense)
    return rel


def hop_histograms(cm: CompiledModel, cid: ClassID, arenas: dict,
                   obs_arrays: dict):
    """Per propagated-obs chain hop leaving latent class `cid`: the
    ([cap_cid] count, [cap_cid] code) histogram of observed-source rows
    whose chain prefix lands on each cid row. Loop-invariant during cid's
    own sweep (prefix hops ride referrer classes' fk columns, which that
    sweep never touches), so one scatter per segment replaces per-row
    O(referrers) work. Returns
    [((fk_vid, suffix_chain, (tc, tv)), (gcnt, gcode)), ...]."""
    out = []
    cap = cm.layouts[cid].capacity
    for (src, ov, chain, (tc, tv)) in propagated_obs_specs(cm):
        for k, (hop_cid, fkv) in enumerate(chain):
            if hop_cid != cid:
                continue
            codes, state = obs_arrays[src][ov]
            codes = cm.interned.use(codes)
            mask = arenas[src]["alive"] & (cm.interned.use(state) == 1)
            t = jnp.arange(cm.layouts[src].capacity)
            for (hc, fv) in chain[:k]:
                t = arenas[hc]["values"][fv][t]
            gcnt = jnp.zeros((cap,), jnp.int32).at[t].add(
                mask.astype(jnp.int32), mode="drop")
            gcode = jnp.zeros((cap,), codes.dtype).at[t].max(
                jnp.where(mask, codes, codes.dtype.type(0)), mode="drop")
            out.append(((fkv, chain[k + 1:], (tc, tv)), (gcnt, gcode)))
    return out


def hop_move(cm: CompiledModel, rel: dict, arenas: dict, cid: ClassID,
             slot, old_fks: dict, hop_hists) -> dict:
    """After latent row `slot`'s fk columns were (possibly) rewritten:
    move its whole referrer group's propagated observations from the old
    chain targets to the new ones, using per-segment hop_histograms.
    `old_fks` holds the pre-rewrite fk values; unchanged fks cancel
    exactly. Code removal relies on the same observed-equality agreement
    invariant as row_delta."""
    if not hop_hists:
        return rel
    rel = {c: {**v, "prop": dict(v["prop"])} for c, v in rel.items()}
    slot = jnp.asarray(slot)
    for (fkv, suffix, (tc, tv)), (gcnt, gcode) in hop_hists:
        g = gcnt[slot]
        gc = gcode[slot]
        of = old_fks[fkv]
        nf = arenas[cid]["values"][fkv][slot]
        for (hc, fv) in suffix:
            of = arenas[hc]["values"][fv][of]
            nf = arenas[hc]["values"][fv][nf]
        code, cnt = rel[tc]["prop"][tv]
        cnt = cnt.at[of].add(-g, mode="drop")
        code = code.at[of].set(
            jnp.where(cnt[of] > 0, code[of], code.dtype.type(0)),
            mode="drop")
        cnt = cnt.at[nf].add(g, mode="drop")
        code = code.at[nf].max(jnp.where(g > 0, gc, code.dtype.type(0)),
                               mode="drop")
        rel[tc]["prop"][tv] = (code, cnt)
    return rel


def row_delta(cm: CompiledModel, rel: dict, arenas: dict, obs_arrays: dict,
              cid: ClassID, slot, sign: int, dense: bool = False) -> dict:
    """rel ± one observed-class row's outgoing relational contributions.

    The incremental twin of `refresh`: where refresh recomputes every
    reference count / liveness flag / propagated observation as an O(N)
    dense reduction, this applies the exact point deltas of adding
    (sign=+1) or removing (sign=-1) row `slot` of observed class `cid` —
    the functional equivalent of the reference's incorporate_row! /
    unincorporate_row! (dependency_tracking.jl:26-41,71-84, refer_to_row!
    :205-236, unrefer_to_row! :162-202 incl. transitive GC) in
    O(fk-chain-depth) scalar scatter/gathers. Invariant (tested in
    tests/test_incremental.py): starting from rel == refresh(arenas),
    row_delta(-1) == refresh(arenas, exclude_cid=cid, exclude_slot=slot),
    and after any rewrite of row `slot`'s columns, row_delta(+1) on the
    new arenas == refresh(new arenas).

    Propagated-observation codes on removal rely on the observed-equality
    agreement invariant (co-referrers of a live target observe the same
    propagated code — mismatches score -inf and are unreachable under
    sequential exact sweeps): the remaining code equals the removed one, so
    only an emptied target's code is reset. Segment-boundary recomputes
    bound any drift from states a frozen-snapshot batched pass created.
    """
    assert cm.layouts[cid].observed
    rel = {c: {**v, "prop": dict(v["prop"])} for c, v in rel.items()}
    slot = jnp.asarray(slot)
    cap0 = cm.layouts[cid].capacity
    # out-of-range slots are a no-op (refresh's arange != slot matches
    # nothing); without the gate the gather would clamp to the last row
    m = arenas[cid]["alive"][slot] & (slot >= 0) & (slot < cap0)
    _fk_delta(cm, rel, arenas, cid, slot, sign, m, dense=dense)

    for (src, ov, chain, (tc, tv)) in propagated_obs_specs(cm):
        if src != cid:
            continue
        codes, state = obs_arrays[cid][ov]
        sm = m & (cm.interned.use(state)[slot] == 1)
        t = slot
        for (hop_cid, fkv) in chain:
            t = arenas[hop_cid]["values"][fkv][t]
        code, cnt = rel[tc]["prop"][tv]
        dd = jnp.asarray(sign, jnp.int32) * sm.astype(jnp.int32)
        cval = cm.interned.use(codes)[slot].astype(code.dtype)
        if dense:
            cap_t = cm.layouts[tc].capacity
            inb = (t >= 0) & (t < cap_t)
            dd = jnp.where(inb, dd, 0)
            hit = jnp.arange(cap_t) == t
            cnt2 = cnt + dd * hit.astype(jnp.int32)
            cnt2_t = cnt[t] + dd
            if sign > 0:
                code2 = jnp.where(
                    hit, jnp.maximum(code, jnp.where(sm, cval,
                                                     code.dtype.type(0))),
                    code)
            else:
                code2 = jnp.where(
                    hit & jnp.logical_not(cnt2_t > 0), code.dtype.type(0),
                    code)
        else:
            cnt2 = cnt.at[t].add(dd, mode="drop")
            if sign > 0:
                code2 = code.at[t].max(
                    jnp.where(sm, cval, code.dtype.type(0)), mode="drop")
            else:
                code2 = code.at[t].set(
                    jnp.where(cnt2[t] > 0, code[t], code.dtype.type(0)),
                    mode="drop")
        rel[tc]["prop"][tv] = (code2, cnt2)
    return rel


def _cascade(cm: CompiledModel, rel: dict, arenas: dict, pend: dict) -> None:
    """Apply pending refcount deltas per latent class and cascade the
    aliveness flips down the fk graph (in place on the copied rel).

    `pend` maps latent class -> [cap] int32 refcount delta. Classes are
    processed in reverse declaration order: a class's fk targets are always
    earlier-declared, so every delta a class receives (direct or via a
    referrer's aliveness flip) is accumulated before that class is visited
    — the batched twin of _fk_delta's recursion."""
    for tc in reversed(cm.model.class_order):
        d = pend.get(tc)
        if d is None or cm.layouts[tc].observed:
            continue  # refresh keeps observed-class refcounts at zero
        r = rel[tc]
        rc = r["refcount"] + d
        alive = rc > 0
        flip = alive.astype(jnp.int32) - r["alive"].astype(jnp.int32)
        rel[tc] = {**r,
                   "refcount": rc,
                   "alive": alive,
                   "total": r["total"] + jnp.sum(d),
                   "nrows": r["nrows"] + jnp.sum(flip)}
        for fkv2 in cm.layouts[tc].fk_vertices:
            tc2 = cm.node(tc, fkv2).target_class
            t2 = arenas[tc]["values"][fkv2]
            d2 = jnp.zeros((cm.layouts[tc2].capacity,), jnp.int32) \
                .at[t2].add(flip, mode="drop")
            pend[tc2] = pend.get(
                tc2, jnp.zeros((cm.layouts[tc2].capacity,), jnp.int32)) + d2


def batch_obs_delta(cm: CompiledModel, rel: dict, old_arenas: dict,
                    arenas: dict, obs_arrays: dict, cid: ClassID,
                    slots) -> dict:
    """rel updated for the rewrite of observed-class rows `slots` from
    `old_arenas` to `arenas` (no other arena entries may differ) — the
    BATCHED twin of row_delta(-1 on old)+row_delta(+1 on new), O(B + caps)
    per scan step instead of the O(N) full refresh the batched drivers paid
    per step (dominant at 100k+ rows; VERDICT r4 profile).

    Works uniformly for sweeps (rows rewritten in place) and init (rows
    newly marked alive): per-row contribution weights are the old/new
    aliveness, so an unchanged row cancels exactly and a fresh row purely
    adds. Exact for refcounts/aliveness/counts (integer adds); propagated
    codes rely on the same observed-equality agreement invariant as
    row_delta (cnt == 0 <=> code == 0; co-observers of a live target agree),
    with any batched-transient drift bounded by the segment-entry refresh.
    Equivalence with refresh: tests/test_incremental.py.
    """
    assert cm.layouts[cid].observed
    rel = {c: {**v, "prop": dict(v["prop"])} for c, v in rel.items()}
    slots = jnp.asarray(slots)
    w_old = old_arenas[cid]["alive"][slots]
    w_new = arenas[cid]["alive"][slots]
    pend: dict = {}
    for fkv in cm.layouts[cid].fk_vertices:
        tc = cm.node(cid, fkv).target_class
        cap_tc = cm.layouts[tc].capacity
        t_old = old_arenas[cid]["values"][fkv][slots]
        t_new = arenas[cid]["values"][fkv][slots]
        d = jnp.zeros((cap_tc,), jnp.int32) \
            .at[t_new].add(w_new.astype(jnp.int32), mode="drop") \
            .at[t_old].add(-w_old.astype(jnp.int32), mode="drop")
        pend[tc] = pend.get(tc, jnp.zeros((cap_tc,), jnp.int32)) + d
    _cascade(cm, rel, arenas, pend)

    for (src, ov, chain, (tc, tv)) in propagated_obs_specs(cm):
        if src != cid:
            continue
        codes, state = obs_arrays[cid][ov]
        st = cm.interned.use(state)[slots] == 1
        sm_old = (w_old & st).astype(jnp.int32)
        sm_new = (w_new & st).astype(jnp.int32)
        t_old, t_new = slots, slots
        for (hop_cid, fkv) in chain:
            src_o = old_arenas if hop_cid == cid else arenas
            t_old = src_o[hop_cid]["values"][fkv][t_old]
            t_new = arenas[hop_cid]["values"][fkv][t_new]
        code, cnt = rel[tc]["prop"][tv]
        cval = cm.interned.use(codes)[slots].astype(code.dtype)
        cnt1 = cnt.at[t_old].add(-sm_old, mode="drop")
        # agreement invariant: cnt == 0 <=> code == 0, so the global reset
        # only touches targets this batch emptied (refresh/row_delta keep
        # the invariant everywhere else)
        code1 = jnp.where(cnt1 > 0, code, code.dtype.type(0))
        cnt2 = cnt1.at[t_new].add(sm_new, mode="drop")
        code2 = code1.at[t_new].max(
            jnp.where(sm_new > 0, cval, code.dtype.type(0)), mode="drop")
        rel[tc]["prop"][tv] = (code2, cnt2)
    return rel


def batch_latent_delta(cm: CompiledModel, rel: dict, old_arenas: dict,
                       arenas: dict, cid: ClassID, slots, hop_hists) -> dict:
    """Batched twin of latent_row_delta + hop_move for a batch of latent-
    class rows whose fk columns were (possibly) rewritten: reference-count
    deltas with cascaded aliveness flips, plus the referrer groups'
    propagated observations moved from old to new chain targets via the
    per-segment hop_histograms. Same agreement-invariant caveat as
    batch_obs_delta."""
    assert not cm.layouts[cid].observed
    rel = {c: {**v, "prop": dict(v["prop"])} for c, v in rel.items()}
    slots = jnp.asarray(slots)
    # a latent row's own rewrite never changes its own aliveness (driven by
    # referrers), so old/new weight are both its current liveness
    w = rel[cid]["alive"][slots].astype(jnp.int32)
    pend: dict = {}
    for fkv in cm.layouts[cid].fk_vertices:
        tc = cm.node(cid, fkv).target_class
        cap_tc = cm.layouts[tc].capacity
        t_old = old_arenas[cid]["values"][fkv][slots]
        t_new = arenas[cid]["values"][fkv][slots]
        d = jnp.zeros((cap_tc,), jnp.int32) \
            .at[t_new].add(w, mode="drop") \
            .at[t_old].add(-w, mode="drop")
        pend[tc] = pend.get(tc, jnp.zeros((cap_tc,), jnp.int32)) + d
    _cascade(cm, rel, arenas, pend)

    for (fkv, suffix, (tc, tv)), (gcnt, gcode) in hop_hists:
        g = gcnt[slots]
        gc = gcode[slots]
        of = old_arenas[cid]["values"][fkv][slots]
        nf = arenas[cid]["values"][fkv][slots]
        for (hc, fv) in suffix:
            of = arenas[hc]["values"][fv][of]
            nf = arenas[hc]["values"][fv][nf]
        code, cnt = rel[tc]["prop"][tv]
        cnt1 = cnt.at[of].add(-g, mode="drop")
        code1 = jnp.where(cnt1 > 0, code, code.dtype.type(0))
        cnt2 = cnt1.at[nf].add(g, mode="drop")
        code2 = code1.at[nf].max(
            jnp.where(g > 0, gc, code.dtype.type(0)), mode="drop")
        rel[tc]["prop"][tv] = (code2, cnt2)
    return rel


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
        codes = cm.interned.use(codes)
        mask = live_mask(src) & (cm.interned.use(state) == 1)
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
