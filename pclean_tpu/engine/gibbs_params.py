"""Parameter + Pitman-Yor hyperparameter rejuvenation.

Counterpart of the reference's conjugate resample_value! implementations
(choose_proportionally.jl:70-74, maybe_swap.jl:87-89, add_noise.jl:74-82)
and resample_py_params! (trace.jl:80-108).

TPU-native design: sufficient statistics are *recomputed* from the arenas as
dense masked reductions right before each resample, instead of being
incrementally incorporated/unincorporated on every row move
(dependency_tracking.jl:6-21). This removes all suff-stat bookkeeping from
the hot row loop and makes batched/parallel row updates trivially
reconcilable; the counts used are identical because the reference's
incremental stats are themselves a pure function of the current trace.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..dists import params as P
from ..dists.core import MaybeSwap
from ..model.ir import (ChoiceNode, ClassID, ParameterNode, ParamLookupNode,
                        VertexID)
from .compile import CompiledModel
from .refresh import refresh


class _RowCtx:
    """Kernel ctx resolving all args via row_value over every slot."""

    def __init__(self, tracer, cls):
        self.t = tracer
        self.cls = cls
        self.slots = jnp.arange(tracer.cm.layouts[cls].capacity)

    def value(self, vid):
        return self.t.row_value(self.cls, vid, self.slots)

    def pstate(self, cid, vid):
        return self.t.params[cid][vid]


def _tracer(cm, arenas, rel, params, obs_dev):
    from .propose import BlockTracer

    return BlockTracer(cm, next(iter(cm.model.class_order)), arenas, rel,
                       params, obs_dev, {}, {}, jnp.zeros((), jnp.int32))


def recompute_and_resample(cm: CompiledModel, cid: ClassID, vid: VertexID,
                           arenas: dict, rel: dict, params: dict,
                           obs_dev: dict, key) -> dict:
    """Resample one parameter from its conjugate posterior, with sufficient
    statistics freshly reduced from the arenas."""
    meta = cm.param_meta[(cid, vid)]
    spec = meta["spec"]
    c = cm.cls(cid)
    lay = cm.layouts[cid]
    alive = arenas[cid]["alive"] if lay.observed else rel[cid]["alive"]
    state = params[cid][vid]
    tr = _tracer(cm, arenas, rel, params, obs_dev)

    if isinstance(spec, P.Proportions):
        # the unique choice node drawing from these proportions
        w = next(w for w, n in enumerate(c.nodes)
                 if isinstance(n, ChoiceNode) and n.arg_ids.get("probs") == vid)
        vals = arenas[cid]["values"][w]
        nopt = meta["num_options"]
        ok = alive & (vals >= 0) & (vals < nopt)
        counts = jnp.zeros((1, nopt), jnp.int32)
        counts = counts.at[0, vals].add(ok.astype(jnp.int32), mode="drop")
        state = {**state, "counts": counts}
        return P.resample_proportions(key, state, spec)

    if isinstance(spec, P.Prob):
        heads = jnp.zeros((meta["num_indices"],), jnp.int32)
        tails = jnp.zeros((meta["num_indices"],), jnp.int32)
        for w, n in enumerate(c.nodes):
            if not (isinstance(n, ChoiceNode) and isinstance(n.dist, MaybeSwap)):
                continue
            pv = n.arg_ids.get("prob")
            keyv = None
            gate = None
            if pv == vid:
                keyv = jnp.zeros_like(arenas[cid]["values"][w])
            elif pv is not None and isinstance(c.nodes[pv], ParamLookupNode) \
                    and c.nodes[pv].param_id == vid:
                pl = c.nodes[pv]
                slots = jnp.arange(lay.capacity)
                keyv = tr.row_value(cid, pl.key_id, slots)
                if pl.gate_id is not None:
                    truth = cm.truth_table(cid, pl.gate_id)
                    gate = truth[tr.row_value(cid, pl.gate_id, slots)]
            if keyv is None:
                continue
            slots = jnp.arange(lay.capacity)
            valv = tr.row_value(cid, n.arg_ids["val"], slots)
            oa = obs_dev.get(cid, {}).get(w)
            if oa is not None:
                codes, st = oa
                observed = st == 1
                obsv = codes
            else:
                observed = jnp.ones((lay.capacity,), bool)
                obsv = arenas[cid]["values"][w]
            # incorporate_choice!(MaybeSwap,...) skips missing observations
            # (maybe_swap.jl:66-75); gated sites bypass the parameter
            mask = alive & observed
            if gate is not None:
                mask = mask & (~gate)
            same = obsv == valv
            heads = heads.at[keyv].add((mask & ~same).astype(jnp.int32),
                                       mode="drop")
            tails = tails.at[keyv].add((mask & same).astype(jnp.int32),
                                       mode="drop")
        state = {**state, "heads": heads, "tails": tails}
        return P.resample_prob(key, state, spec)

    if isinstance(spec, P.Mean):
        sites = meta["sites"]
        I = meta["num_indices"]
        S = max(len(sites), 1)
        counts = jnp.zeros((I, S), jnp.int32)
        sums = jnp.zeros((I, S), jnp.float32)
        for si, (w, std) in enumerate(sites):
            n = c.nodes[w]
            kern = cm.kernels[cm.canon(cid, w)]
            ctx = _RowCtx(tr, cid)
            y = arenas[cid]["values"][w]
            z = kern.backward(ctx, y) if hasattr(kern, "backward") else y
            mv = n.arg_ids.get("mean")
            if mv == vid:
                keyv = jnp.zeros((lay.capacity,), jnp.int32)
            else:
                pl = c.nodes[mv]
                assert isinstance(pl, ParamLookupNode) and pl.param_id == vid
                keyv = tr.row_value(cid, pl.key_id, jnp.arange(lay.capacity))
            counts = counts.at[keyv, si].add(alive.astype(jnp.int32),
                                             mode="drop")
            sums = sums.at[keyv, si].add(
                jnp.where(alive, z.astype(jnp.float32), 0.0), mode="drop")
        state = {**state, "counts": counts, "sums": sums}
        return P.resample_mean(key, state, spec, [s for (_w, s) in sites] or [1.0])

    raise TypeError(type(spec))


def pitman_yor_score(strength, discount, sizes, alive):
    """Exchangeable-partition score (trace.jl:65-78), vectorized.

    The per-cluster inner sums close via lgamma:
      sum_{i=1}^{size-1} log(i - d)            = lgamma(size - d) - lgamma(1 - d)
      sum_{i=1}^{size-1} log(n_before + i + s) = lgamma(n_before + size + s)
                                               - lgamma(n_before + 1 + s)
    The EPPF is exchangeable, so any slot order gives the reference's value.
    """
    s, d = strength, discount
    sizes_f = jnp.where(alive, sizes.astype(jnp.float32), 0.0)
    n_before = jnp.cumsum(sizes_f) - sizes_f
    j = jnp.cumsum(alive.astype(jnp.float32))  # 1-based cluster index
    # the k-th cluster's creation: log(k*d + s) - log(n_before + s)
    # (trace.jl:69-70)
    term_new = jnp.log(jnp.maximum(j * d + s, 1e-30)) - jnp.log(n_before + s)
    inner = (gammaln(jnp.maximum(sizes_f - d, 1e-30)) - gammaln(1.0 - d)
             - (gammaln(n_before + sizes_f + s) - gammaln(n_before + 1.0 + s)))
    inner = jnp.where(sizes_f > 1, inner, 0.0)
    return jnp.sum(jnp.where(alive, term_new + inner, 0.0))


def resample_py(cm: CompiledModel, cid: ClassID, rel: dict, py_state: dict,
                key):
    """MH over (strength, discount) (trace.jl:80-108): strength proposed
    from Gamma(1,1) (an independence proposal whose density cancels against
    the implicit Gamma(1,1) prior), discount from Uniform(0,1)."""
    sizes = rel[cid]["refcount"]
    alive = rel[cid]["alive"] & (sizes > 0)
    s0 = py_state["strength"]
    d0 = py_state["discount"]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    old = pitman_yor_score(s0, d0, sizes, alive)
    s_prop = jax.random.gamma(k1, 1.0)
    new = pitman_yor_score(s_prop, d0, sizes, alive)
    # q and prior are both Gamma(1,1): alpha = new + logpdf(s0) - old
    #                                         - logpdf(s_prop)  (trace.jl:88-96)
    alpha = new + (-s0) - old - (-s_prop)
    acc = jnp.log(jax.random.uniform(k2)) < alpha
    s1 = jnp.where(acc, s_prop, s0)
    cur = jnp.where(acc, new, old)
    d_prop = jax.random.uniform(k3)
    new2 = pitman_yor_score(s1, d_prop, sizes, alive)
    acc2 = jnp.log(jax.random.uniform(k4)) < (new2 - cur)
    d1 = jnp.where(acc2, d_prop, d0)
    return {"strength": s1, "discount": d1}


def resample_all(cm: CompiledModel, arenas: dict, params: dict, obs_dev: dict,
                 key, rel=None):
    """Resample every learned parameter and the per-class Pitman-Yor
    hyperparameters (inference.jl:40-47).

    rel: pass the caller's carried relational state to skip the O(N) full
    refresh — at batch_rows >= rejuv_frequency the resample cond fires
    EVERY scan step, so this refresh was the last O(N)-per-step cost left
    in the batched drivers after the incremental deltas landed."""
    if rel is None:
        rel = refresh(cm, arenas, obs_dev)
    new_params = {c: dict(v) for c, v in params.items()}
    for (cid, vid) in cm.param_meta:
        key, sub = jax.random.split(key)
        new_params[cid][vid] = recompute_and_resample(
            cm, cid, vid, arenas, rel, new_params, obs_dev, sub)
    py = dict(new_params.get("__py__", {}))
    for cid in cm.model.class_order:
        if cm.layouts[cid].observed or cid not in py:
            continue
        key, sub = jax.random.split(key)
        py[cid] = resample_py(cm, cid, rel, py[cid], sub)
    if py:
        new_params["__py__"] = py
    return arenas, new_params
