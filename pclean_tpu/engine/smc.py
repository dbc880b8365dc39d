"""Inference driver: SMC initialization + MH/CSMC rejuvenation sweeps.

Counterpart of /root/reference/src/inference/{inference.jl,row_inference.jl}:

  * `Engine.initialize` streams dataset rows through per-row proposal steps
    (initialize_trace, inference.jl:3-57);
  * `Engine.sweep` is pgibbs_sweep! (inference.jl:60-81): every class in
    declaration order, every live row CSMC-rejuvenated with the
    Metropolis-within-Gibbs rule the bundled experiments use
    (use_mh_instead_of_pg, row_inference.jl:161-163);
  * parameter + Pitman-Yor hyperparameter rejuvenation interleaves at
    `rejuv_frequency` (inference.jl:40-47,71-77).

TPU-native design points: each (class-)row step is ONE jitted XLA program —
relational refresh, all block proposals (dense enumerations), MH accept, and
arena writes fused together; sufficient statistics are *recomputed* from the
arenas at resample time (see gibbs_params.py) instead of incrementally
tracked, so the apply step is just masked scatters.

The reference's MH mode runs 2 particles where particle 1 is retained and
particle 2 is a fresh proposal (infer_config.jl:11-13); initialization in MH
mode selects among 2 *fresh* particles by weight, which for the exact
block-Gibbs proposals used here is a uniform pick between identically
weighted particles — we therefore run one fresh particle at init. PG mode
with many vmapped particles is handled in parallel/particles.py.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model.ir import ClassID
from .compile import CompiledModel
from .propose import BlockTracer
from .refresh import refresh


@dataclass
class InferenceConfig:
    """reference infer_config.jl:1-16."""

    num_iters: int = 1
    num_particles: int = 2
    use_dd_proposals: bool = True
    use_mh_instead_of_pg: bool = True
    rejuv_frequency: int = 50
    reporting_frequency: int = 100


def _obs_device(cm: CompiledModel):
    out = {}
    for spec in cm.obs_specs:
        cols = {}
        for vid, (codes, state) in spec.columns.items():
            cols[vid] = (jnp.asarray(codes), jnp.asarray(state))
        out[spec.class_id] = cols
    return out


def apply_row(cm: CompiledModel, cid: ClassID, arenas: dict, slot, env2: dict,
              births, accept, mark_alive: bool) -> dict:
    """Write an accepted proposal into the arenas (masked scatters).

    Replaces incorporate_row! + refer_to_row! + suff-stat swaps
    (row_inference.jl:169-185); reference counts / liveness / propagated
    observations are *re-derived* by the next refresh() rather than tracked.
    """
    lay = cm.layouts[cid]
    vals = dict(arenas[cid]["values"])
    for vid, dt in lay.store.items():
        if vid not in env2:
            continue
        cur = vals[vid]
        new = jnp.asarray(env2[vid]).astype(cur.dtype)
        vals[vid] = cur.at[slot].set(jnp.where(accept, new, cur[slot]))
    alive = arenas[cid]["alive"]
    if mark_alive:
        alive = alive.at[slot].set(True)
    out = dict(arenas)
    out[cid] = {"values": vals, "alive": alive}
    # births: fresh latent rows, deepest classes were sampled before their
    # referrers read their slots, so list order is safe to apply directly
    for b in births:
        bvals = dict(out[b.target_class]["values"])
        ok = accept & b.is_new
        for tv, val in b.values.items():
            if tv not in bvals:
                continue
            cur = bvals[tv]
            nv = jnp.asarray(val).astype(cur.dtype)
            bvals[tv] = cur.at[b.slot].set(jnp.where(ok, nv, cur[b.slot]))
        out[b.target_class] = {"values": bvals,
                               "alive": out[b.target_class]["alive"]}
    return out


class Engine:
    def __init__(self, cm: CompiledModel, config: InferenceConfig):
        self.cm = cm
        self.config = config
        self.obs_dev = _obs_device(cm)
        self._init_step_fns: dict[ClassID, callable] = {}
        self._rejuv_step_fns: dict[ClassID, callable] = {}

    # ------------------------------------------------------------ row steps

    def _obs_row_slices(self, cid: ClassID, slot, rel):
        """This row's observations: dataset columns for observed classes,
        propagated (reference-implied) observations for latent ones
        (observation_counts, trace.jl:33-37)."""
        out = {}
        cols = self.obs_dev.get(cid)
        if cols is not None:
            for vid, (codes, state) in cols.items():
                out[vid] = (codes[slot], state[slot])
        for vid, (code, cnt) in rel[cid]["prop"].items():
            out[vid] = (code[slot], (cnt[slot] > 0).astype(jnp.int8))
        return out

    def _propose(self, cid, arenas, rel, params, slot, key, force_retained):
        cm = self.cm
        c = cm.cls(cid)
        obs_row = self._obs_row_slices(cid, slot, rel)
        env2: dict = {}
        births = []
        w = jnp.zeros((), jnp.float32)
        for plan in c.plans:
            key, sub = jax.random.split(key)
            tr = BlockTracer(cm, cid, arenas, rel, params, self.obs_dev,
                             obs_row, env2, slot, force_retained=force_retained)
            logZ, res = tr.run(plan, sub)
            env2 = res.env
            births.extend(res.births)
            w = w + logZ + res.weight
        return env2, births, w

    def init_step(self, cid: ClassID):
        """Jitted: incorporate one fresh observed row (SMC init)."""
        if cid in self._init_step_fns:
            return self._init_step_fns[cid]
        cm = self.cm

        @jax.jit
        def step(arenas, params, slot, key):
            rel = refresh(cm, arenas, self.obs_dev)
            env2, births, _w = self._propose(cid, arenas, rel, params, slot,
                                             key, force_retained=False)
            return apply_row(cm, cid, arenas, slot, env2, births,
                             accept=jnp.asarray(True), mark_alive=True)

        self._init_step_fns[cid] = step
        return step

    def rejuv_step(self, cid: ClassID):
        """Jitted: one CSMC/MH rejuvenation of a row (run_smc! on an existing
        key, row_inference.jl:108-187)."""
        if cid in self._rejuv_step_fns:
            return self._rejuv_step_fns[cid]
        cm = self.cm

        @jax.jit
        def step(arenas, params, slot, key):
            rel = refresh(cm, arenas, self.obs_dev, exclude_cid=cid,
                          exclude_slot=slot)
            kp, kr, ka = jax.random.split(key, 3)
            env_p, births_p, w_p = self._propose(cid, arenas, rel, params,
                                                 slot, kp, force_retained=False)
            _envr, _birr, w_r = self._propose(cid, arenas, rel, params,
                                              slot, kr, force_retained=True)
            # MH rule (row_inference.jl:161-163): accept fresh over retained
            # w.p. min(1, w2/w1)
            alive = arenas[cid]["alive"][slot] if cm.layouts[cid].observed \
                else rel[cid]["alive"][slot]
            accept = (jnp.log(jax.random.uniform(ka)) < (w_p - w_r)) & alive
            return apply_row(cm, cid, arenas, slot, env_p, births_p,
                             accept=accept, mark_alive=False)

        self._rejuv_step_fns[cid] = step
        return step

    # -------------------------------------------------------------- drivers

    def initialize(self, key, arenas, params, progress: Optional[int] = None):
        """initialize_trace (inference.jl:3-57): stream rows, interleave
        parameter rejuvenation."""
        from .gibbs_params import resample_all

        cfg = self.config
        for spec in self.cm.obs_specs:
            cid = spec.class_id
            step = self.init_step(cid)
            for i in range(spec.num_rows):
                key, sub = jax.random.split(key)
                arenas = step(arenas, params, jnp.asarray(i), sub)
                if (i + 1) % cfg.rejuv_frequency == 0:
                    key, sub = jax.random.split(key)
                    arenas, params = resample_all(self.cm, arenas, params,
                                                  self.obs_dev, sub)
                if progress and (i + 1) % progress == 0:
                    print(f"Initializing row {i + 1} of {spec.num_rows} for {cid}...")
        return arenas, params, key

    def sweep(self, key, arenas, params, progress: Optional[int] = None):
        """pgibbs_sweep! (inference.jl:60-81): every class in declaration
        order, every row slot (dead slots no-op via the accept mask)."""
        from .gibbs_params import resample_all

        cfg = self.config
        for cid in self.cm.model.class_order:
            step = self.rejuv_step(cid)
            lay = self.cm.layouts[cid]
            if lay.observed:
                slots = list(range(lay.capacity))
            else:
                # visit only live slots (reference iterates keys(table.rows),
                # inference.jl:66); snapshot at sweep start — rows born
                # mid-sweep are picked up next sweep, rows dying mid-sweep
                # no-op through the accept mask
                rel = refresh(self.cm, arenas, self.obs_dev)
                alive = np.asarray(rel[cid]["alive"])
                slots = [int(s) for s in np.flatnonzero(alive)]
            for i, s in enumerate(slots):
                key, sub = jax.random.split(key)
                arenas = step(arenas, params, jnp.asarray(s), sub)
                if (i + 1) % cfg.rejuv_frequency == 0:
                    key, sub = jax.random.split(key)
                    arenas, params = resample_all(self.cm, arenas, params,
                                                  self.obs_dev, sub)
                if progress and (i + 1) % progress == 0:
                    print(f"{cid}: cleaning row {i + 1} of {len(slots)}")
        return arenas, params, key

    def run(self, key, arenas, params, progress: Optional[int] = None):
        """run_inference! (inference.jl:83-88)."""
        for it in range(self.config.num_iters):
            if progress:
                print(f"Iteration {it + 1}/{self.config.num_iters}")
            arenas, params, key = self.sweep(key, arenas, params, progress)
        return arenas, params, key
