"""Multi-device sharding: rows over a data axis, particles over ICI.

The reference is strictly single-threaded (SURVEY.md §2: no DP/TP/PP, no
communication backend of any kind — src/inference/inference.jl:60-81 is one
Julia thread). This module is the *new* TPU-native parallel subsystem:

  * rows shard over a `data` mesh axis (blocked/SAME Gibbs over a frozen
    snapshot, like the single-device batch path in engine/smc.py) — arena
    updates are delta-reconciled with `psum` since each row's slots are
    owned by exactly one shard;
  * SMC particles shard over a `particle` mesh axis; the one genuinely
    communicating step of SMC — resampling/selection — uses all-gathered
    particle weights and a shared categorical draw (the standard parallel
    particle-filter scheme; PAPERS.md "Parallel resampling in the particle
    filter");
  * everything lowers to XLA collectives over ICI/DCN via shard_map — no
    custom communication backend.

On a single host these run over `xla_force_host_platform_device_count`
virtual devices; the same program scales to real multi-chip meshes.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..model.ir import ClassID
from ..engine.compile import CompiledModel
from ..engine.refresh import refresh


def make_mesh(n_data: int, n_particle: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_particle
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.array(devices[:n]).reshape(n_data, n_particle)
    return Mesh(arr, ("data", "particle"))



def _with_interned(cm, fn):
    """Bind the interned-constant tuple (trailing arg) around a shard_map
    local body, so large host arrays ride in as replicated ARGUMENTS
    instead of embedded literals (see engine/interned.py)."""
    def call(*args):
        *real, leaves = args
        with cm.interned.bind(leaves):
            return fn(*real)
    return call

def _scatter_apply(cm: CompiledModel, cid: ClassID, arenas: dict, slots,
                   env2: dict, ok, mark_alive: bool, axis: str) -> dict:
    """Replicated-arena update from sharded per-row results: every shard
    scatters the accepted NEW values for the rows it owns into a zeroed
    buffer, a psum over the data axis reconciles (slot ownership is disjoint
    so each slot receives exactly one non-zero contribution — adding zeros
    is exact in floating point, unlike the delta form cur + (new - cur)),
    and an ownership mask selects between the summed values and the old
    arena. Bitwise identical to the single-device _apply_batch given
    identical per-row results."""
    lay = cm.layouts[cid]
    own_local = jnp.zeros(arenas[cid]["alive"].shape, jnp.int32) \
        .at[slots].set(ok.astype(jnp.int32), mode="drop")
    owned = jax.lax.psum(own_local, axis) > 0
    vals = dict(arenas[cid]["values"])
    for vid in lay.store:
        if vid not in env2:
            continue
        cur = vals[vid]
        new = jnp.asarray(env2[vid]).astype(cur.dtype)
        contrib = jnp.zeros_like(cur).at[slots].set(
            jnp.where(ok, new, jnp.zeros_like(new)), mode="drop")
        vals[vid] = jnp.where(owned, jax.lax.psum(contrib, axis), cur)
    alive = arenas[cid]["alive"]
    if mark_alive:
        alive = alive | owned
    out = dict(arenas)
    out[cid] = {"values": vals, "alive": alive}
    return out


class ShardedEngine:
    """Sharded counterparts of Engine's batch steps.

    Wraps an engine.smc.Engine; arenas/params stay replicated, row batches
    shard over `data`, and (for PG-style proposal selection) particles shard
    over `particle`.
    """

    def __init__(self, engine, mesh: Mesh):
        self.eng = engine
        self.cm = engine.cm
        self.mesh = mesh
        self._fns = {}
        self._it_rep = None

    def _interned_rep(self):
        """Interned-constant tuple replicated over the mesh (one upload)."""
        if self._it_rep is None:
            rep = NamedSharding(self.mesh, P())
            self._it_rep = jax.device_put(
                self.cm.interned.device_leaves(), rep)
        return self._it_rep

    def _place(self, arenas, params, sharded):
        """Replicate state over the mesh, shard the per-row inputs; no-op
        when already placed correctly."""
        rep = NamedSharding(self.mesh, P())
        arenas = jax.device_put(arenas, rep)
        params = jax.device_put(params, rep)
        out = [jax.device_put(x, NamedSharding(self.mesh, spec))
               for (x, spec) in sharded]
        return (arenas, params, *out)

    # -- data-parallel MH rejuvenation --------------------------------------

    def sharded_rejuv_step(self, cid: ClassID):
        """B rows MH-rejuvenated in parallel across the data axis.

        slots/keys: [B] with B divisible by mesh 'data' size; returns
        (arenas, birthy[B]) like Engine.batch_rejuv_step.
        """
        key = ("rejuv", cid)
        if key in self._fns:
            return self._fns[key]
        eng = self.eng
        cm = self.cm

        from ..engine.smc import mh_row_step

        def local(arenas, params, slots, keys):
            rel = refresh(cm, arenas, eng.obs_dev)
            env2, accept, birthy = jax.vmap(
                lambda s, k: mh_row_step(eng, cid, arenas, rel, params, s, k,
                                         jnp.asarray(True)))(slots, keys)
            arenas = _scatter_apply(cm, cid, arenas, slots, env2, accept,
                                    mark_alive=False, axis="data")
            return arenas, birthy

        smapped = jax.jit(jax.shard_map(
            _with_interned(cm, local), mesh=self.mesh,
            in_specs=(P(), P(), P("data"), P("data"), P()),
            out_specs=(P(), P("data"))))

        def wrapped(arenas, params, slots, keys):
            arenas, params, slots, keys = self._place(
                arenas, params, ((slots, P("data")), (keys, P("data"))))
            return smapped(arenas, params, slots, keys,
                           self._interned_rep())

        self._fns[key] = wrapped
        return wrapped

    # -- fused scan drivers (row-sharded counterparts of Engine.scan_*) -----

    def scan_init_batched(self, cid: ClassID, num_rows: int, B: int,
                          kc=None):
        """Row-sharded twin of Engine.scan_init_batched: one scanned XLA
        program over row batches, each batch split across the mesh 'data'
        axis (B = n_data * B_local rows per step), arenas replicated and
        psum-scatter-reconciled after every batch. Key derivation and
        per-row math are shared with the single-device path (init_row_step),
        so results are identical given identical keys.

        Dispatched in segments of `seg_b` batches with a `base` batch
        offset — the same contract as the single-device program, so the
        driver's segment loop (key stream and per-segment birth replay) is
        shared verbatim between the two.

        Returns (run(arenas, params, base, keys[seg_b*B, 2]) -> (arenas,
        params, flags[seg_b*B]), nb, seg_b)."""
        seg_b = max(1, min(self.eng.config.batch_segment_rows, num_rows) // B)
        nb = (num_rows + B - 1) // B
        seg_b = min(seg_b, nb)
        kct = tuple(sorted((kc or {}).items()))
        key = ("scan_init_b", cid, B, num_rows, seg_b, kct)
        if key in self._fns:
            return self._fns[key]
        eng = self.eng
        cm = self.cm
        nd = self.mesh.shape["data"]
        assert B % nd == 0, "batch_rows must divide over the data axis"
        Bl = B // nd
        R = max(1, eng.config.rejuv_frequency // B)
        from ..engine.gibbs_params import resample_all
        from ..engine.smc import init_row_step

        from ..engine.propose import build_cand
        from ..engine.refresh import batch_obs_delta

        incr = eng.config.incremental_refresh

        def local(arenas, params, base, keys):  # all replicated in-shard
            me = jax.lax.axis_index("data")
            relc = refresh(cm, arenas, eng.obs_dev)
            # identical deterministic candidate lists on every shard
            # (stable argsort over the replicated snapshot), so per-row
            # results stay bitwise equal to the single-device program
            cand = build_cand(cm, relc, kc) if kc else None

            def body(carry, i):
                arenas, params, rel = carry
                bi = base + i
                ls = bi * B + me * Bl + jnp.arange(Bl)
                bkeys = keys[i * B + me * Bl + jnp.arange(Bl)]
                if not incr:
                    rel = refresh(cm, arenas, eng.obs_dev)
                env2, ok, birthy = jax.vmap(
                    lambda s, k: init_row_step(eng, cid, arenas, rel, params,
                                               s, k, s < num_rows,
                                               cand=cand))(ls, bkeys)
                old = arenas
                arenas = _scatter_apply(cm, cid, arenas, ls, env2, ok,
                                        mark_alive=True, axis="data")
                if incr:
                    # delta over the FULL batch from the reconciled
                    # (replicated) arenas: identical on every shard, so the
                    # carried rel stays replicated and bitwise equal to the
                    # single-device program's (integer histograms)
                    slots_full = bi * B + jnp.arange(B)
                    rel = batch_obs_delta(cm, rel, old, arenas, eng.obs_dev,
                                          cid, slots_full)
                kq = jax.random.fold_in(keys[i * B], 7)
                do = ((bi + 1) % R) == 0
                arenas, params = jax.lax.cond(
                    do,
                    lambda c: resample_all(cm, c[0], c[1], eng.obs_dev, kq,
                                           rel=rel if incr else None),
                    lambda c: c,
                    (arenas, params))
                return (arenas, params, rel), birthy

            (arenas, params, _), flags = jax.lax.scan(
                body, (arenas, params, relc), jnp.arange(seg_b))
            return arenas, params, flags  # [seg_b, Bl] per shard

        smapped = jax.jit(jax.shard_map(
            _with_interned(cm, local), mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P(None, "data"))))

        def wrapped(arenas, params, base, keys):
            arenas, params, keys = self._place(arenas, params,
                                               ((keys, P()),))
            arenas, params, flags = smapped(arenas, params, base, keys,
                                            self._interned_rep())
            return arenas, params, flags.reshape(-1)

        self._fns[key] = (wrapped, nb, seg_b)
        return wrapped, nb, seg_b

    def scan_sweep_all_batched(self, B: int):
        """Row-sharded twin of Engine.scan_sweep_all_batched: every class's
        batched rejuvenation sweep fused into one shard_mapped program; each
        B-row batch splits across the 'data' axis, proposals run locally
        against the replicated carry, and psum-scatter reconciliation plus a
        shared parameter-rejuvenation key keep every shard's arenas bitwise
        identical to the single-device batched sweep given identical keys
        (tests/test_sharded_equiv.py).

        Returns (run(arenas, params, keys[total, 2]) -> (arenas, params,
        flags{cid: [cap_padded]}), total, caps)."""
        key = ("scan_sweep_all_b", B)
        if key in self._fns:
            return self._fns[key]
        eng = self.eng
        cm = self.cm
        nd = self.mesh.shape["data"]
        assert B % nd == 0, "batch_rows must divide over the data axis"
        Bl = B // nd
        R = max(1, eng.config.rejuv_frequency // B)
        from ..engine.gibbs_params import resample_all
        from ..engine.smc import mh_row_step

        caps = {cid: ((cm.layouts[cid].capacity + B - 1) // B) * B
                for cid in cm.model.class_order}
        total = sum(caps.values())

        from ..engine.refresh import (batch_latent_delta, batch_obs_delta,
                                      hop_histograms)

        def class_pass(cid, arenas, params, keys_c, me):
            nb = caps[cid] // B
            cap = cm.layouts[cid].capacity
            leaf = eng._leaf_latent(cid)
            observed = cm.layouts[cid].observed
            incr = eng.config.incremental_refresh and not leaf
            relc = refresh(cm, arenas, eng.obs_dev)
            hops = hop_histograms(cm, cid, arenas, eng.obs_dev) \
                if (incr and not observed) else []

            def body(carry, bi):
                arenas, params, rel = carry
                ls = bi * B + me * Bl + jnp.arange(Bl)
                bkeys = keys_c[ls]
                if not (leaf or incr):
                    rel = refresh(cm, arenas, eng.obs_dev)
                env2, accept, birthy = jax.vmap(
                    lambda s, k: mh_row_step(eng, cid, arenas, rel, params,
                                             s, k, s < cap))(ls, bkeys)
                old = arenas
                arenas = _scatter_apply(cm, cid, arenas, ls, env2, accept,
                                        mark_alive=False, axis="data")
                if incr:
                    # full-batch delta from the reconciled replicated arenas:
                    # identical on every shard (integer histograms), so rel
                    # stays replicated and bitwise equal to the
                    # single-device class_pass
                    slots_full = bi * B + jnp.arange(B)
                    rel = batch_obs_delta(cm, rel, old, arenas, eng.obs_dev,
                                          cid, slots_full) if observed else \
                        batch_latent_delta(cm, rel, old, arenas, cid,
                                           slots_full, hops)
                kq = jax.random.fold_in(keys_c[bi * B], 7)
                do = ((bi + 1) % R) == 0
                arenas, params = jax.lax.cond(
                    do,
                    lambda c: resample_all(cm, c[0], c[1], eng.obs_dev, kq,
                                           rel=rel if (incr or leaf)
                                           else None),
                    lambda c: c,
                    (arenas, params))
                return (arenas, params, rel), birthy

            (arenas, params, _), flags = jax.lax.scan(
                body, (arenas, params, relc), jnp.arange(nb))
            return arenas, params, flags  # [nb, Bl]

        def local(arenas, params, keys):
            me = jax.lax.axis_index("data")
            off = 0
            flags = {}
            for cid in cm.model.class_order:
                arenas, params, fl = class_pass(
                    cid, arenas, params, keys[off:off + caps[cid]], me)
                flags[cid] = fl
                off += caps[cid]
            return arenas, params, flags

        smapped = jax.jit(jax.shard_map(
            _with_interned(cm, local), mesh=self.mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P(), P(None, "data"))))

        def wrapped(arenas, params, keys):
            arenas, params, keys = self._place(arenas, params,
                                               ((keys, P()),))
            arenas, params, flags = smapped(arenas, params, keys,
                                            self._interned_rep())
            return arenas, params, {c: f.reshape(-1) for c, f in flags.items()}

        self._fns[key] = (wrapped, total, caps)
        return wrapped, total, caps

    # -- data x particle parallel SMC initialization ------------------------

    def sharded_pg_init_step(self, cid: ClassID, n_particles_per_dev: int = 1):
        """B fresh rows, each proposed by (particle axis x per-device
        particles) independent SMC particles; the winner is selected from
        all-gathered weights with a shared draw — the cross-device
        resampling step (SURVEY.md §5 'distributed communication backend').

        Returns (arenas, birthy[B]).
        """
        key = ("pg_init", cid, n_particles_per_dev)
        if key in self._fns:
            return self._fns[key]
        eng = self.eng
        cm = self.cm
        PP = n_particles_per_dev

        def local(arenas, params, slots, keys, sel_keys):
            # keys: [B, P_total, 2] sharded (data, particle) ->
            # local [B_loc, PP, 2]; sel_keys: [B, 2] sharded over data only,
            # so the selection draw is identical on every particle shard.
            rel = refresh(cm, arenas, eng.obs_dev)
            my_p = jax.lax.axis_index("particle")

            def one_row(s, row_keys, sk):
                def one_particle(k):
                    env2, w, births = eng._propose_packed(
                        cid, arenas, rel, params, s, k, False)
                    birthy = jnp.zeros((), bool)
                    for b in births:
                        birthy = birthy | b["is_new"]
                    return env2, w, birthy

                env2, w, birthy = jax.vmap(one_particle)(row_keys)  # [PP,...]
                # gather weights across the particle axis and select one
                # particle globally — the SMC resampling collective
                w_all = jax.lax.all_gather(w, "particle")  # [n_pdev, PP]
                w_flat = w_all.reshape(-1)
                idx = jax.random.categorical(sk, w_flat)
                dev, loc = idx // PP, idx % PP
                mine = dev == my_p

                def pick(x):
                    x = jnp.asarray(x)
                    chosen = x[loc]
                    contrib = jnp.where(mine, chosen, jnp.zeros_like(chosen))
                    return jax.lax.psum(contrib, "particle")

                env_sel = {v: pick(val) for v, val in env2.items()}
                b_sel = pick(birthy.astype(jnp.int32)) > 0
                return env_sel, b_sel

            env2, birthy = jax.vmap(one_row)(slots, keys, sel_keys)
            arenas = _scatter_apply(cm, cid, arenas, slots, env2, ~birthy,
                                  mark_alive=True, axis="data")
            return arenas, birthy

        smapped = jax.jit(jax.shard_map(
            _with_interned(cm, local), mesh=self.mesh,
            in_specs=(P(), P(), P("data"), P("data", "particle"), P("data"),
                      P()),
            out_specs=(P(), P("data"))))

        def wrapped(arenas, params, slots, keys, sel_keys):
            arenas, params, slots, keys = self._place(
                arenas, params, ((slots, P("data")),
                                 (keys, P("data", "particle"))))
            sel_keys = jax.device_put(
                sel_keys, NamedSharding(self.mesh, P("data")))
            return smapped(arenas, params, slots, keys, sel_keys,
                           self._interned_rep())

        self._fns[key] = wrapped
        return wrapped

    def sharded_pg_rejuv_step(self, cid: ClassID, n_particles_per_dev: int = 1):
        """B live rows CSMC-rejuvenated in parallel, each by (mesh 'particle'
        axis x per-device particles) independent proposals. The retained
        particle lives at local index 0 of particle-shard 0, forced to the
        stored row (row_inference.jl:143-145); the final PG selection is a
        categorical over all-gathered weights with a per-row key sharded
        over 'data' only, so every particle shard draws the same winner
        (row_inference.jl:164; the parallel-resampling collective of
        SURVEY.md §5).

        Rows whose winning particle would birth latent entities are NOT
        applied and are returned flagged for sequential replay, like the
        batched MH drivers. Returns (arenas, birthy[B]).
        """
        key = ("pg_rejuv", cid, n_particles_per_dev)
        if key in self._fns:
            return self._fns[key]
        eng = self.eng
        cm = self.cm
        PP = n_particles_per_dev

        def local(arenas, params, slots, keys, sel_keys):
            rel = refresh(cm, arenas, eng.obs_dev)
            my_p = jax.lax.axis_index("particle")
            alive_arr = arenas[cid]["alive"] if cm.layouts[cid].observed \
                else rel[cid]["alive"]

            def one_row(s, row_keys, sk):
                def one_particle(k, forced):
                    env2, w, births = eng._propose_packed(
                        cid, arenas, rel, params, s, k, forced)
                    birthy = jnp.zeros((), bool)
                    for b in births:
                        birthy = birthy | b["is_new"]
                    return env2, w, birthy

                env_f, w_f, b_f = jax.vmap(
                    lambda k: one_particle(k, False))(row_keys)  # [PP, ...]
                env_r, w_r, b_r = one_particle(row_keys[0], True)
                is0 = my_p == 0

                def mix(f, r):
                    f = jnp.asarray(f)
                    return f.at[0].set(jnp.where(is0, jnp.asarray(r), f[0]))

                env2 = {v: mix(val, env_r[v]) for v, val in env_f.items()}
                w = mix(w_f, w_r)
                birthy = mix(b_f, b_r)
                w_all = jax.lax.all_gather(w, "particle")  # [n_pdev, PP]
                idx = jax.random.categorical(sk, w_all.reshape(-1))
                dev, loc = idx // PP, idx % PP
                mine = dev == my_p

                def pick(x):
                    x = jnp.asarray(x)
                    chosen = x[loc]
                    contrib = jnp.where(mine, chosen, jnp.zeros_like(chosen))
                    return jax.lax.psum(contrib, "particle")

                env_sel = {v: pick(val) for v, val in env2.items()}
                b_sel = pick(birthy.astype(jnp.int32)) > 0
                return env_sel, b_sel

            env2, birthy = jax.vmap(one_row)(slots, keys, sel_keys)
            ok = alive_arr[slots] & ~birthy
            arenas = _scatter_apply(cm, cid, arenas, slots, env2, ok,
                                    mark_alive=False, axis="data")
            return arenas, birthy

        smapped = jax.jit(jax.shard_map(
            _with_interned(cm, local), mesh=self.mesh,
            in_specs=(P(), P(), P("data"), P("data", "particle"), P("data"),
                      P()),
            out_specs=(P(), P("data"))))

        def wrapped(arenas, params, slots, keys, sel_keys):
            arenas, params, slots, keys = self._place(
                arenas, params, ((slots, P("data")),
                                 (keys, P("data", "particle"))))
            sel_keys = jax.device_put(
                sel_keys, NamedSharding(self.mesh, P("data")))
            return smapped(arenas, params, slots, keys, sel_keys,
                           self._interned_rep())

        self._fns[key] = wrapped
        return wrapped
