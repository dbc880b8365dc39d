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


def _delta_apply(cm: CompiledModel, cid: ClassID, arenas: dict, slots,
                 env2: dict, ok, mark_alive: bool, axis: str) -> dict:
    """Replicated-arena update from sharded per-row results: every shard
    scatters (new - old) deltas for the rows it owns, then a psum over the
    data axis reconciles; slot ownership is disjoint so the sum is exact."""
    lay = cm.layouts[cid]
    vals = dict(arenas[cid]["values"])
    for vid in lay.store:
        if vid not in env2:
            continue
        cur = vals[vid]
        new = jnp.asarray(env2[vid]).astype(cur.dtype)
        local = jnp.zeros_like(cur).at[slots].add(
            jnp.where(ok, new - cur[slots], jnp.zeros_like(new)))
        vals[vid] = cur + jax.lax.psum(local, axis)
    alive = arenas[cid]["alive"]
    if mark_alive:
        set_local = jnp.zeros_like(alive).at[slots].set(ok)
        alive = alive | (jax.lax.psum(set_local.astype(jnp.int32), axis) > 0)
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

        def local(arenas, params, slots, keys):
            rel = refresh(cm, arenas, eng.obs_dev)

            def one(s, k):
                kp, kr, ka = jax.random.split(k, 3)
                env_p, w_p, births = eng._propose_packed(
                    cid, arenas, rel, params, s, kp, False)
                _e, w_r, _b = eng._propose_packed(
                    cid, arenas, rel, params, s, kr, True)
                alive = arenas[cid]["alive"][s] if cm.layouts[cid].observed \
                    else rel[cid]["alive"][s]
                accept = (jnp.log(jax.random.uniform(ka)) < (w_p - w_r)) & alive
                birthy = jnp.zeros((), bool)
                for b in births:
                    birthy = birthy | b["is_new"]
                return env_p, accept & ~birthy, birthy & alive

            env2, accept, birthy = jax.vmap(one)(slots, keys)
            arenas = _delta_apply(cm, cid, arenas, slots, env2, accept,
                                  mark_alive=False, axis="data")
            return arenas, birthy

        smapped = jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=(P(), P("data"))))

        def wrapped(arenas, params, slots, keys):
            arenas, params, slots, keys = self._place(
                arenas, params, ((slots, P("data")), (keys, P("data"))))
            return smapped(arenas, params, slots, keys)

        self._fns[key] = wrapped
        return wrapped

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
            arenas = _delta_apply(cm, cid, arenas, slots, env2, ~birthy,
                                  mark_alive=True, axis="data")
            return arenas, birthy

        smapped = jax.jit(jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(), P(), P("data"), P("data", "particle"), P("data")),
            out_specs=(P(), P("data"))))

        def wrapped(arenas, params, slots, keys, sel_keys):
            arenas, params, slots, keys = self._place(
                arenas, params, ((slots, P("data")),
                                 (keys, P("data", "particle"))))
            sel_keys = jax.device_put(
                sel_keys, NamedSharding(self.mesh, P("data")))
            return smapped(arenas, params, slots, keys, sel_keys)

        self._fns[key] = wrapped
        return wrapped
