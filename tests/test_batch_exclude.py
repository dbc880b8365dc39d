"""Per-row self-exclusion in the batched sweeps (VERDICT r2 weak items 1/7).

The batched blocked-Gibbs sweeps score rows against a frozen relational
snapshot. Without self-exclusion the snapshot still contains each row's own
reference — a one-count Pitman-Yor bias toward the row's current entity
(largest for singletons, whose own count is the only thing keeping the
entity 'alive'). `batch_self_exclude` removes exactly that: each row's copy
of the snapshot gets its own contributions removed by the same point delta
the sequential path uses (refresh.row_delta == unincorporate_row!,
/root/reference/src/model/dependency_tracking.jl:71-84), so the ONLY
remaining batched approximation is same-batch co-reference blindness.

These tests isolate the one-count bias from the co-reference blindness by
examining a single row at a time (a one-row batch cannot have co-reference
effects): with self-exclusion the batched proposal must be BITWISE equal to
the sequential excluded-snapshot proposal under the same key; without it, a
singleton-entity row must show the stay bias.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pclean_tpu.engine.compile import init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import (Engine, InferenceConfig, _obs_device,
                                   mh_row_step)

from test_engine_smoke import CLEAN, DIRTY, tiny_setup


def _converged_state():
    cm, q, ds = tiny_setup()
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    arenas, params, key = eng.sweep(key, arenas, params)
    return cm, arenas, params


def _fk_vid(cm):
    return cm.cls("Row").fks["obj"] if hasattr(cm.cls("Row"), "fks") \
        else cm.cls("Row").names["obj"]


def test_self_excluded_batch_row_matches_sequential_bitwise():
    """mh_row_step with batch_self_exclude on a no-exclude snapshot must
    reproduce the sequential path (explicit refresh exclude) bitwise,
    key for key, on every row."""
    cm, arenas, params = _converged_state()
    obs_dev = _obs_device(cm)
    eng = Engine(cm, InferenceConfig(batch_self_exclude=True))

    @jax.jit
    def batched(s, k):
        rel = refresh(cm, arenas, obs_dev)
        return mh_row_step(eng, "Row", arenas, rel, params, s, k,
                           jnp.asarray(True))

    @jax.jit
    def sequential(s, k):
        rel = refresh(cm, arenas, obs_dev, exclude_cid="Row",
                      exclude_slot=s)
        kp, kr, ka = jax.random.split(k, 3)
        env, w, births = eng._propose_packed("Row", arenas, rel, params,
                                             s, kp, False)
        return env

    keys = jax.random.split(jax.random.PRNGKey(5), len(DIRTY))
    for s in range(len(DIRTY)):
        env_b, _acc, _birthy = batched(s, keys[s])
        env_s = sequential(s, keys[s])
        for vid in env_s:
            np.testing.assert_array_equal(np.asarray(env_b[vid]),
                                          np.asarray(env_s[vid]),
                                          err_msg=f"row {s} vid {vid}")


def test_one_count_bias_visible_without_self_exclusion():
    """A singleton-entity row scored against the UN-excluded snapshot sees
    its own count, so its entity looks like an existing cluster (no birth
    needed to stay). The EXCLUDED snapshot sees count 0 — the entity is
    dead, and keeping the same value requires a fresh-birth proposal. The
    `birthy` flag therefore separates the two paths on a singleton row:
    that IS the isolated one-count bias (no co-reference effects exist for
    a single row)."""
    from pclean_tpu.dists import AddTypos, Ref, StringPrior
    from pclean_tpu.engine.compile import compile_model
    from pclean_tpu.model.builder import ModelBuilder
    from pclean_tpu.model.query import ObservedDataset, Query

    names = ["alice", "bob", "zzzzz"]
    dirty = ["alice", "alice", "alice", "bob", "bob", "zzzzz"]
    b = ModelBuilder()
    with b.cls("Obj") as c:
        c.choice("name", StringPrior(1, 10, names))
    with b.cls("Row") as c:
        c.fk("obj", "Obj")
        c.choice("name_obs", AddTypos(Ref("obj.name")))
    model = b.finish()
    q = Query.build(model, "Row", [("name", "obj.name", "name_obs")])
    cm = compile_model(model, [ObservedDataset(q, {"name": dirty})],
                       capacities={"Obj": 8})
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    arenas, params, key = eng.sweep(key, arenas, params)
    obs_dev = _obs_device(cm)

    # find the singleton row: its fk target has refcount exactly 1
    rel = refresh(cm, arenas, obs_dev)
    fkv = [v for v in cm.layouts["Row"].fk_vertices][0]
    fks = np.asarray(arenas["Row"]["values"][fkv])
    rc = np.asarray(rel["Obj"]["refcount"])
    singletons = [s for s in range(len(dirty)) if rc[fks[s]] == 1]
    assert singletons, (fks, rc)
    s0 = singletons[0]

    eng_on = Engine(cm, InferenceConfig(batch_self_exclude=True))
    eng_off = Engine(cm, InferenceConfig(batch_self_exclude=False))

    def birthy_of(eng_x, s, k):
        @jax.jit
        def f(s, k):
            rel = refresh(cm, arenas, obs_dev)
            _env, _acc, birthy = mh_row_step(eng_x, "Row", arenas, rel,
                                             params, s, k,
                                             jnp.asarray(True))
            return birthy
        return bool(f(s, k))

    n = 24
    keys = jax.random.split(jax.random.PRNGKey(9), n)
    on = sum(birthy_of(eng_on, s0, k) for k in keys)
    off = sum(birthy_of(eng_off, s0, k) for k in keys)
    # excluded: the dead singleton entity can only be re-kept via a fresh
    # birth; un-excluded: it looks alive, no birth needed to stay
    assert on > off, (on, off)
    assert on >= n // 2, on
