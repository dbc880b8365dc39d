"""Sharded-vs-single-device equivalence of the fused batched scan drivers.

SURVEY.md §4 requires determinism tests that sharded and unsharded runs
produce identical results given identical keys. The batched drivers make
this exact: the per-row math (init_row_step / mh_row_step) and key
derivation are shared, and the sharded reconcile (_scatter_apply) is
bitwise-equal to the single-device scatter. So an 8-device data mesh must
reproduce the 1-device batched run exactly — including on the hospital
workload itself (VERDICT r1 item 1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pclean_tpu.dists import AddTypos, ChooseProportionally, ParamRef, \
    Proportions, Ref, StringPrior
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query
from pclean_tpu.parallel import make_mesh


def run_one(cm, B, seed, mesh=None):
    # batch_birth=False: in-batch birth allocation is a single-device
    # feature (the sharded driver defers births to replay), so bitwise
    # comparison requires both sides on the defer-to-replay path
    cfg = InferenceConfig(num_iters=1, batch_rows=B, rejuv_frequency=16,
                          batch_birth=False)
    eng = Engine(cm, cfg, mesh=mesh)
    arenas, params = init_state(cm, jax.random.PRNGKey(seed))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(seed + 1),
                                         arenas, params)
    arenas, params, key = eng.sweep(key, arenas, params)
    return jax.device_get(arenas), jax.device_get(params)


def assert_trees_equal(t1, t2):
    l1, d1 = jax.tree_util.tree_flatten(t1)
    l2, d2 = jax.tree_util.tree_flatten(t2)
    assert d1 == d2
    for a, b in zip(l1, l2):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        else:
            np.testing.assert_array_equal(a, b)


def flagship_cm(n_rows=32, cap=16):
    states = ["al", "ak", "az"]
    names = ["memorial hospital", "st vincent", "county general", "mercy"]
    rows_name = [names[i % len(names)] for i in range(n_rows)]
    rows_name[1] = "memorial hospitel"
    rows_state = [states[i % len(states)] for i in range(n_rows)]
    b = ModelBuilder()
    with b.cls("County") as c:
        c.learned("props", Proportions())
        c.choice("state", ChooseProportionally(states, ParamRef("props")))
    with b.cls("Hospital") as c:
        c.fk("loc", "County")
        c.choice("name", StringPrior(3, 30, names))
    with b.cls("Record") as c:
        c.fk("hosp", "Hospital")
        c.choice("name_obs", AddTypos(Ref("hosp.name")))
        c.choice("state_obs", AddTypos(Ref("hosp.loc.state")))
    model = b.finish()
    q = Query.build(model, "Record", [("name", "hosp.name", "name_obs"),
                                      ("state", "hosp.loc.state", "state_obs")])
    ds = ObservedDataset(q, {"name": rows_name, "state": rows_state})
    cm = compile_model(model, [ds],
                       capacities={"County": cap, "Hospital": cap})
    return cm, q, {"name": rows_name, "state": rows_state}


def test_flagship_sharded_equals_single_device():
    cm, q, dirty = flagship_cm()
    a1, p1 = run_one(cm, B=8, seed=0)
    mesh = make_mesh(8, 1)
    a2, p2 = run_one(cm, B=8, seed=0, mesh=mesh)
    assert_trees_equal(a1, a2)
    assert_trees_equal(p1, p2)


def test_flagship_sharded_equals_single_device_mesh4():
    # a mesh that doesn't cover all devices, with 2 local rows per shard
    cm, q, dirty = flagship_cm()
    a1, p1 = run_one(cm, B=8, seed=3)
    mesh = make_mesh(4, 1)
    a2, p2 = run_one(cm, B=8, seed=3, mesh=mesh)
    assert_trees_equal(a1, a2)
    assert_trees_equal(p1, p2)


@pytest.mark.slow
def test_hospital_sharded_equals_single_device():
    """The hospital experiment itself, 64 rows, 8-device data mesh."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "experiments"))
    from hospital import CAPACITIES, QUERY_CLAUSES, build_model, load

    from pclean_tpu.analysis import evaluate_accuracy
    from pclean_tpu.io import possibilities_from

    dirty, clean = load(64)
    poss = possibilities_from(dirty)
    model = build_model(poss)
    query = Query.build(model, "Record", QUERY_CLAUSES)
    ds = ObservedDataset(query, dirty)
    cm = compile_model(model, [ds], capacities=CAPACITIES)

    a1, p1 = run_one(cm, B=8, seed=0)
    a2, p2 = run_one(cm, B=8, seed=0, mesh=make_mesh(8, 1))
    assert_trees_equal(a1, a2)
    assert_trees_equal(p1, p2)
    r1 = evaluate_accuracy(cm, a1, p1, dirty, clean, query)
    r2 = evaluate_accuracy(cm, a2, p2, dirty, clean, query)
    assert r1 == r2
    assert r1["f1"] > 0.5
