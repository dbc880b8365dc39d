"""End-to-end smoke tests of the engine on tiny models."""
import jax
import numpy as np
import pytest

from pclean_tpu.analysis import evaluate_accuracy
from pclean_tpu.dists import AddTypos, ChooseUniformly, Ref, StringPrior
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig, _obs_device
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

NAMES = ["alice", "bob", "carol"]
DIRTY = ["alice", "alicx", "bob", "bob", "carol", "caroll", "alice", "bpb"]
CLEAN = ["alice", "alice", "bob", "bob", "carol", "carol", "alice", "bob"]


def tiny_setup(capacity=8):
    b = ModelBuilder()
    with b.cls("Obj") as c:
        c.choice("name", StringPrior(1, 10, NAMES))
    with b.cls("Row") as c:
        c.fk("obj", "Obj")
        c.choice("name_obs", AddTypos(Ref("obj.name")))
    model = b.finish()
    q = Query.build(model, "Row", [("name", "obj.name", "name_obs")])
    ds = ObservedDataset(q, {"name": list(DIRTY)})
    cm = compile_model(model, [ds], capacities={"Obj": capacity})
    return cm, q, ds


def test_compile_and_init_state():
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    assert arenas["Obj"]["values"] is not None
    assert cm.layouts["Row"].capacity == len(DIRTY)
    # AddTypos domain shares Obj.name's vocab and includes observed values
    dom = cm.domain("Row", q.obsmap["name"])
    for v in DIRTY:
        assert v in dom.vocab.index


def test_initialize_clusters_rows():
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params, _ = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    rel = refresh(cm, arenas, _obs_device(cm))
    n_objs = int(np.asarray(rel["Obj"]["nrows"]))
    # 8 rows referencing ~3 latent names
    assert 1 <= n_objs <= 6
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    assert res["f1"] > 0.5, res


def test_sweep_improves_or_keeps():
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    arenas, params, _ = eng.run(key, arenas, params)
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    assert res["f1"] > 0.5, res
    # relational invariants hold after sweeps
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
