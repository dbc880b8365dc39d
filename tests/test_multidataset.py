"""Multiple observed datasets (reference initialize_trace accepts a
Vector{ObservedDataset}, inference.jl:3-57)."""
import jax
import numpy as np

from pclean_tpu.analysis import evaluate_accuracy
from pclean_tpu.dists import AddTypos, ChooseUniformly, Ref, StringPrior
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig, _obs_device
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

NAMES = ["alice", "bob"]


def test_two_observed_classes():
    b = ModelBuilder()
    with b.cls("Obj") as c:
        c.choice("name", StringPrior(1, 10, NAMES))
    with b.cls("RowA") as c:
        c.fk("obj", "Obj")
        c.choice("obs", AddTypos(Ref("obj.name")))
    with b.cls("RowB") as c:
        c.fk("obj", "Obj")
        c.choice("obs", AddTypos(Ref("obj.name")))
    m = b.finish()
    qa = Query.build(m, "RowA", [("name", "obj.name", "obs")])
    qb = Query.build(m, "RowB", [("name", "obj.name", "obs")])
    da = {"name": ["alice", "alicx", "bob"]}
    db = {"name": ["bob", "bub", "alice", "alice"]}
    cm = compile_model(m, [ObservedDataset(qa, da), ObservedDataset(qb, db)],
                       capacities={"Obj": 8})
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    rel = refresh(cm, arenas, _obs_device(cm))
    # both datasets' references land in the shared latent table
    assert int(np.asarray(rel["Obj"]["total"])) == 7
    arenas, params, key = eng.run(key, arenas, params)
    ra = evaluate_accuracy(cm, arenas, params, da,
                           {"name": ["alice", "alice", "bob"]}, qa)
    rb = evaluate_accuracy(cm, arenas, params, db,
                           {"name": ["bob", "bob", "alice", "alice"]}, qb)
    assert ra["f1"] > 0.5 and rb["f1"] > 0.5, (ra, rb)
