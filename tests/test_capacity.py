"""Arena capacity: auto-sizing from data + loud arena-full degradation.

VERDICT r2: the full-arena guard (propose.sample_fk) silently redirects
fresh-entity proposals to the argmax existing candidate; that event must be
surfaced, and the 1024 default (compile._fix_layouts) must be replaceable
by data-derived sizing for scaled configs.
"""
import warnings

import jax
import pytest

from pclean_tpu.dists import AddTypos, Ref, StringPrior
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query


def _model(n_rows, cap=None, auto=False):
    # pairwise Damerau-Levenshtein distance far above the max_typos=1 cap,
    # so entities cannot plausibly merge
    vals = ["memorial", "vincent", "quixote", "zanzibar",
            "lighthouse", "grapevine", "obsidian", "waterfall"]
    rows = [vals[i % 8] for i in range(n_rows)]
    b = ModelBuilder()
    with b.cls("Obj") as c:
        c.choice("name", StringPrior(3, 12, vals))
    with b.cls("Row") as c:
        c.fk("obj", "Obj")
        c.choice("name_obs", AddTypos(Ref("obj.name"), 1))
    model = b.finish()
    q = Query.build(model, "Row", [("name", "obj.name", "name_obs")])
    ds = ObservedDataset(q, {"name": rows})
    kw = {}
    if cap is not None:
        kw["capacities"] = {"Obj": cap}
    cm = compile_model(model, [ds], auto_capacities=auto, **kw)
    return cm


def _run(cm):
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    return eng, arenas


def test_arena_full_warns():
    cm = _model(16, cap=4)  # 8 distinct names cannot fit in 4 slots
    with pytest.warns(RuntimeWarning, match="FULL"):
        _run(cm)


def test_auto_capacity_sizes_from_data_and_stays_quiet():
    cm = _model(16, auto=True)
    cap = cm.layouts["Obj"].capacity
    assert cap >= 8 and cap % 64 == 0 and cap <= 256, cap
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        eng, arenas = _run(cm)
    occ = eng.arena_occupancy(arenas)
    n, c = occ["Obj"]
    assert 1 <= n <= 8 + 2 and c == cap, occ


def test_explicit_capacity_wins_over_auto():
    cm = _model(16, cap=32, auto=True)
    assert cm.layouts["Obj"].capacity == 32
