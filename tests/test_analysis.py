"""Accuracy scoring + export tests (reference analysis.jl)."""
import csv
import math
import os

import jax
import numpy as np

from pclean_tpu.analysis import (evaluate_accuracy, read_cell_values,
                                 save_results)
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig

from test_engine_smoke import CLEAN, DIRTY, tiny_setup


def _fit():
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    return cm, q, ds, arenas, params


def test_accuracy_counts_match_manual():
    cm, q, ds, arenas, params = _fit()
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    ours = read_cell_values(cm, arenas, params, "Row", q.cleanmap["name"])
    errors = sum(1 for d, c in zip(DIRTY, CLEAN) if d != c)
    changed = sum(1 for d, o in zip(DIRTY, ours) if o != d)
    cleaned = sum(1 for d, o, c in zip(DIRTY, ours, CLEAN) if o != d and o == c)
    assert res["errors"] == errors
    assert res["changed"] == changed
    assert res["cleaned"] == cleaned
    # analysis.jl:85-87
    if changed:
        assert math.isclose(res["precision"], cleaned / changed)


def test_accuracy_up_to_prefix():
    cm, q, ds, arenas, params = _fit()
    full = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                             {"name": list(CLEAN)}, q)
    half = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                             {"name": list(CLEAN)}, q, up_to=4)
    assert half["changed"] <= full["changed"]


def test_accuracy_imputation():
    cm, q, ds, arenas, params = _fit()
    dirty = list(DIRTY)
    dirty[0] = None  # missing cell counts as imputation (analysis.jl:50-57)
    res = evaluate_accuracy(cm, arenas, params, {"name": dirty},
                            {"name": list(CLEAN)}, q)
    assert res["imputed"] == 1


def test_save_results_exports(tmp_path):
    cm, q, ds, arenas, params = _fit()
    out = save_results(cm, arenas, params, str(tmp_path), "toy", [ds],
                       timestamp=False)
    recon = os.path.join(out, "reconstructed_Row.csv")
    assert os.path.exists(recon)
    with open(recon) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["name"]
    assert len(rows) == 1 + len(DIRTY)
    # latent-class export (save_tables, analysis.jl:8-13)
    assert os.path.exists(os.path.join(out, "inferred_Obj.csv"))


def test_device_eval_matches_host():
    cm, q, ds, arenas, params = _fit()
    from pclean_tpu.analysis import evaluate_accuracy_device
    dirty = {"name": list(DIRTY)}
    dirty["name"] = dirty["name"][:]
    dirty["name"][0] = None
    clean = {"name": list(CLEAN)}
    host = evaluate_accuracy(cm, arenas, params, dirty, clean, q)
    dev = evaluate_accuracy_device(cm, arenas, params, dirty, clean, q)
    assert host == dev, (host, dev)
