"""Particle-Gibbs / multi-particle SMC tests (reference row_inference.jl)."""
import jax
import jax.numpy as jnp
import numpy as np

from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.particles import pg_init_step, pg_rejuv_step
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig, _obs_device
from pclean_tpu.analysis import evaluate_accuracy

from test_engine_smoke import CLEAN, DIRTY, tiny_setup


def test_pg_init_and_rejuv_roundtrip():
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000,
                                     use_mh_instead_of_pg=False,
                                     num_particles=8))
    istep = pg_init_step(eng, "Row", 8)
    keys = jax.random.split(jax.random.PRNGKey(1), len(DIRTY))
    lmls = []
    for i in range(len(DIRTY)):
        arenas, lml = istep(arenas, params, i, keys)
        lmls.append(float(lml))
    assert all(np.isfinite(lmls)), lmls
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)

    rstep = pg_rejuv_step(eng, "Row", 8)
    keys2 = jax.random.split(jax.random.PRNGKey(2), len(DIRTY))
    for i in range(len(DIRTY)):
        arenas, _ = rstep(arenas, params, i, keys2)
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    assert res["f1"] > 0.5, res


def test_pg_scanned_drivers_end_to_end():
    """Engine.initialize/sweep in PG mode route through the fused scan
    drivers (scan_init_pg / scan_sweep_class_pg) and reach the same
    relational invariants + accuracy as the per-row PG steps."""
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000,
                                     use_mh_instead_of_pg=False,
                                     num_particles=8, use_scan=True))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    assert np.isfinite(float(eng.log_ml))
    arenas, params, key = eng.sweep(key, arenas, params)
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    assert res["f1"] > 0.5, res
