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


# ---------------------------------------------------------------- log-ML
# VERDICT r2 item 8: validate the PG log-ML estimate (row_inference.jl:186)
# against analytically known marginals — the one quantity that certifies the
# weights/resampling plumbing end-to-end.

from pclean_tpu.dists import AddTypos, ChooseUniformly, MaybeSwap, Ref
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

_VALS = ["aa", "ab", "bb"]


def _swap_prob(yc, xc, codes, prob):
    return (1.0 - prob) * (yc == xc) + prob / len(codes)


def _brute_log_pz(cm, zname, yname_deferred, prob, obs):
    """log p(z = obs) by enumeration against the model's own typo matrix."""
    import math

    z_vid = cm.cls("Row").names[zname]
    kern = cm.kernels[("Row", z_vid)]
    dom = cm.domain("Row", z_vid)
    M = np.asarray(kern.M)
    z = dom.vocab.encode(obs)
    codes = [dom.vocab.encode(v) for v in _VALS]
    total = 0.0
    for xc in codes:
        if yname_deferred:
            for yc in codes:
                total += (1.0 / 3) * _swap_prob(yc, xc, codes, prob) \
                    * math.exp(M[z, yc])
        else:
            total += (1.0 / 3) * math.exp(M[z, xc])
    return float(np.log(total))


def test_pg_log_ml_exact_on_enumerable_model():
    """Fully enumerable single-class model: every particle weight equals the
    exact per-block marginal, so the estimate must EQUAL sum_i log p(z_i)."""
    obs = ["aa", "ab", "bb", "ab"]
    b = ModelBuilder()
    with b.cls("Row") as c:
        c.choice("x", ChooseUniformly(_VALS))
        c.choice("z", AddTypos(Ref("x")))
    model = b.finish()
    q = Query.build(model, "Row", [("z", "x", "z")])
    cm = compile_model(model, [ObservedDataset(q, {"z": obs})])
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=10 ** 9,
                                     use_mh_instead_of_pg=False,
                                     num_particles=4))
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, _ = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    want = sum(_brute_log_pz(cm, "z", False, 0.0, o) for o in obs)
    np.testing.assert_allclose(float(eng.log_ml), want, rtol=2e-4)


def _two_block_cm(prob, o1, o2):
    b = ModelBuilder()
    with b.cls("Row") as c:
        with c.block():
            c.choice("x1", ChooseUniformly(_VALS))
            c.choice("y1", MaybeSwap(Ref("x1"), _VALS, prob))
            c.choice("z1", AddTypos(Ref("y1")))
        with c.block():
            c.choice("x2", ChooseUniformly(_VALS))
            c.choice("y2", MaybeSwap(Ref("x2"), _VALS, prob))
            c.choice("z2", AddTypos(Ref("y2")))
    model = b.finish()
    q = Query.build(model, "Row", [("z1", "x1", "z1"), ("z2", "x2", "z2")])
    cm = compile_model(model, [ObservedDataset(q, {"z1": [o1], "z2": [o2]})])
    assert len(cm.cls("Row").plans) == 2
    return cm


def test_pg_log_ml_unbiased_on_two_block_deferred_model():
    """Two blocks with genuinely varying particle weights (deferred prior
    draws of y): mean of exp(log_ml) over seeds must match the analytic
    p(z1) * p(z2) within Monte-Carlo error; exercises the inter-block
    ESS-adaptive resampling accumulation (row_inference.jl:87-105,186)."""
    prob = 0.9
    cm = _two_block_cm(prob, "aa", "bb")
    want = _brute_log_pz(cm, "z1", True, prob, "aa") \
        + _brute_log_pz(cm, "z2", True, prob, "bb")
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=10 ** 9,
                                     use_mh_instead_of_pg=False,
                                     num_particles=8))
    ests = []
    for seed in range(48):
        arenas, params = init_state(cm, jax.random.PRNGKey(0))
        arenas, params, _ = eng.initialize(jax.random.PRNGKey(1000 + seed),
                                           arenas, params)
        ests.append(float(eng.log_ml))
    ests = np.asarray(ests)
    mean_p = np.exp(ests - want).mean()  # unbiased: E[p_hat / p] = 1
    se = np.exp(ests - want).std() / np.sqrt(len(ests))
    assert abs(mean_p - 1.0) < max(3.5 * se, 0.15), (mean_p, se)


# ------------------------------------------------------- exact-Gibbs collapse
# VERDICT r2 item 6: 1,024-particle PG tractable. When the exactness audit
# passes, the P-particle SMC collapses to ONE exact draw + uniform selection
# (retained survives w.p. 1/P) — so P=1,024 costs the same as the MH sweep.


def test_pg_collapse_1024_particles_end_to_end():
    """P=1,024 PG init + sweep on the tiny exact model completes quickly
    (one enumeration per row, not 1,024 vmapped ones) and matches the
    per-row-PG accuracy floor."""
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000,
                                     use_mh_instead_of_pg=False,
                                     num_particles=1024, use_scan=True))
    assert eng.exact_accept  # the collapse precondition for this model
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    assert np.isfinite(float(eng.log_ml))
    arenas, params, key = eng.sweep(key, arenas, params)
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    assert res["f1"] > 0.5, res


def test_pg_collapse_log_ml_exact_any_particle_count():
    """Collapsed log-ML must equal the analytic marginal for ANY P (it is
    the sum of block logZs, independent of the particle count)."""
    obs = ["aa", "ab", "bb", "ab"]
    b = ModelBuilder()
    with b.cls("Row") as c:
        c.choice("x", ChooseUniformly(_VALS))
        c.choice("z", AddTypos(Ref("x")))
    model = b.finish()
    q = Query.build(model, "Row", [("z", "x", "z")])
    cm = compile_model(model, [ObservedDataset(q, {"z": obs})])
    want = sum(_brute_log_pz(cm, "z", False, 0.0, o) for o in obs)
    for P in (2, 64, 1024):
        eng = Engine(cm, InferenceConfig(num_iters=1,
                                         rejuv_frequency=10 ** 9,
                                         use_mh_instead_of_pg=False,
                                         num_particles=P))
        arenas, params = init_state(cm, jax.random.PRNGKey(0))
        arenas, params, _ = eng.initialize(jax.random.PRNGKey(1), arenas,
                                           params)
        np.testing.assert_allclose(float(eng.log_ml), want, rtol=2e-4)


def test_pg_collapse_retained_survival_rate():
    """The retained particle must survive CSMC selection w.p. exactly 1/P
    under the collapse (row_inference.jl:164's uniform categorical over P
    equally weighted particles). Estimated over many seeds."""
    from pclean_tpu.engine.particles import propose_row_pg
    from pclean_tpu.engine.smc import _obs_device as _od

    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000,
                                     use_mh_instead_of_pg=False,
                                     num_particles=4))
    arenas, params, _ = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    P = 4

    @jax.jit
    def acc_of(key):
        rel = refresh(cm, arenas, eng.obs_dev, exclude_cid="Row",
                      exclude_slot=0)
        pkeys = jax.random.split(key, P)
        _e, _b, _l, acc = propose_row_pg(eng, "Row", arenas, rel, params,
                                         0, pkeys, retained=True)
        return acc

    keys = jax.random.split(jax.random.PRNGKey(7), 800)
    accs = np.asarray([bool(acc_of(k)) for k in keys])
    keep_retained = 1.0 - accs.mean()  # acc False = retained kept
    # binomial se at p=1/4, n=800 is ~0.015
    assert abs(keep_retained - 1.0 / P) < 0.06, keep_retained

