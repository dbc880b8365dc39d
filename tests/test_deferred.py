"""Deferred scoring of unobserved non-enumerable parents with observed
descendants (reference block_proposal.jl:56-66: the parent is sampled from
its prior FIRST, then descendants score against the draw), plus the
compile-time exact-Gibbs audit that gates the acceptance shortcut.

Model: x ~ ChooseUniformly (enumerable latent), y ~ MaybeSwap(x) unobserved
non-enumerable, z ~ AddTypos(y) observed. Round 1 could not express this
model at all (the tracer had no value for y); the posterior over x is
brute-forceable by enumerating (x, y).
"""
import math

import jax
import numpy as np
import pytest

from pclean_tpu.dists import AddTypos, ChooseUniformly, MaybeSwap, Ref, StringPrior
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

VALS = ["aa", "ab", "bb"]


def build(prob, obs):
    b = ModelBuilder()
    with b.cls("Row") as c:
        c.choice("x", ChooseUniformly(VALS))
        c.choice("y", MaybeSwap(Ref("x"), VALS, prob))
        c.choice("z", AddTypos(Ref("y")))
    model = b.finish()
    q = Query.build(model, "Row", [("z", "x", "z")])
    ds = ObservedDataset(q, {"z": [obs]})
    cm = compile_model(model, [ds])
    return cm, q


def brute_posterior(cm, prob, obs):
    """p(x | z) by enumerating (x, y) against the model's own typo matrix.

    y | x follows MaybeSwap's *generative* process (maybe_swap.jl:5-11):
    keep with prob 1-p, else uniform over options (which includes x) — the
    distribution the proposal draws from, hence the chain's target.
    """
    z_vid = cm.cls("Row").names["z"]
    kern = cm.kernels[("Row", z_vid)]
    dom = cm.domain("Row", z_vid)
    z = dom.vocab.encode(obs)
    codes = [dom.vocab.encode(v) for v in VALS]
    M = np.asarray(kern.M)  # [V_obs, V_word]
    post = np.zeros(len(VALS))
    for i, xc in enumerate(codes):
        for yc in codes:
            p_y = (1.0 - prob) * (yc == xc) + prob / len(VALS)
            post[i] += p_y * math.exp(M[z, yc])
    return post / post.sum()


def run_chain(cm, q, sweeps, seed=0):
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=10 ** 9))
    arenas, params = init_state(cm, jax.random.PRNGKey(seed))
    key = jax.random.PRNGKey(seed + 1)
    arenas, params, key = eng.initialize(key, arenas, params)
    x_vid = cm.cls("Row").names["x"]
    dom = cm.domain("Row", x_vid)
    codes = [dom.vocab.encode(v) for v in VALS]
    counts = np.zeros(len(VALS))
    for _ in range(sweeps):
        arenas, params, key = eng.sweep(key, arenas, params)
        xc = int(np.asarray(arenas["Row"]["values"][x_vid][0]))
        counts[codes.index(xc)] += 1
    return counts / counts.sum(), eng


def test_audit_flags_weight_bearing_nonenumerable():
    cm, _ = build(0.3, "aa")
    assert cm.exact_gibbs_ok is False
    eng = Engine(cm, InferenceConfig())
    assert eng.exact_accept is False  # shortcut auto-disabled


def test_audit_passes_leaf_observation_models():
    # AddTypos directly on an enumerable latent (the bundled-workload shape)
    b = ModelBuilder()
    with b.cls("Obj") as c:
        c.choice("name", StringPrior(1, 10, VALS))
    with b.cls("Row") as c:
        c.fk("obj", "Obj")
        c.choice("name_obs", AddTypos(Ref("obj.name")))
    model = b.finish()
    q = Query.build(model, "Row", [("name", "obj.name", "name_obs")])
    ds = ObservedDataset(q, {"name": ["aa", "ab"]})
    cm = compile_model(model, [ds], capacities={"Obj": 4})
    assert cm.exact_gibbs_ok is True
    assert Engine(cm, InferenceConfig()).exact_accept is True


def test_deterministic_passthrough_posterior():
    """prob=0 makes the prior draw y = x surely, so every sweep draws x from
    the exact conditional; sweep samples are iid from the brute posterior."""
    obs = "aa"
    cm, q = build(0.0, obs)
    want = brute_posterior(cm, 0.0, obs)
    got, eng = run_chain(cm, q, sweeps=400, seed=3)
    assert eng.exact_accept is False
    tv = 0.5 * np.abs(got - want).sum()
    assert tv < 0.08, (got, want, tv)


def test_mcmc_matches_brute_force_posterior():
    """prob=0.3: the drawn y varies, weights differ across proposals, and
    the MH chain's x-marginal must match the enumerated posterior."""
    obs = "ab"
    prob = 0.3
    cm, q = build(prob, obs)
    want = brute_posterior(cm, prob, obs)
    got, _ = run_chain(cm, q, sweeps=800, seed=5)
    tv = 0.5 * np.abs(got - want).sum()
    assert tv < 0.12, (got, want, tv)


def _keyed_latent_model(observe_key: bool):
    """rents shape: latent class keyed by an Unmodeled column that is
    (optionally) statically observed via clean=dirty propagation."""
    from pclean_tpu.dists import Unmodeled

    b = ModelBuilder()
    with b.cls("County") as c:
        c.choice("key", Unmodeled())
        c.choice("name", StringPrior(1, 10, VALS))
    with b.cls("Row") as c:
        c.fk("county", "County")
        c.choice("name_obs", AddTypos(Ref("county.name")))
        c.choice("key_obs", AddTypos(Ref("county.key")))
    model = b.finish()
    clauses = [("name", "county.name", "name_obs")]
    data = {"name": ["aa", "ab"], "key": ["k1", "k2"]}
    if observe_key:
        clauses.append(("key", "county.key"))  # clean = dirty: propagated
    else:
        clauses.append(("key", "county.key", "key_obs"))  # noisy: not
    q = Query.build(model, "Row", clauses)
    ds = ObservedDataset(q, data)
    return compile_model(model, [ds], capacities={"County": 4})


def test_audit_passes_statically_observed_unmodeled_key():
    """An Unmodeled latent key propagated from a column observed in every
    dataset row never takes a prior draw, so exactness holds (the rents
    County.countykey shape; compile._statically_observed)."""
    cm = _keyed_latent_model(observe_key=True)
    assert cm.exact_gibbs_ok is True


def test_audit_flags_unobserved_unmodeled_key():
    """Without the propagated observation the key's prior draw flows into
    the name prior's argument graph — not exact."""
    cm = _keyed_latent_model(observe_key=False)
    assert cm.exact_gibbs_ok is False


def _build_many(prob, obs, n):
    b = ModelBuilder()
    with b.cls("Row") as c:
        c.choice("x", ChooseUniformly(VALS))
        c.choice("y", MaybeSwap(Ref("x"), VALS, prob))
        c.choice("z", AddTypos(Ref("y")))
    model = b.finish()
    q = Query.build(model, "Row", [("z", "x", "z")])
    ds = ObservedDataset(q, {"z": [obs] * n})
    return compile_model(model, [ds])


def _init_mean_loglik(cm, num_particles, seed):
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=10 ** 9,
                                     num_particles=num_particles))
    arenas, params = init_state(cm, jax.random.PRNGKey(seed))
    arenas, params, _ = eng.initialize(jax.random.PRNGKey(seed + 1),
                                       arenas, params)
    y_vid = cm.cls("Row").names["y"]
    z_vid = cm.cls("Row").names["z"]
    kern = cm.kernels[("Row", z_vid)]
    dom = cm.domain("Row", z_vid)
    M = np.asarray(kern.M)
    z = dom.vocab.encode("aa")
    y = np.asarray(arenas["Row"]["values"][y_vid])
    return float(M[z, y].mean())


def test_mh_init_two_fresh_particles_on_deferred_path():
    """VERDICT r2 item 7 (infer_config.jl:11-13, row_inference.jl:159-165):
    when the exactness audit fails, MH-mode init must select among 2 fresh
    weighted particles instead of keeping a single prior draw — measurably
    better y draws (higher mean observed-data log-lik) on the deferred toy
    model, under identical configs except the particle count."""
    n = 160
    cm = _build_many(0.5, "aa", n)
    assert cm.exact_gibbs_ok is False
    two = _init_mean_loglik(cm, num_particles=2, seed=11)
    one = _init_mean_loglik(cm, num_particles=1, seed=11)
    assert two > one + 0.05, (two, one)
