"""Per-distribution kernel parity tests against reference semantics.

Each test pins a kernel's tables/closures to the corresponding formula in
/root/reference/src/distributions/ (cited inline).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pclean_tpu.dists import (AddTypos, ChooseProportionally, ChooseUniformly,
                              ExpandOnShortVersion, MaybeSwap, Mean, ParamRef,
                              Prob, Proportions, Ref, StringPrior, TimePrior,
                              Transformation, TransformedGaussian, Unmodeled)
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query


class _Ctx:
    def __init__(self, values=None, params=None):
        self.values = values or {}
        self.params = params or {}

    def value(self, vid):
        return self.values[vid]

    def pstate(self, cid, vid):
        return self.params[(cid, vid)]


def build_single(dist, obs_col, extra=lambda c: None, data=None):
    """One latent class Obj with one attribute + observed Row(obs ~ dist)."""
    b = ModelBuilder()
    with b.cls("Row") as c:
        extra(c)
        c.choice("obs", dist)
    m = b.finish()
    q = Query.build(m, "Row", [("col", "obs")])
    ds = ObservedDataset(q, {"col": data if data is not None else obs_col})
    cm = compile_model(m, [ds])
    return cm, q


def test_choose_uniformly_logdensity_constant():
    # choose_uniformly.jl:7-10: -log(n) even off-support
    cm, q = build_single(ChooseUniformly(["a", "b", "c"]), ["a", "z", "b"])
    kern = cm.kernels[("Row", 0)]
    ctx = _Ctx()
    ld = kern.obs_logdensity(ctx, jnp.asarray(3))  # "z": outside options
    assert np.allclose(float(ld), -math.log(3))
    enum = np.asarray(kern.enum_logits(ctx))
    assert np.allclose(enum[:3], -math.log(3))
    assert enum[3] < -1e20  # off-option codes excluded from enumeration


def test_choose_proportionally_static_weights():
    # choose_proportionally.jl:7-11: log of raw weights, -inf off options
    cm, q = build_single(
        ChooseProportionally(["a", "b"], [3.0, 1.0]), ["a", "b", "c"])
    kern = cm.kernels[("Row", 0)]
    ctx = _Ctx()
    lw = np.asarray(kern.enum_logits(ctx))
    assert np.allclose(lw[0], math.log(3.0))
    assert np.allclose(lw[1], math.log(1.0))
    assert lw[2] < -1e20


def test_string_prior_enum_residual_dummy():
    # string_prior.jl:16-22: dummy carries log1p(-exp(total atom mass))
    atoms = ["alice", "bob"]
    cm, q = build_single(StringPrior(1, 10, atoms), ["alice", "bob"])
    kern = cm.kernels[("Row", 0)]
    ctx = _Ctx()
    enum = np.asarray(kern.enum_logits(ctx))
    dummy = kern.dummy_code
    scores = np.asarray(kern.score_vec)
    total = np.logaddexp(scores[0], scores[1])
    assert np.allclose(enum[dummy], math.log1p(-math.exp(total)), atol=1e-5)
    assert np.allclose(enum[0], scores[0], atol=1e-6)


def test_time_prior_semantics():
    atoms = ["7:10 a.m.", "nonsense", "12:30 p.m."]
    cm, q = build_single(TimePrior(atoms), ["7:10 a.m."])
    kern = cm.kernels[("Row", 0)]
    ctx = _Ctx()
    enum = np.asarray(kern.enum_logits(ctx))
    dom = cm.domain("Row", 0)
    # matching atoms get -log(1440); non-matching are excluded
    assert np.allclose(enum[dom.vocab.encode("7:10 a.m.")], -math.log(1440))
    assert enum[dom.vocab.encode("nonsense")] < -1e20
    # observed scoring is the constant -log(1440) (time_prior.jl:25-27)
    assert np.allclose(float(kern.obs_logdensity(ctx, jnp.asarray(1))),
                       -math.log(1440))


def test_maybe_swap_branches():
    # maybe_swap.jl:13-28
    def extra(c):
        c.choice("val", ChooseUniformly(["x", "y", "z"]))

    b = ModelBuilder()
    with b.cls("Row") as c:
        c.choice("val", ChooseUniformly(["x", "y", "z"]))
        c.choice("obs", MaybeSwap(Ref("val"), ["x", "y", "z"], 0.25))
    m = b.finish()
    q = Query.build(m, "Row", [("col", "val", "obs")])
    ds = ObservedDataset(q, {"col": ["x", "y"]})
    cm = compile_model(m, [ds])
    kern = cm.kernels[("Row", 1)]
    dom = cm.domain("Row", 1)
    x = dom.vocab.encode("x")
    y = dom.vocab.encode("y")
    ctx = _Ctx(values={0: jnp.asarray(x)})
    assert np.allclose(float(kern.obs_logdensity(ctx, jnp.asarray(x))),
                       math.log1p(-0.25))
    assert np.allclose(float(kern.obs_logdensity(ctx, jnp.asarray(y))),
                       math.log(0.25) - math.log(3))
    # missing: val in options -> 0 (maybe_swap.jl:18-23)
    assert np.allclose(float(kern.missing_logdensity(ctx)), 0.0)


def test_transformed_gaussian_jacobian():
    # transformed_gaussian.jl:13-16
    units = [Transformation(lambda x: x, lambda x: x, lambda x: 1.0),
             Transformation(lambda x: x / 1000.0, lambda x: x * 1000.0,
                            lambda x: 1.0 / 1000.0)]
    b = ModelBuilder()
    with b.cls("Row") as c:
        c.choice("unit", ChooseUniformly(units))
        c.choice("obs", TransformedGaussian(100.0, 15.0, Ref("unit")))
    m = b.finish()
    q = Query.build(m, "Row", [("col", "obs")])
    ds = ObservedDataset(q, {"col": [100.0]})
    cm = compile_model(m, [ds])
    kern = cm.kernels[("Row", 1)]

    def normal_logpdf(x, mu, sd):
        return -0.5 * ((x - mu) / sd) ** 2 - math.log(sd) - 0.5 * math.log(2 * math.pi)

    ctx0 = _Ctx(values={0: jnp.asarray(0)})
    got = float(kern.obs_logdensity(ctx0, jnp.asarray(105.0)))
    assert np.allclose(got, normal_logpdf(105.0, 100.0, 15.0), atol=1e-5)
    ctx1 = _Ctx(values={0: jnp.asarray(1)})
    got1 = float(kern.obs_logdensity(ctx1, jnp.asarray(0.105)))
    want1 = normal_logpdf(105.0, 100.0, 15.0) - math.log(1.0 / 1000.0)
    assert np.allclose(got1, want1, atol=1e-4)


def test_expand_on_short_version():
    # expand_on_short_version.jl
    opts = ["saint mary", "salem"]
    b = ModelBuilder()
    with b.cls("Row") as c:
        c.choice("val", ChooseUniformly(["sm", "zz"]))
        c.choice("obs", ExpandOnShortVersion(Ref("val"), opts))
    m = b.finish()
    q = Query.build(m, "Row", [("col", "val", "obs")])
    ds = ObservedDataset(q, {"col": ["saint mary"]})
    cm = compile_model(m, [ds])
    kern = cm.kernels[("Row", 1)]
    vdom = cm.domain("Row", 0)
    odom = cm.domain("Row", 1)
    sm = vdom.vocab.encode("sm")
    zz = vdom.vocab.encode("zz")
    saint = odom.vocab.encode("saint mary")
    ctx = _Ctx(values={0: jnp.asarray(sm)})
    # "sm" subsequence of both "saint mary" and "salem" -> -log(2)
    assert np.allclose(float(kern.obs_logdensity(ctx, jnp.asarray(saint))),
                       -math.log(2))
    ctx2 = _Ctx(values={0: jnp.asarray(zz)})
    assert np.allclose(float(kern.obs_logdensity(ctx2, jnp.asarray(saint))),
                       -1000.0)


def test_unmodeled_scores_zero():
    cm, q = build_single(Unmodeled(), ["k1", "k2"])
    kern = cm.kernels[("Row", 0)]
    assert float(kern.obs_logdensity(_Ctx(), jnp.asarray(0))) == 0.0


def test_proportions_conjugate_resample_concentrates():
    # choose_proportionally.jl:70-74: Dirichlet(prior + counts)
    from pclean_tpu.dists.params import (Proportions, init_proportions_state,
                                         resample_proportions)
    spec = Proportions(1.0)
    st = init_proportions_state(jax.random.PRNGKey(0), spec, 3)
    st = {**st, "counts": jnp.asarray([[997, 2, 1]], dtype=jnp.int32)}
    st = resample_proportions(jax.random.PRNGKey(1), st, spec)
    probs = np.exp(np.asarray(st["log_value"][0]))
    assert probs[0] > 0.9


def test_mean_parameter_posterior():
    # add_noise.jl:74-82 Normal-Normal posterior
    from pclean_tpu.dists.params import Mean, init_mean_state, resample_mean
    spec = Mean(0.0, 10.0)
    st = init_mean_state(jax.random.PRNGKey(0), spec, num_sites=1)
    n, s = 1000, 1000 * 5.0
    st = {**st, "counts": jnp.asarray([[n]], dtype=jnp.int32),
          "sums": jnp.asarray([[s]], dtype=jnp.float32)}
    draws = [float(resample_mean(jax.random.PRNGKey(i), st, spec, [1.0])["value"][0])
             for i in range(20)]
    assert abs(np.mean(draws) - 5.0) < 0.1


def test_prob_parameter_posterior():
    # maybe_swap.jl:87-89 Beta(a + heads, b + tails)
    from pclean_tpu.dists.params import Prob, init_prob_state, resample_prob
    spec = Prob(1.0, 1.0)
    st = init_prob_state(jax.random.PRNGKey(0), spec)
    st = {**st, "heads": jnp.asarray([300]), "tails": jnp.asarray([700])}
    draws = [float(resample_prob(jax.random.PRNGKey(i), st, spec)["value"][0])
             for i in range(20)]
    assert abs(np.mean(draws) - 0.3) < 0.05
