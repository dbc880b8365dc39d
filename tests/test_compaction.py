"""Referrer compaction (compile._referrer_bounds + Engine._ref_comp +
the compacted referrer axis in propose.score_external).

Hash-keyed latent classes bound each slot's referrer count by the largest
key multiplicity in the data, so external likelihoods can run over an
[R]-length compacted index list instead of the full source capacity — the
rents County sweep cost (50k-wide per-slot externals) collapses ~30x.
These tests check (a) the index lists match a host-side groupby and (b)
proposal scores with and without compaction agree."""
import jax
import jax.numpy as jnp
import numpy as np

from pclean_tpu.dists import AddTypos, Ref, StringPrior, Unmodeled
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

NAMES = ["alder", "birch", "cedar", "dogwood"]


def _setup(n_rows=24):
    rng = np.random.RandomState(0)
    keys, names = [], []
    for i in range(n_rows):
        j = rng.randint(len(NAMES))
        keys.append(NAMES[j][0])
        nm = NAMES[j]
        if rng.rand() < 0.3:  # typo
            nm = nm[:-1] + "x"
        names.append(nm)
    b = ModelBuilder()
    with b.cls("County") as c:
        c.choice("key", Unmodeled())
        c.guaranteed("key")
        c.choice("name", StringPrior(1, 12, NAMES))
    with b.cls("Row") as c:
        c.fk("county", "County")
        c.choice("name_obs", AddTypos(Ref("county.name")))
    model = b.finish()
    q = Query.build(model, "Row", [("key", "county.key"),
                                   ("name", "county.name", "name_obs")])
    ds = ObservedDataset(q, {"key": keys, "name": names})
    cm = compile_model(model, [ds], capacities={"County": 16})
    return cm, q


def test_ref_comp_matches_groupby():
    cm, q = _setup()
    # tiny data never qualifies on its own; force a bound
    path = next(iter(cm.cls("County").incoming_references))
    cm.ref_bounds = {path: 16}
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    rel = jax.jit(lambda a: refresh(cm, a, eng.obs_dev))(arenas)
    comp = eng._ref_comp("County", arenas, rel)
    assert path in comp
    idx, cnt = np.asarray(comp[path][0]), np.asarray(comp[path][1])
    src, fkv = path[0]
    t = np.asarray(arenas[src]["values"][fkv])
    alive = np.asarray(rel[src]["alive"])
    cap = cm.layouts["County"].capacity
    Cs = cm.layouts[src].capacity
    for slot in range(cap):
        want = sorted(np.flatnonzero(alive & (t == slot)))
        assert cnt[slot] == len(want)
        got = sorted(idx[slot][: len(want)])
        assert got == want, (slot, got, want)
        assert np.all(idx[slot][len(want):] == Cs)


def test_compacted_scores_match_dense():
    cm, q = _setup()
    path = next(iter(cm.cls("County").incoming_references))
    cm.ref_bounds = {path: 16}
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    rel = jax.jit(lambda a: refresh(cm, a, eng.obs_dev))(arenas)
    comp = eng._ref_comp("County", arenas, rel)
    k = jax.random.PRNGKey(7)
    for slot in range(4):
        w_dense = eng._propose_packed("County", arenas, rel, params,
                                      jnp.int32(slot), k, False)[1]
        w_comp = eng._propose_packed("County", arenas, rel, params,
                                     jnp.int32(slot), k, False,
                                     ref_comp=comp)[1]
        np.testing.assert_allclose(np.asarray(w_dense), np.asarray(w_comp),
                                   rtol=1e-5, atol=1e-5)


def test_rents_shape_gets_bounds():
    """Enough rows spread over enough keys qualifies automatically."""
    rng = np.random.RandomState(2)
    n = 8000
    letters = "abcdefghijklmnop"
    keys = [letters[rng.randint(16)] for _ in range(n)]
    names = [NAMES[letters.index(k) % 4] for k in keys]
    b = ModelBuilder()
    with b.cls("County") as c:
        c.choice("key", Unmodeled())
        c.guaranteed("key")
        c.choice("name", StringPrior(1, 12, NAMES))
    with b.cls("Row") as c:
        c.fk("county", "County")
        c.choice("name_obs", AddTypos(Ref("county.name")))
    model = b.finish()
    q = Query.build(model, "Row", [("key", "county.key"),
                                   ("name", "county.name", "name_obs")])
    ds = ObservedDataset(q, {"key": keys, "name": names})
    cm = compile_model(model, [ds], capacities={"County": 64})
    assert cm.ref_bounds, "expected an automatic referrer bound"
    (path, R), = cm.ref_bounds.items()
    assert R < n // 4, R
