"""Sharded engine tests on the 8-virtual-device CPU mesh (conftest.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig, _obs_device
from pclean_tpu.parallel import ShardedEngine, make_mesh

from test_engine_smoke import tiny_setup, DIRTY, CLEAN


@pytest.fixture(scope="module")
def warm_state():
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    return cm, q, eng, arenas, params, key


def test_sharded_rejuv_matches_semantics(warm_state):
    cm, q, eng, arenas, params, key = warm_state
    assert len(jax.devices()) >= 8
    mesh = make_mesh(4, 2)
    sh = ShardedEngine(eng, mesh)
    step = sh.sharded_rejuv_step("Row")
    slots = jnp.arange(8)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    arenas2, birthy = step(arenas, params, slots, keys)
    # arenas remain well-formed; relational invariants hold
    rel = refresh(cm, arenas2, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    assert birthy.shape == (8,)


def test_sharded_pg_rejuv_runs(warm_state):
    cm, q, eng, arenas, params, key = warm_state
    mesh = make_mesh(4, 2)
    sh = ShardedEngine(eng, mesh)
    step = sh.sharded_pg_rejuv_step("Row", n_particles_per_dev=2)
    slots = jnp.arange(8)
    keys = jax.random.split(jax.random.PRNGKey(11), 8 * 4).reshape(8, 4, 2)
    sel = jax.random.split(jax.random.PRNGKey(12), 8)
    arenas2, birthy = step(arenas, params, slots, keys, sel)
    # relational invariants hold after the particle-sharded CSMC pass
    rel = refresh(cm, arenas2, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    assert birthy.shape == (8,)
    # observed values stay pinned to the dataset (CSMC rewrites latents only)
    spec = cm.obs_specs[0]
    for vid, (codes, state) in spec.columns.items():
        if vid not in arenas2["Row"]["values"]:
            continue
        got = np.asarray(arenas2["Row"]["values"][vid])[: len(DIRTY)]
        obs_mask = np.asarray(state)[: len(DIRTY)] == 1
        want = np.asarray(codes)[: len(DIRTY)]
        assert np.array_equal(got[obs_mask], want[obs_mask])


def test_sharded_pg_init_runs(warm_state):
    cm, q, eng, arenas0, params, key = warm_state
    mesh = make_mesh(4, 2)
    sh = ShardedEngine(eng, mesh)
    # re-init from empty arenas with 2-device x 2-particle selection
    arenas, params2 = init_state(cm, jax.random.PRNGKey(7))
    step = sh.sharded_pg_init_step("Row", n_particles_per_dev=2)
    slots = jnp.arange(8)
    keys = jax.random.split(jax.random.PRNGKey(5), 8 * 4).reshape(8, 4, 2)
    sel = jax.random.split(jax.random.PRNGKey(6), 8)
    arenas, birthy = step(arenas, params2, slots, keys, sel)
    done = np.asarray(arenas["Row"]["alive"])[:8]
    flagged = np.asarray(birthy)
    # every non-birthing row was incorporated
    assert np.all(done[~flagged])
