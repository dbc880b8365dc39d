"""Multi-host plumbing tests (single-process paths; the 8 virtual devices
stand in for a pod's chips — conftest.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from pclean_tpu.parallel import (host_local_data, initialize_multihost,
                                 make_multihost_mesh, replicate)
from pclean_tpu.parallel.dist import Mesh


def test_initialize_multihost_single_process_noop():
    assert initialize_multihost() is False
    assert jax.process_count() == 1


def test_make_multihost_mesh_axes_and_layout():
    mesh = make_multihost_mesh(n_particle=2)
    assert mesh.axis_names == ("data", "particle")
    assert mesh.shape["data"] == 4 and mesh.shape["particle"] == 2
    # data axis is process/DCN-major: device order is jax.devices() order
    flat = list(np.array(mesh.devices).reshape(-1))
    assert flat == jax.devices()


def test_host_local_data_and_replicate_roundtrip():
    mesh = make_multihost_mesh(n_particle=1)
    x = np.arange(16, dtype=np.int32)
    g = host_local_data(mesh, x)
    assert np.array_equal(np.asarray(g), x)
    tree = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    r = replicate(mesh, tree)
    assert np.asarray(r["a"]).shape == (3,)


def test_multihost_mesh_drives_sharded_engine():
    """The DCN-major mesh slots straight into ShardedEngine's drivers."""
    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine, InferenceConfig
    from test_engine_smoke import tiny_setup

    cm, q, ds = tiny_setup()
    mesh = make_multihost_mesh(n_particle=1)
    eng = Engine(cm, InferenceConfig(num_iters=1, batch_rows=8,
                                     rejuv_frequency=1000), mesh=mesh)
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    arenas, params, key = eng.sweep(key, arenas, params)
    alive = np.asarray(arenas["Row"]["alive"])
    assert alive[: len(__import__("test_engine_smoke").DIRTY)].all()
