import jax
import numpy as np
import pytest

from pclean_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig

from test_engine_smoke import tiny_setup


def test_checkpoint_roundtrip(tmp_path):
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=1000))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas, params)

    path = str(tmp_path / "state.npz")
    save_checkpoint(path, cm, arenas, params, key, meta={"sweeps_done": 0})
    a2, p2, k2, meta = load_checkpoint(path, cm)
    assert meta["sweeps_done"] == 0
    for cid in arenas:
        for vid in arenas[cid]["values"]:
            np.testing.assert_array_equal(np.asarray(arenas[cid]["values"][vid]),
                                          np.asarray(a2[cid]["values"][vid]))
    # resumed state continues running
    a3, p3, k3 = eng.run(k2, a2, p2)


def test_checkpoint_fingerprint_mismatch(tmp_path):
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    path = str(tmp_path / "state.npz")
    save_checkpoint(path, cm, arenas, params, jax.random.PRNGKey(0))
    cm2, _, _ = tiny_setup(capacity=4)  # different capacity -> new fingerprint
    with pytest.raises(ValueError):
        load_checkpoint(path, cm2)
    a, p, k, m = load_checkpoint(path, cm2, strict=False)
