"""Segmented large-workload dispatch paths (fused_dispatch_rows gate).

Above `fused_dispatch_rows`, the drivers switch from the one-dispatch fused
programs to base-offset segmented programs (engine/smc.py::
scan_init_batched / scan_sweep_class_batched / scan_sweep_class) so no
single device dispatch runs unboundedly long. These tests force the gate
low on the toy model and assert the segmented paths reach the same cleaning
quality as the fused ones (key streams differ by construction, so parity is
statistical: same F1 on this deterministic toy posterior)."""
import jax
import numpy as np

from pclean_tpu.analysis import evaluate_accuracy
from pclean_tpu.engine.compile import init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig, _obs_device
from test_engine_smoke import CLEAN, DIRTY, tiny_setup


def _run(cfg):
    cm, q, ds = tiny_setup()
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    eng = Engine(cm, cfg)
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    arenas, params, key = eng.sweep(key, arenas, params)
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    return res["f1"]


def test_segmented_unbatched_sweep_matches_fused():
    fused = _run(InferenceConfig(num_iters=1, rejuv_frequency=1000))
    seg = _run(InferenceConfig(num_iters=1, rejuv_frequency=1000,
                               fused_dispatch_rows=4, scan_segment=4))
    assert seg >= fused - 0.15, (seg, fused)
    assert seg > 0.5


def test_segmented_batched_sweep_matches_fused():
    fused = _run(InferenceConfig(num_iters=1, rejuv_frequency=1000,
                                 batch_rows=4))
    seg = _run(InferenceConfig(num_iters=1, rejuv_frequency=1000,
                               batch_rows=4, fused_dispatch_rows=4,
                               scan_segment=4, batch_segment_rows=4))
    assert seg >= fused - 0.15, (seg, fused)
    assert seg > 0.5
