"""Auto-capacity HBM safety (VERDICT r4 item 8).

The distinct-joint-signature bound in compile._auto_capacities over-counts
entities when typo variants multiply across columns (the scaled-1M first
attempt auto-sized Hospital to ~110k slots and OOM-killed the TPU worker
via a multi-GB hoisted referrer histogram). The auto path must cap the
capacity against an HBM hoist budget and warn loudly; explicit capacities
stay uncapped (a user stating their scale wins).
"""
import warnings

import pytest

from pclean_tpu.dists import AddTypos, ChooseUniformly, Ref
from pclean_tpu.engine.compile import compile_model
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query


def _pathological(n_rows=512, n_vals=400):
    """Every row a distinct joint signature over two columns: the
    signature bound equals the row count — far beyond the true entity
    count of a plausible latent DB."""
    a = [f"alpha{i:04d}" for i in range(n_vals)]
    b = [f"beta{i:04d}" for i in range(n_vals)]
    dirty = {"x": [a[i % n_vals] + str(i) for i in range(n_rows)],
             "y": [b[(i * 7) % n_vals] + str(i) for i in range(n_rows)]}
    bld = ModelBuilder()
    with bld.cls("Obj") as c:
        c.choice("x", ChooseUniformly(sorted(set(dirty["x"]))))
        c.choice("y", ChooseUniformly(sorted(set(dirty["y"]))))
    with bld.cls("Row") as c:
        c.fk("o", "Obj")
        c.choice("x_obs", AddTypos(Ref("o.x"), 2))
        c.choice("y_obs", AddTypos(Ref("o.y"), 2))
    model = bld.finish()
    q = Query.build(model, "Row", [("x", "o.x", "x_obs"),
                                   ("y", "o.y", "y_obs")])
    return model, q, dirty


def test_auto_capacity_capped_with_warning(monkeypatch):
    model, q, dirty = _pathological()
    # tiny budget so the cap triggers at test scale: 512 signatures x
    # ~1024 vocab cells x 4B ≈ 2 MB/slot-col >> 64 KB budget
    monkeypatch.setenv("PCLEAN_AUTO_CAP_HBM", str(64 * 1024))
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cm = compile_model(model, [ObservedDataset(q, dirty)],
                           auto_capacities=True)
    assert any("HBM hoist budget" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]
    assert cm.layouts["Obj"].capacity <= 128  # capped, 64-aligned


def test_explicit_capacity_never_capped(monkeypatch):
    model, q, dirty = _pathological()
    monkeypatch.setenv("PCLEAN_AUTO_CAP_HBM", str(64 * 1024))
    cm = compile_model(model, [ObservedDataset(q, dirty)],
                       capacities={"Obj": 2048}, auto_capacities=True)
    assert cm.layouts["Obj"].capacity == 2048


def test_auto_capacity_default_budget_holds_normal_data():
    """At the default budget, a normal-scale dataset is NOT capped (the
    signature bound itself applies)."""
    model, q, dirty = _pathological(n_rows=64, n_vals=40)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        cm = compile_model(model, [ObservedDataset(q, dirty)],
                           auto_capacities=True)
    assert not any("HBM hoist budget" in str(w.message) for w in rec)
    assert cm.layouts["Obj"].capacity >= 64
