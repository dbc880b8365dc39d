"""Quantify same-batch co-reference blindness in isolation (VERDICT r3
item 7).

After per-row self-exclusion (test_batch_exclude.py) removed the one-count
Pitman-Yor bias, the ONE remaining batched-Gibbs approximation is
co-reference blindness: rows of the same batch are scored against a shared
frozen snapshot, so none of them sees the others' in-batch moves
(engine/smc.py InferenceConfig.batch_rows notes). The effect to bound is on
the ENTITY-CLUSTERING posterior: sequential Gibbs cascades within a sweep
(a row that joins an entity makes it more attractive for the next row —
the rich-get-richer dynamics of the PY posterior), while a blind batch
moves every row against the stale counts, which holds fragmented states
longer.

The measurement: a dataset whose posterior is a genuine mixture over
fragmentations (two observed values, typo model noisy enough that merging
and splitting both happen), run to equilibrium under B=1 (exact sequential
scan) and B=n_rows (maximal blindness: the whole dataset in one blind
batch), multi-seed, with self-exclusion ON. Both the mean live-entity
count and the pairwise co-reference rate must agree within a tolerance
that would CATCH a gross approximation failure (entity-count bias > ~15%)
while absorbing Monte-Carlo noise. Entity births stay exact in both paths
(birthy rows replay sequentially), so the comparison isolates pure
between-entity movement blindness."""
from __future__ import annotations

import jax
import numpy as np

from pclean_tpu.dists import AddTypos, ChooseUniformly, Ref
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.refresh import refresh
from pclean_tpu.engine.smc import Engine, InferenceConfig, _obs_device

NAMES = ["alice", "alise", "bob"]
DIRTY = ["alice", "alice", "alise", "alice", "alise", "alice", "bob", "bob"]


def _model():
    from pclean_tpu.model.builder import ModelBuilder
    from pclean_tpu.model.query import ObservedDataset, Query

    b = ModelBuilder()
    # The chains must genuinely mix between merged and fragmented states
    # for the comparison to discriminate: a flat ChooseUniformly latent
    # prior (a StringPrior's language-model mass makes fresh entities
    # ~e^-10 unlikely and no chain ever fragments) plus a strong PY
    # strength keeps the fresh-entity branch competitive, and the 1-edit
    # pair alice/alise keeps cross-cluster moves live.
    with b.cls("Obj", py_strength=4.0) as c:
        c.choice("name", ChooseUniformly(NAMES))
    with b.cls("Row") as c:
        c.fk("obj", "Obj")
        c.choice("name_obs", AddTypos(Ref("obj.name")))
    model = b.finish()
    q = Query.build(model, "Row", [("name", "obj.name", "name_obs")])
    cm = compile_model(model, [ObservedDataset(q, {"name": DIRTY})],
                       capacities={"Obj": 16})
    return cm


def _chain_stats(cm, batch: int, seed: int, sweeps: int = 40):
    eng = Engine(cm, InferenceConfig(num_iters=1, rejuv_frequency=10_000,
                                     batch_rows=batch,
                                     batch_self_exclude=True))
    arenas, params = init_state(cm, jax.random.PRNGKey(seed))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(seed + 100),
                                         arenas, params)
    obs_dev = _obs_device(cm)
    fkv = cm.layouts["Row"].fk_vertices[0]
    n_ent, coref = [], []
    for _ in range(sweeps):
        arenas, params, key = eng.sweep(key, arenas, params)
        rel = refresh(cm, arenas, obs_dev)
        n_ent.append(float(np.asarray(rel["Obj"]["nrows"])))
        fks = np.asarray(arenas["Row"]["values"][fkv])
        same = (fks[:, None] == fks[None, :])
        iu = np.triu_indices(len(DIRTY), k=1)
        coref.append(float(same[iu].mean()))
    # drop burn-in half
    h = len(n_ent) // 2
    return float(np.mean(n_ent[h:])), float(np.mean(coref[h:]))


def test_coref_blindness_bounded():
    cm = _model()
    seeds = [0, 1, 2]
    seq = np.array([_chain_stats(cm, 1, s) for s in seeds])
    blind = np.array([_chain_stats(cm, len(DIRTY), s) for s in seeds])
    ent_seq, ent_blind = seq[:, 0].mean(), blind[:, 0].mean()
    cr_seq, cr_blind = seq[:, 1].mean(), blind[:, 1].mean()
    # equilibrium entity counts / co-reference rates must agree within a
    # margin that catches a gross blindness artifact (e.g. persistent
    # fragmentation) while absorbing 3-seed Monte-Carlo noise
    assert abs(ent_blind - ent_seq) <= max(0.5, 0.2 * ent_seq), \
        (ent_seq, ent_blind)
    assert abs(cr_blind - cr_seq) <= 0.15, (cr_seq, cr_blind)
    print(f"coref-blindness: entities seq={ent_seq:.3f} "
          f"blind={ent_blind:.3f}; coref seq={cr_seq:.3f} "
          f"blind={cr_blind:.3f}")
