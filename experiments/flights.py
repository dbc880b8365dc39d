"""Flights benchmark: multi-source deduplication with per-source error rates.

Port of the reference experiment (experiments/flights/run.jl): Flight keyed
by @guaranteed flight_id with four TimePrior fields whose atom sets depend on
the latent flight_id; Obs with an indexed learned ProbParameter per tracking
website, a deterministic self-reporting trust rule, and MaybeSwap error
model. Reference config: MH mode, 2 particles, 5 sweeps.
"""
from __future__ import annotations

import time

from common import (dataset_paths, mesh_from_args, report,
                    std_argparser, tile,
                    truncate)

import jax

from pclean_tpu.utils import device_sync
from pclean_tpu.analysis import (evaluate_accuracy,
                                 evaluate_accuracy_device, save_results)
from pclean_tpu.dists import MaybeSwap, Prob, Ref, StringPrior, TimePrior
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig
from pclean_tpu.io import read_csv, unique_values
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

CAPACITIES = {"Flight": 160, "TrackingWebsite": 64}
TIME_FIELDS = ["sched_dep_time", "sched_arr_time", "act_dep_time", "act_arr_time"]


def build_model(websites, flight_ids, times_for_flight):
    b = ModelBuilder()
    with b.cls("TrackingWebsite") as c:
        c.choice("name", StringPrior(2, 30, websites))
    with b.cls("Flight") as c:
        with c.block():
            c.choice("flight_id", StringPrior(10, 20, flight_ids))
            c.guaranteed("flight_id")
        for field, short in zip(TIME_FIELDS, ["sdt", "sat", "adt", "aat"]):
            c.compute_list(
                f"{short}_atoms",
                (lambda fl: (lambda fid: times_for_flight.get(f"{fid}-{fl}", [])))(field),
                ["flight_id"])
            c.choice(short, TimePrior(Ref(f"{short}_atoms")))
    with b.cls("Obs") as c:
        c.learned("error_probs", Prob(10.0, 50.0), indexed=True)
        with c.block():
            c.fk("flight", "Flight")
        c.fk("src", "TrackingWebsite")
        # reference run.jl:28: self-reporting websites are trusted
        c.compute("self_report",
                  lambda s, fid: s.lower() == fid[:2].lower(), ["src.name", "flight.flight_id"])
        c.param_lookup("error_prob", "error_probs", key="src.name",
                       gate="self_report", gate_value=1e-5)
        with c.block():
            for short in ["sdt", "sat", "adt", "aat"]:
                c.choice(short, MaybeSwap(Ref(f"flight.{short}"),
                                          Ref(f"flight.{short}_atoms"),
                                          Ref("error_prob")))
    return b.finish()


QUERY_CLAUSES = [
    ("sched_dep_time", "flight.sdt", "sdt"),
    ("sched_arr_time", "flight.sat", "sat"),
    ("act_dep_time", "flight.adt", "adt"),
    ("act_arr_time", "flight.aat", "aat"),
    ("flight", "flight.flight_id"),
    ("src", "src.name"),
]


def load(rows=None):
    dirty_path, clean_path = dataset_paths("flights")
    dirty = truncate(read_csv(dirty_path), rows)
    clean = truncate(read_csv(clean_path), rows)
    return dirty, clean


def setup(rows=None, repeat=1, sweeps=None, batch=1, particles=None, **cfg):
    """Compiled workload (shared by main() and bench.py): returns
    (cm, config, dirty, clean, query, sweeps); observed class 'Obs'."""
    dirty, clean = load(rows)
    dirty = tile(dirty, repeat)
    clean = tile(clean, repeat)
    websites = unique_values(dirty["src"])
    flight_ids = unique_values(dirty["flight"])
    times_for_flight: dict[str, list] = {}
    for i, fid in enumerate(dirty["flight"]):
        for field in TIME_FIELDS:
            v = dirty[field][i]
            if v is not None:
                times_for_flight.setdefault(f"{fid}-{field}", [])
                if v not in times_for_flight[f"{fid}-{field}"]:
                    times_for_flight[f"{fid}-{field}"].append(v)
    model = build_model(websites, flight_ids, times_for_flight)
    query = Query.build(model, "Obs", QUERY_CLAUSES)
    ds = ObservedDataset(query, dirty)
    sweeps = 5 if sweeps is None else sweeps
    if particles:
        cfg.update(use_mh_instead_of_pg=False, num_particles=particles)
    else:
        cfg.setdefault("use_mh_instead_of_pg", True)
    config = InferenceConfig(num_iters=sweeps, batch_rows=batch, **cfg)
    cm = compile_model(model, [ds], capacities=CAPACITIES)
    return cm, config, dirty, clean, query, sweeps


def main():
    args = std_argparser(__doc__).parse_args()

    t0 = time.time()
    cm, config, dirty, clean, query, sweeps = setup(
        rows=args.rows, repeat=args.repeat, sweeps=args.sweeps,
        batch=args.batch, particles=args.particles)
    arenas, params = init_state(cm, jax.random.PRNGKey(args.seed))
    eng = Engine(cm, config, mesh=mesh_from_args(args))
    key = jax.random.PRNGKey(args.seed + 1)
    arenas, params, key = eng.initialize(key, arenas, params, progress=500)
    arenas, params, key = eng.run(key, arenas, params, progress=1000)
    device_sync(arenas["Obs"]["values"])
    elapsed = time.time() - t0

    if args.checkpoint:
        from pclean_tpu.engine.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint, cm, arenas, params, key)

    results = evaluate_accuracy_device(cm, arenas, params, dirty, clean,
                                       query)
    if args.save:
        save_results(cm, arenas, params, "results", "flights",
                     [ObservedDataset(query, dirty)])
    report("flights", results, elapsed, len(dirty["flight"]), sweeps, args.json)


if __name__ == "__main__":
    main()
