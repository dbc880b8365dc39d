"""Hospital benchmark: 7-class relational model with typo error model.

Port of the reference experiment (experiments/hospital/run.jl:5-85) to the
pclean_tpu Python DSL: County -> Place -> Hospital <- HospitalType,
Condition -> Measure, Record referencing Hospital & Measure with slot chains
three deep (hosp.loc.county.state) and AddTypos on all 15 observed fields.
Reference config: MH mode, 2 particles, 1 rejuvenation sweep.
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
from pclean_tpu.dists import (AddTypos, ChooseProportionally, ChooseUniformly,
                              ParamRef, Proportions, Ref, StringPrior)
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig
from pclean_tpu.io import possibilities_from, read_csv
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

CAPACITIES = {"County": 128, "Place": 256, "Condition": 64, "Measure": 128,
              "HospitalType": 64, "Hospital": 512}


def build_model(poss):
    b = ModelBuilder()
    with b.cls("County") as c:
        c.learned("state_proportions", Proportions())
        c.choice("state", ChooseProportionally(poss["State"],
                                               ParamRef("state_proportions")))
        c.choice("county", StringPrior(3, 30, poss["CountyName"]))
    with b.cls("Place") as c:
        c.fk("county", "County")
        c.choice("city", StringPrior(3, 30, poss["City"]))
    with b.cls("Condition") as c:
        c.choice("desc", StringPrior(5, 35, poss["Condition"]))
    with b.cls("Measure") as c:
        c.choice("code", ChooseUniformly(poss["MeasureCode"]))
        c.choice("name", ChooseUniformly(poss["MeasureName"]))
        c.fk("condition", "Condition")
    with b.cls("HospitalType") as c:
        c.choice("desc", StringPrior(10, 30, poss["HospitalType"]))
    with b.cls("Hospital") as c:
        c.learned("owner_dist", Proportions())
        c.learned("service_dist", Proportions())
        c.fk("loc", "Place")
        c.fk("type", "HospitalType")
        c.choice("provider", ChooseUniformly(poss["ProviderNumber"]))
        c.choice("name", StringPrior(3, 50, poss["HospitalName"]))
        c.choice("addr", StringPrior(10, 30, poss["Address1"]))
        c.choice("phone", StringPrior(10, 10, poss["PhoneNumber"]))
        c.choice("owner", ChooseProportionally(poss["HospitalOwner"],
                                               ParamRef("owner_dist")))
        c.choice("zip", ChooseUniformly(poss["ZipCode"]))
        c.choice("service", ChooseProportionally(poss["EmergencyService"],
                                                 ParamRef("service_dist")))
    with b.cls("Record") as c:
        with c.block():
            c.fk("hosp", "Hospital")
            c.choice("service", AddTypos(Ref("hosp.service")))
            c.choice("provider", AddTypos(Ref("hosp.provider")))
            c.choice("name", AddTypos(Ref("hosp.name")))
            c.choice("addr", AddTypos(Ref("hosp.addr")))
            c.choice("city", AddTypos(Ref("hosp.loc.city")))
            c.choice("state", AddTypos(Ref("hosp.loc.county.state")))
            c.choice("zip", AddTypos(Ref("hosp.zip")))
            c.choice("county", AddTypos(Ref("hosp.loc.county.county")))
            c.choice("phone", AddTypos(Ref("hosp.phone")))
            c.choice("type", AddTypos(Ref("hosp.type.desc")))
            c.choice("owner", AddTypos(Ref("hosp.owner")))
        with c.block():
            c.fk("metric", "Measure")
            c.choice("code", AddTypos(Ref("metric.code")))
            c.choice("mname", AddTypos(Ref("metric.name")))
            c.choice("condition", AddTypos(Ref("metric.condition.desc")))
            c.compute("stateavg", lambda s, code: f"{s}_{code}",
                      ["hosp.loc.county.state", "metric.code"])
            c.choice("stateavg_obs", AddTypos(Ref("stateavg")))
    return b.finish()


QUERY_CLAUSES = [
    ("ProviderNumber", "hosp.provider", "provider"),
    ("HospitalName", "hosp.name", "name"),
    ("HospitalType", "hosp.type.desc", "type"),
    ("HospitalOwner", "hosp.owner", "owner"),
    ("Address1", "hosp.addr", "addr"),
    ("PhoneNumber", "hosp.phone", "phone"),
    ("EmergencyService", "hosp.service", "service"),
    ("City", "hosp.loc.city", "city"),
    ("CountyName", "hosp.loc.county.county", "county"),
    ("State", "hosp.loc.county.state", "state"),
    ("ZipCode", "hosp.zip", "zip"),
    ("Condition", "metric.condition.desc", "condition"),
    ("MeasureCode", "metric.code", "code"),
    ("MeasureName", "metric.name", "mname"),
    ("Stateavg", "stateavg", "stateavg_obs"),
]


def load(rows=None):
    dirty_path, clean_path = dataset_paths("hospital")
    dirty = truncate(read_csv(dirty_path), rows)
    clean = truncate(read_csv(clean_path), rows)
    # Julia stringifies the clean numeric columns for comparison
    # (reference load_data.jl:8-15)
    for col in ("PhoneNumber", "ZipCode", "ProviderNumber"):
        clean[col] = [None if v is None else str(v) for v in clean[col]]
    return dirty, clean


def setup(rows=None, repeat=1, sweeps=None, batch=1, particles=None, **cfg):
    """Compiled workload (shared by main() and bench.py): returns
    (cm, config, dirty, clean, query, sweeps); observed class 'Record'.
    particles=N switches to particle-Gibbs with N vmapped particles
    (reference PG mode, row_inference.jl:164; BASELINE.md 1,024-particle
    scaled config)."""
    dirty, clean = load(rows)
    dirty = tile(dirty, repeat)
    clean = tile(clean, repeat)
    poss = possibilities_from(dirty)
    model = build_model(poss)
    query = Query.build(model, "Record", QUERY_CLAUSES)
    ds = ObservedDataset(query, dirty)
    sweeps = 1 if sweeps is None else sweeps
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
    arenas, params, key = eng.initialize(key, arenas, params, progress=100)
    arenas, params, key = eng.run(key, arenas, params, progress=100)
    device_sync(arenas["Record"]["values"])
    elapsed = time.time() - t0

    if args.checkpoint:
        from pclean_tpu.engine.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint, cm, arenas, params, key)

    results = evaluate_accuracy_device(cm, arenas, params, dirty, clean,
                                       query)
    if args.save:
        save_results(cm, arenas, params, "results", "hospital",
                     [ObservedDataset(query, dirty)])
    report("hospital", results, elapsed, len(dirty["State"]), sweeps, args.json)


if __name__ == "__main__":
    main()
