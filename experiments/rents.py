"""Rents benchmark: continuous + discrete latents with learned means.

Port of the reference experiment (experiments/rents/run.jl): County keyed by
a derived @guaranteed countykey with per-key name possibilities; Obs with an
indexed learned MeanParameter per (state, county, room-type), a
TransformedGaussian rent observation under a latent unit (dollars vs
thousands), and AddTypos(max_typos=2) on county names. Reference config: MH
mode, 2 particles, 1 sweep, rejuv_frequency=500.
"""
from __future__ import annotations

import time

from common import (dataset_paths, mesh_from_args, report,
                    std_argparser, tile,
                    truncate)

import jax
import jax.numpy as jnp

from pclean_tpu.utils import device_sync
from pclean_tpu.analysis import (evaluate_accuracy,
                                 evaluate_accuracy_device, save_results)
from pclean_tpu.dists import (AddTypos, ChooseProportionally, ChooseUniformly,
                              Mean, ParamRef, Proportions, Ref, StringPrior,
                              Transformation, TransformedGaussian, Unmodeled)
from pclean_tpu.engine.compile import compile_model, init_state
from pclean_tpu.engine.smc import Engine, InferenceConfig
from pclean_tpu.io import read_csv, unique_values
from pclean_tpu.model.builder import ModelBuilder
from pclean_tpu.model.query import ObservedDataset, Query

CAPACITIES = {"County": 4096}
ROOM_TYPES = ["studio", "1br", "2br", "3br", "4br"]
UNITS = [Transformation(lambda x: x, lambda x: x, lambda x: 1.0),
         Transformation(lambda x: x / 1000.0, lambda x: x * 1000.0,
                        lambda x: 1.0 / 1000.0)]


def county_key(name: str) -> str:
    """reference load_data.jl:9: first char + last char of the first word."""
    return f"{name[0]}{name.split()[0][-1]}"


def build_model(possibilities, states):
    b = ModelBuilder()
    with b.cls("County") as c:
        c.learned("state_pops", Proportions())
        c.choice("countykey", Unmodeled())
        c.guaranteed("countykey")
        c.compute_list("name_options",
                       lambda k: possibilities.get(k, []), ["countykey"])
        c.choice("name", StringPrior(10, 35, Ref("name_options")))
        c.choice("state", ChooseProportionally(states, ParamRef("state_pops")))
    with b.cls("Obs") as c:
        c.learned("avg_rent", Mean(1500.0, 1000.0), indexed=True)
        c.fk("county", "County")
        c.choice("county_name", AddTypos(Ref("county.name"), 2))
        c.choice("br", ChooseUniformly(ROOM_TYPES))
        c.choice("unit", ChooseUniformly(UNITS))
        c.compute("rent_key", lambda s, k, br: f"{s}_{k}_{br}",
                  ["county.state", "county.countykey", "br"])
        c.param_lookup("rent_base", "avg_rent", key="rent_key")
        c.choice("rent", TransformedGaussian(Ref("rent_base"), 150.0,
                                             Ref("unit")))
        # corrected = round(unit.backward(rent)) (run.jl:26)
        c.compute_jax("corrected",
                      lambda u, r: jnp.round(jnp.where(u == 0, r, r * 1000.0)),
                      ["unit", "rent"])
    return b.finish()


QUERY_CLAUSES = [
    ("CountyKey", "county.countykey"),
    ("County", "county.name", "county_name"),
    ("State", "county.state"),
    ("Room Type", "br"),
    ("Monthly Rent", "corrected", "rent"),
]


def load(rows=None):
    dirty_path, clean_path = dataset_paths("rents")
    dirty = truncate(read_csv(dirty_path), rows)
    clean = truncate(read_csv(clean_path), rows)
    dirty["CountyKey"] = [county_key(x) for x in dirty["County"]]
    return dirty, clean


def setup(rows=None, repeat=1, sweeps=None, batch=1, particles=None, **cfg):
    """Compiled workload (shared by main() and bench.py): returns
    (cm, config, dirty, clean, query, sweeps); observed class 'Obs'."""
    dirty, clean = load(rows)
    dirty = tile(dirty, repeat)
    clean = tile(clean, repeat)
    possibilities: dict[str, list] = {}
    for name in dirty["County"]:
        k = county_key(name)
        possibilities.setdefault(k, [])
        if name not in possibilities[k]:
            possibilities[k].append(name)
    states = unique_values(dirty["State"])
    model = build_model(possibilities, states)
    query = Query.build(model, "Obs", QUERY_CLAUSES)
    ds = ObservedDataset(query, dirty)
    sweeps = 1 if sweeps is None else sweeps
    cfg.setdefault("rejuv_frequency", 500)
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
    arenas, params, key = eng.initialize(key, arenas, params, progress=1000)
    arenas, params, key = eng.run(key, arenas, params, progress=2000)
    device_sync(arenas["Obs"]["values"])
    elapsed = time.time() - t0

    if args.checkpoint:
        from pclean_tpu.engine.checkpoint import save_checkpoint
        save_checkpoint(args.checkpoint, cm, arenas, params, key)

    results = evaluate_accuracy_device(cm, arenas, params, dirty, clean,
                                       query)
    if args.save:
        save_results(cm, arenas, params, "results", "rents",
                     [ObservedDataset(query, dirty)])
    report("rents", results, elapsed, len(dirty["County"]), sweeps, args.json)


if __name__ == "__main__":
    main()
