"""Warm wall-clock of one class's batched sweep program (CPU or TPU).

Usage: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/time_sweep.py \
           [--workload hospital] [--rows 20000] [--batch 64] [--cls Record] \
           [--repeats 3] [--init]
"""
from __future__ import annotations

import argparse
import importlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "experiments"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="hospital")
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cls", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--init", action="store_true",
                    help="also time the batched init program")
    ap.add_argument("--cfg", action="append", default=[],
                    help="InferenceConfig overrides, e.g. --cfg batch_self_exclude=False")
    args = ap.parse_args()

    import jax

    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine
    from pclean_tpu.utils import device_sync

    import ast
    over = {}
    for kv in args.cfg:
        k, v = kv.split("=", 1)
        over[k] = ast.literal_eval(v)
    mod = importlib.import_module(args.workload)
    cm, config, dirty, clean, query, sweeps = mod.setup(
        rows=args.rows, batch=args.batch, repeat=args.repeat, **over)
    eng = Engine(cm, config)
    eng._aot.wrap = lambda nm, fn: fn
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    t0 = time.time()
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas, params)
    device_sync(arenas)
    print(f"init wall: {time.time() - t0:.2f}s")

    B = max(1, config.batch_rows)
    cids = [args.cls] if args.cls else cm.model.class_order
    for cid in cids:
        run, nb, seg_b = eng.scan_sweep_class_batched(cid, B)
        a = (arenas, params, 0,
             jax.random.split(jax.random.PRNGKey(7), seg_b * B))
        r = run(*a)  # warm
        device_sync(r[0])
        t0 = time.time()
        for i in range(args.repeats):
            r = run(arenas, params, 0,
                    jax.random.split(jax.random.PRNGKey(13 + i), seg_b * B))
        device_sync(r[0])
        wall = (time.time() - t0) / args.repeats
        rows_disp = seg_b * B
        print(f"sweep[{cid}] B={B} seg_b={seg_b}: {wall*1e3:.1f} ms/dispatch "
              f"({wall/seg_b*1e3:.2f} ms/step, {rows_disp/wall:.0f} rows/s, "
              f"{nb} batches => {(nb + seg_b - 1)//seg_b} dispatches/pass)")
    if args.init:
        spec = cm.obs_specs[0]
        run, nb, seg_b = eng.scan_init_batched(spec.class_id, spec.num_rows, B)
        a2, p2 = init_state(cm, jax.random.PRNGKey(0))
        r = run(a2, p2, 0, jax.random.split(jax.random.PRNGKey(7), seg_b * B))
        device_sync(r[0])
        t0 = time.time()
        for i in range(args.repeats):
            r = run(a2, p2, 0,
                    jax.random.split(jax.random.PRNGKey(13 + i), seg_b * B))
        device_sync(r[0])
        wall = (time.time() - t0) / args.repeats
        print(f"init[{spec.class_id}] B={B} seg_b={seg_b}: "
              f"{wall*1e3:.1f} ms/dispatch ({wall/seg_b*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()
