"""Op-category x shape-volume histogram over a compiled sweep program.

Lowers one workload's batched class-sweep program (the hot path), compiles
it, and rolls the optimized HLO up by opcode with total operand+result byte
volume — the closest thing to an op-level profile available without device
trace support (tunneled PJRT returns no device events; PROFILE.md Method).

Usage: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/hlo_breakdown.py \
           [--workload hospital] [--rows 1000] [--batch 64] [--cls Record] [--top 25]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "experiments"))

DT_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
            "s64": 8, "u64": 8, "s8": 1, "u8": 1, "pred": 1, "s16": 2,
            "u16": 2, "c64": 8, "tuple": 0, "token": 0, "opaque": 0}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{[\d,]*\})?")
OP_RE = re.compile(r"=\s+((?:\([^)]*\)|[\w\[\]{},.\d])+\s+)?([a-z][a-z\-]*)\(")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        b = DT_BYTES.get(dt)
        if b is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * b
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="hospital")
    ap.add_argument("--rows", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--cls", default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    import jax

    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine

    import importlib
    mod = importlib.import_module(args.workload)
    cm, config, dirty, clean, query, sweeps = mod.setup(
        rows=args.rows, batch=args.batch, repeat=args.repeat)
    eng = Engine(cm, config)
    eng._aot.wrap = lambda nm, fn: fn
    arenas, params = init_state(cm, jax.random.PRNGKey(0))

    cids = [args.cls] if args.cls else cm.model.class_order
    for cid in cids:
        if args.batch > 1:
            run, nb, seg_b = eng.scan_sweep_class_batched(cid, args.batch)
            a = (arenas, params, 0,
                 jax.random.split(jax.random.PRNGKey(7), seg_b * args.batch),
                 eng._interned_dev)
        else:
            run, seg = eng.scan_sweep_class(cid)
            a = (arenas, params, 0,
                 jax.random.split(jax.random.PRNGKey(7), seg),
                 eng._interned_dev)
        comp = run._wrapped.lower(*a).compile()
        hlo = comp.as_text()
        by_op: dict[str, list] = defaultdict(lambda: [0, 0])
        biggest: list[tuple[int, str]] = []
        for line in hlo.splitlines():
            line = line.strip()
            m = OP_RE.search(line)
            if not m or " = " not in line:
                continue
            op = m.group(2)
            if op in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast", "while", "call"):
                continue
            shape_txt = m.group(1) or ""
            vol = shape_bytes(shape_txt)
            by_op[op][0] += 1
            by_op[op][1] += vol
            biggest.append((vol, line[:200]))
        print(f"\n=== {args.workload} sweep[{cid}] B={args.batch} "
              f"rows={args.rows} ===")
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        print(f"cost model: flops={ca.get('flops', 0)/1e9:.2f} G  "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB")
        rows = sorted(by_op.items(), key=lambda kv: -kv[1][1])[:args.top]
        for op, (n, vol) in rows:
            print(f"  {op:28s} n={n:5d}  result-bytes={vol/1e6:10.2f} MB")
        print("  -- biggest single results --")
        for vol, line in sorted(biggest, reverse=True)[:10]:
            print(f"  {vol/1e6:8.2f} MB  {line}")


if __name__ == "__main__":
    main()
