"""Shared helpers for the bundled experiments (reference experiments/*)."""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.environ.get("PCLEAN_DATA_DIR", "/root/reference/datasets")


def dataset_paths(name: str) -> tuple[str, str]:
    return (os.path.join(DATA_DIR, f"{name}_dirty.csv"),
            os.path.join(DATA_DIR, f"{name}_clean.csv"))


def std_argparser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--rows", type=int, default=None,
                   help="truncate the dataset to N rows (smoke testing)")
    p.add_argument("--sweeps", type=int, default=None,
                   help="override number of rejuvenation sweeps")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save", action="store_true", help="export result CSVs")
    p.add_argument("--json", action="store_true",
                   help="print one JSON line with metrics")
    p.add_argument("--batch", type=int, default=1,
                   help="rows per device dispatch (blocked-Gibbs batching)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="save inference state to this .npz before evaluation")
    p.add_argument("--repeat", type=int, default=1,
                   help="tile the dataset N times (synthetic scaling runs)")
    p.add_argument("--particles", type=int, default=None,
                   help="run particle-Gibbs with N vmapped particles instead "
                        "of the reference MH config (BASELINE.md scaled runs)")
    p.add_argument("--shard", type=int, default=0,
                   help="shard rows over an N-device data mesh (the batched "
                        "drivers run under shard_map; requires --batch "
                        "divisible by N)")
    return p


def mesh_from_args(args):
    """Data mesh for Engine(mesh=...) when --shard is given, else None.
    The same script then runs identically on one chip, an ICI slice, or
    (after parallel.initialize_multihost) a multi-host pod."""
    if not getattr(args, "shard", 0):
        return None
    if args.batch % args.shard != 0:
        raise SystemExit("--batch must be divisible by --shard "
                         f"(got {args.batch} % {args.shard})")
    from pclean_tpu.parallel import make_mesh
    return make_mesh(args.shard, 1)


def truncate(data: dict, n) -> dict:
    if n is None:
        return data
    return {k: v[:n] for k, v in data.items()}


def tile(data: dict, times: int) -> dict:
    """Synthetic scaling: repeat the dataset row block N times
    (BASELINE.md: 'hospital scaled to 100k synthetic rows')."""
    if times <= 1:
        return data
    return {k: list(v) * times for k, v in data.items()}


def report(name: str, results: dict, elapsed: float, n_rows: int,
           sweeps: int, as_json: bool) -> None:
    rows_per_sec = n_rows * (1 + sweeps) / elapsed if elapsed > 0 else 0.0
    line = dict(experiment=name, elapsed_sec=round(elapsed, 2),
                rows=n_rows, sweeps=sweeps,
                rows_cleaned_per_sec=round(rows_per_sec, 2), **results)
    if as_json:
        print(json.dumps(line))
    else:
        print(line)
