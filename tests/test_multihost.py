"""Genuine multi-process jax.distributed run (2 CPU processes x 4 virtual
devices): the cross-process collective path the 8-virtual-device
single-process mesh cannot exercise. Launches scripts/multihost_cpu_demo.sh,
which runs the sharded engine end-to-end in both processes and asserts each
converges to identical replicated arenas (reference contrast: the Julia
engine is single-threaded, inference.jl:60-81 — no counterpart)."""
from __future__ import annotations

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_demo(nproc: int, port: str):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "_PCLEAN_TEST_REEXEC")}
    env["PORT"] = port
    env["NPROC"] = str(nproc)
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "multihost_cpu_demo.sh")],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    # regex over the raw stream: the processes' unbuffered prints can
    # interleave on one line, so splitting on newlines is flaky
    import re
    fps = re.findall(r"fingerprint\s*([0-9.eE+-]+)", out.stdout)
    assert len(fps) == nproc, out.stdout
    assert len(set(fps)) == 1, f"processes diverged: {fps}"
    assert out.stdout.count("MULTIHOST OK") == nproc


@pytest.mark.slow
def test_two_process_multihost_demo():
    _run_demo(2, "7641")


@pytest.mark.slow
def test_four_process_multihost_demo():
    """4 processes x 2 virtual devices (VERDICT r3 item 8): exercises the
    DCN-major mesh layout + host_local_data feeding with per-process
    device blocks smaller than the single-process dryrun's, end-to-end
    through the sharded init+sweep drivers."""
    _run_demo(4, "7647")
