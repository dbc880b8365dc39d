"""Two-process multi-host demo on CPU: the real jax.distributed path.

Launch (scripts/multihost_cpu_demo.sh does both):

    PCLEAN_COORDINATOR=localhost:7621 PCLEAN_NUM_PROCESSES=2 \
    PCLEAN_PROCESS_ID=0 python scripts/multihost_cpu_demo.py &
    ... PCLEAN_PROCESS_ID=1 python scripts/multihost_cpu_demo.py

Each process owns 4 virtual CPU devices (8 global), so the DCN-major
('data', 'particle') mesh spans two "hosts" exactly like a 2-slice pod:
process 0 holds data rows 0..B/2, process 1 the rest, and the arena
psum-reconcile crosses the process boundary — the collective the driver
cannot exercise in its single-process dryrun. Verifies that both processes
converge to identical replicated arenas (printed fingerprint must match).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

# NOTE: JAX_PLATFORMS=cpu / PALLAS_AXON_POOL_IPS= / XLA_FLAGS must come from
# the launching shell (multihost_cpu_demo.sh) — the container's sitecustomize
# registers the TPU plugin at interpreter startup, before this line runs.
assert os.environ.get("JAX_PLATFORMS") == "cpu", \
    "launch via scripts/multihost_cpu_demo.sh (env must pre-date python)"

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from pclean_tpu.parallel import initialize_multihost, make_multihost_mesh

    n_proc = int(os.environ["PCLEAN_NUM_PROCESSES"])
    active = initialize_multihost()
    pid = jax.process_index()
    assert active, f"expected a {n_proc}-process world (set PCLEAN_* env vars)"
    assert jax.process_count() == n_proc
    assert jax.device_count() == 8 and \
        len(jax.local_devices()) == 8 // n_proc

    from pclean_tpu.engine.compile import init_state
    from pclean_tpu.engine.smc import Engine, InferenceConfig
    from test_engine_smoke import tiny_setup

    cm, q, ds = tiny_setup()
    mesh = make_multihost_mesh(n_particle=1)
    assert mesh.shape == {"data": 8, "particle": 1}
    eng = Engine(cm, InferenceConfig(num_iters=1, batch_rows=8,
                                     rejuv_frequency=1000), mesh=mesh)
    arenas, params = init_state(cm, jax.random.PRNGKey(0))
    arenas, params, key = eng.initialize(jax.random.PRNGKey(1), arenas,
                                         params)
    arenas, params, key = eng.sweep(key, arenas, params)
    # replicated output: every process must hold identical arenas
    leaves = jax.tree_util.tree_leaves(arenas)
    fp = 0.0
    for x in leaves:
        fp += float(np.sum(np.asarray(jax.device_get(x),
                                      dtype=np.float64)))
    print(f"proc {pid}: arenas fingerprint {fp:.6f}", flush=True)
    print(f"proc {pid}: MULTIHOST OK", flush=True)


if __name__ == "__main__":
    main()
