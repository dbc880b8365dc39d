"""Multi-host / multi-slice execution plumbing.

The reference has no distribution story at all (SURVEY.md §2: one Julia
thread, no communication backend). This module supplies the TPU-native one
for pclean_tpu's SPMD drivers:

  * every host runs the SAME driver script (multi-controller JAX);
  * `initialize_multihost()` brings up the jax.distributed coordination
    service (GCE TPU pods auto-detect; explicit coordinator for manual
    launches);
  * `make_multihost_mesh()` builds the device mesh with the row/`data` axis
    laid out DCN-major — rows shard across hosts over DCN, and within a
    slice over ICI — while the `particle` axis stays inside a slice so the
    per-row SMC resampling collective (all_gather of particle weights,
    parallel/shard.py) rides ICI only. The arena psum-reconcile along
    `data` is the one cross-host collective, and it moves O(batch x
    columns) scalars per step, so DCN bandwidth is not a bottleneck.

Everything downstream is unchanged: ShardedEngine's shard_mapped programs
address the mesh by axis name only, so the same compiled code runs on one
chip, a v5e-8 slice, or N pod slices. State stays fully replicated
(latent-DB arenas are O(distinct entities), small); per-row inputs are
sharded with `host_local_data` so each process feeds only its shard.

Single-process fallbacks make every entry point a no-op/plain-mesh path, so
driver scripts are identical on a laptop CPU and a multi-host pod — tested
single-process in tests/test_dist.py; the multi-process path follows the
standard jax.distributed contract, which cannot be exercised in a
single-host CI (SURVEY.md §4).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed for a multi-process run; returns whether a
    multi-process world is active.

    On TPU pods (GCE/GKE) all three arguments auto-detect from the metadata
    server and may be omitted. For manual launches, pass them or set
    PCLEAN_COORDINATOR / PCLEAN_NUM_PROCESSES / PCLEAN_PROCESS_ID. Calling
    this with a 1-process configuration (or not at all) leaves JAX in
    normal single-controller mode.
    """
    coordinator_address = coordinator_address or \
        os.environ.get("PCLEAN_COORDINATOR")
    if num_processes is None and "PCLEAN_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PCLEAN_NUM_PROCESSES"])
    if process_id is None and "PCLEAN_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PCLEAN_PROCESS_ID"])
    explicit = coordinator_address is not None
    auto_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or \
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if not explicit and not auto_pod:
        return jax.process_count() > 1
    # IMPORTANT: do not probe jax.process_count() here — it initializes the
    # backends, after which jax.distributed.initialize refuses to run and
    # the process silently stays single-controller.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        # backends already initialized (e.g. single-host run in a container
        # that exports pod env vars): stay single-controller
        pass
    return jax.process_count() > 1


def make_multihost_mesh(n_particle: int = 1) -> Mesh:
    """('data', 'particle') mesh over every device in the world.

    Multi-process: the data axis is DCN-major — contiguous blocks of it map
    to one host's ICI-connected chips, so psum over 'data' reduces within a
    slice over ICI first and crosses DCN once per host block (XLA lowers
    hybrid-mesh collectives that way); the particle axis never leaves a
    host's chips. Single-process: identical layout over local devices.
    """
    n_proc = jax.process_count()
    devices = jax.devices()  # globally ordered: process-major
    n_total = len(devices)
    assert n_total % n_particle == 0, \
        f"{n_total} devices not divisible by n_particle={n_particle}"
    per_proc = n_total // n_proc
    assert per_proc % n_particle == 0 or n_proc == 1, \
        "particle axis must fit inside one host's devices"
    arr = np.array(devices).reshape(n_total // n_particle, n_particle)
    return Mesh(arr, ("data", "particle"))


def host_local_data(mesh: Mesh, x, axis: str = "data"):
    """Build a global array sharded along `axis` from per-process local
    rows (jax.make_array_from_process_local_data); single-process this is
    just device_put with the sharding. Use for per-row inputs (slots, keys)
    so each host only materializes its own shard."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (arenas/params). Fully
    replicated device_put is multi-process safe: every process holds the
    same host value."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)
