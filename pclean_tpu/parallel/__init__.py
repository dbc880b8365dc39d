"""Multi-device parallel subsystem (new vs the single-threaded reference)."""
from .dist import (host_local_data, initialize_multihost,
                   make_multihost_mesh, replicate)
from .shard import Mesh, ShardedEngine, make_mesh

__all__ = ["ShardedEngine", "make_mesh", "Mesh", "initialize_multihost",
           "make_multihost_mesh", "host_local_data", "replicate"]
