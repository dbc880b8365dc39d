"""Multi-device parallel subsystem (new vs the single-threaded reference)."""
from .shard import Mesh, ShardedEngine, make_mesh

__all__ = ["ShardedEngine", "make_mesh", "Mesh"]
