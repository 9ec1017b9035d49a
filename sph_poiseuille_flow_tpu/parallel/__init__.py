from .sharding import (AXIS, ShardedCellEngine, ShardedEngine,
                       make_mesh)
from .sweep import make_workloads, run_sweep

__all__ = ["AXIS", "ShardedCellEngine", "ShardedEngine", "make_mesh",
           "make_workloads", "run_sweep"]
