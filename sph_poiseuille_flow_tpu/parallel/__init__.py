from .sharding import (AXIS, ShardedCellEngine, ShardedEngine,
                       ShardedPallasEngine, make_mesh)
from .sweep import make_workloads, run_sweep

__all__ = ["AXIS", "ShardedCellEngine", "ShardedEngine",
           "ShardedPallasEngine", "make_mesh",
           "make_workloads", "run_sweep"]
