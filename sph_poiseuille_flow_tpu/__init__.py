"""TPU-native 2D weakly-compressible SPH engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of the reference MATLAB+C/MEX
Poiseuille-flow solver (KIYOYOZU/SPH-Poiseuille-Flow) for TPU hardware:
static-shape operators, dense neighbor matrices, whole-interval
``lax.while_loop`` stepping, and multi-chip scaling via GSPMD jit
shardings over a ``jax.sharding.Mesh`` (parallel/sharding.py).
"""

from .config import (SPHConfig, ConfigError, parse_ini, parse_ini_text,
                     get_ini_numeric, derive_config, load_config,
                     env_override)
from .models.poiseuille import Scene, build_scene
from .stepper import CellEngine, Engine, State, initial_state, make_engine

__all__ = [
    "SPHConfig", "ConfigError", "parse_ini", "parse_ini_text",
    "get_ini_numeric", "derive_config", "load_config", "env_override",
    "Scene", "build_scene", "Engine", "CellEngine", "make_engine",
    "State", "initial_state",
]

__version__ = "0.1.0"
