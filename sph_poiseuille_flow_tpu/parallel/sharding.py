"""Multi-chip scaling: particle-row sharding over a ``jax.sharding.Mesh``.

The reference is single-process shared-memory (OpenMP atomics); its only
"distribution" mechanism is the periodic ghost-entry halo (SURVEY.md 2.3).
The TPU-native scale-out re-expresses the hot work — the (n_fluid, C) dense
neighbor rows and every row-wise physics operator — as GSPMD-partitioned
computation:

* per-particle (n_total,) state arrays are REPLICATED (tiny at reference
  scales: ~16 arrays x n_total x 4 B),
* the (n_fluid, C) candidate/geometry matrices — where ~C x more memory and
  essentially all FLOPs live — are SHARDED row-wise across the mesh,
* XLA inserts the all-gathers/reductions over ICI automatically from the
  sharding annotations (the standard "annotate and let GSPMD partition"
  recipe).

This keeps the single-chip operator code byte-identical — the sharded
engine jits the SAME ``Engine._run_interval`` with in/out shardings.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SPHConfig
from ..models.poiseuille import Scene
from ..stepper import Engine, IntervalResult, State


AXIS = "shard"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D device mesh over the first ``n_devices`` available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} present")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


class ShardedEngine:
    """Engine whose neighbor-row dimension is partitioned across a mesh.

    Usage mirrors ``Engine``: ``init`` then repeated ``run_interval``; all
    inputs/outputs keep their shardings across calls so state stays
    device-resident between intervals.
    """

    def __init__(self, cfg: SPHConfig, scene: Scene, mesh: Mesh):
        if scene.n_fluid % mesh.devices.size != 0:
            # GSPMD can pad internally, but an even row split keeps the
            # partitioned row-sum perfectly balanced; enforce it for clarity
            raise ValueError(
                f"n_fluid={scene.n_fluid} must divide evenly over "
                f"{mesh.devices.size} devices (pad the lattice or choose "
                f"dp so DL/dp*DH/dp is a multiple of the mesh size)")
        self.mesh = mesh
        self.engine = Engine(cfg, scene)
        self.cfg = cfg
        self.scene = scene
        self.spec = self.engine.spec

        repl = NamedSharding(mesh, P())
        rows = NamedSharding(mesh, P(AXIS, None))
        self._repl, self._rows = repl, rows

        state_shardings = State(*([repl] * len(State._fields)))
        from ..ops.neighbors import Candidates, Geometry
        # candidate/geometry rows are partitioned; the rebuild reference
        # positions and the overflow flag are replicated
        cands_sh = Candidates(
            jsafe=rows, cvalid=rows, is_fluid_j=rows, mass_j=rows,
            wvx_j=rows, wvy_j=rows, wall_bot=rows, wall_top=rows,
            ref_x=repl, ref_y=repl, overflow=repl)
        geom_sh = Geometry(*([rows] * len(Geometry._fields)))

        self._init = jax.jit(
            self.engine._init,
            in_shardings=(state_shardings,),
            out_shardings=(state_shardings, cands_sh, geom_sh, repl))
        self._run = jax.jit(
            self.engine._run_interval,
            in_shardings=(state_shardings, cands_sh, geom_sh, repl),
            out_shardings=IntervalResult(
                state=state_shardings, cands=cands_sh, geom=geom_sh,
                tau_bottom=repl, tau_top=repl, n_steps=repl, overflow=repl,
                skin_guard=repl, v_max=repl, n_pairs=repl))

    def init(self, state: State):
        with self.mesh:
            return self._init(state)

    def run_interval(self, state: State, cands, geom, interval_len):
        with self.mesh:
            return self._run(state, cands, geom,
                             jnp.asarray(interval_len, jnp.dtype(
                                 self.cfg.dtype)))


class ShardedCellEngine:
    """Spatial domain decomposition of the cell-layout engine.

    The cell grid's flattened cell axis S = ny*nx is partitioned across the
    mesh — contiguous blocks of cell ROWS, i.e. y-slabs of the channel.
    Per-particle state stays replicated (tiny); all (S, K, 9K) pair work is
    slab-local, and the 3x3 neighbor view's shifted y-concatenations become
    GSPMD halo exchanges over ICI — the distributed generalization of the
    reference's ghost-entry mechanism (SURVEY 2.3).
    """

    def __init__(self, cfg, scene, mesh: Mesh):
        from ..stepper import CellEngine
        from ..ops.cellgrid import CellLayout, CellGeometry

        self.mesh = mesh
        # pad the cell-row count so S = ny*nx divides evenly over the mesh
        # (jit shardings require an exact partition); S is split into
        # contiguous row-major blocks, i.e. y-slabs of the channel
        self.engine = CellEngine(cfg, scene, s_multiple=mesh.devices.size)
        self.cfg = cfg
        self.scene = scene
        self.spec = self.engine.spec

        repl = NamedSharding(mesh, P())
        cells = NamedSharding(mesh, P(AXIS))          # S-major partition

        state_sh = State(*([repl] * len(State._fields)))
        lay_sh = CellLayout(
            slot=repl, pid_v=cells, pid_a=cells, valid_v=cells,
            isf_v=cells, mass_v=cells, wvx_v=cells, wvy_v=cells,
            wbot_v=cells, wtop_v=cells, a_fluid=cells, a_valid=cells,
            mass_a=cells,
            ref_x=repl, ref_y=repl, overflow=repl)
        geom_sh = CellGeometry(*([cells] * len(CellGeometry._fields)))

        self._init = jax.jit(
            self.engine._init,
            in_shardings=(state_sh,),
            out_shardings=(state_sh, lay_sh, geom_sh, repl))
        self._run = jax.jit(
            self.engine._run_interval,
            in_shardings=(state_sh, lay_sh, geom_sh, repl),
            out_shardings=IntervalResult(
                state=state_sh, cands=lay_sh, geom=geom_sh,
                tau_bottom=repl, tau_top=repl, n_steps=repl, overflow=repl,
                skin_guard=repl, v_max=repl, n_pairs=repl))

    def init(self, state: State):
        with self.mesh:
            return self._init(state)

    def run_interval(self, state: State, lay, geom, interval_len):
        with self.mesh:
            return self._run(state, lay, geom,
                             jnp.asarray(interval_len,
                                         jnp.dtype(self.cfg.dtype)))
