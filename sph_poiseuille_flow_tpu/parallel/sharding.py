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

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..config import SPHConfig
from ..models.poiseuille import Scene
from ..stepper import (CellEngine, Engine, IntervalResult,
                       PallasCellEngine, State)


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
                skin_guard=repl, v_max=repl, n_pairs=repl,
                step_log=repl, step_log_n=repl))

    def init(self, state: State):
        with self.mesh:
            return self._init(state)

    def run_interval(self, state: State, cands, geom, interval_len,
                     t_base=None, step_base=None):
        # t_base/step_base: accepted for driver API symmetry (the gather
        # engine has no in-loop log to offset)
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
                skin_guard=repl, v_max=repl, n_pairs=repl,
                step_log=repl, step_log_n=repl))

    def init(self, state: State):
        with self.mesh:
            return self._init(state)

    def run_interval(self, state: State, lay, geom, interval_len,
                     t_base=None, step_base=None):
        # t_base/step_base: accepted for driver API symmetry; the sharded
        # cellgrid path logs per interval only (use the flagship sharded
        # engine for in-loop step logs)
        with self.mesh:
            return self._run(state, lay, geom,
                             jnp.asarray(interval_len,
                                         jnp.dtype(self.cfg.dtype)))


class ShardedPallasEngine(PallasCellEngine):
    """y-slab ``shard_map`` decomposition of the flagship fused Pallas
    engine.

    The fused layout's cell-row axis (``nyp`` rows of ``(K, nx)`` slots,
    ops/fused_cell.py) is split into contiguous row slabs, one per device.
    Each step, every device exchanges a ``ghost``-row-deep halo band of the
    particle-state cores with its y-neighbors over ICI
    (``lax.ppermute``) and runs the UNMODIFIED single-step fused kernel on
    its extended slab; the ghost depth equals the kernel's cross-row
    dependency depth (4 sweeps x 1-row stencil each), so every interior
    output is exact and ghost-region results are simply discarded. This is
    the distributed generalization of the reference's ghost-entry halo
    (sph_neighbor_search_mex.c:282-295): the same translated-copy idea,
    pointed across the mesh instead of across the periodic seam.

    Slabs shallower than the ghost depth (tiny domains / many devices)
    fall back to an ``all_gather`` of the slab axis — same results, more
    bytes; the ppermute path is the scaling path (halo bytes per step are
    O(ghost * K * nx), independent of slab height).

    Candidate rebuilds and the wall-shear monitor stay REPLICATED (cheap:
    one packed argsort/scatter per ``rebuild_every`` steps at reference
    scales); the per-step pair sweeps — where all the FLOPs live — are
    slab-local. Sharded-vs-single equivalence: tests/test_parallel.py."""

    def __init__(self, cfg: SPHConfig, scene: Scene, mesh: Mesh,
                 ghost: int = 4):
        self.mesh = mesh
        self.n_dev = int(mesh.devices.size)
        self.ghost = int(ghost)
        super().__init__(cfg, scene)
        pc = self._pc
        R, L, n_groups, nyp = pc.plan(self.spec)
        self._nyp = nyp
        self.nyp_pad = -(-nyp // self.n_dev) * self.n_dev
        self.rows_loc = self.nyp_pad // self.n_dev
        self._gather_mode = self.rows_loc < self.ghost
        # re-jit the public surface with explicit replicated shardings over
        # the mesh (the only partitioned values live inside the per-step
        # shard_map; particle-order state is tiny and replicated)
        repl = NamedSharding(mesh, P())
        self.init = jax.jit(self._init, in_shardings=(repl,),
                            out_shardings=repl)
        self._jrun = jax.jit(
            lambda s, la, ge, il, tb, sb: self._run_interval(
                s, la, ge, il, t_base=tb, step_base=sb),
            in_shardings=(repl,) * 6, out_shardings=repl)
        # the base __init__ bound run_interval to a plain jit of the
        # chunked loop; point it at the sharded wrapper instead
        self.run_interval = self._sharded_run_interval

    def _sharded_run_interval(self, state, lay, geom, interval_len,
                              t_base=None, step_base=None):
        dtype = jnp.dtype(self.cfg.dtype)
        return self._jrun(
            state, lay, geom, jnp.asarray(interval_len, dtype),
            jnp.asarray(0.0 if t_base is None else t_base, dtype),
            jnp.asarray(0 if step_base is None else step_base, jnp.int32))

    # the core-carry chunk loop has no sharded variant (its state never
    # leaves one kernel); the sharded engine uses the generic per-step
    # interval loop, whose _step calls the shard_mapped kernel below
    def _run_interval(self, state: State, lay, geom, interval_len,
                      g=None, mu=None, t_base=None, step_base=None):
        return CellEngine._run_interval(
            self, state, lay, geom, interval_len, g=g, mu=mu,
            t_base=t_base, step_base=step_base)

    def _fused_wall_shear(self, lay, x, y, vx, vol, b11, b12, b21, b22,
                          mu):
        # replicated shard_map: the Pallas monitor kernel runs identically
        # on every device (GSPMD has no partitioning rule for pallas_call,
        # so it must sit inside a manual region)
        pc, spec, cfg = self._pc, self.spec, self.cfg
        rp = P()

        def body(*args):
            return pc.fused_wall_shear(spec, *args,
                                       wall_visc_factor=cfg.wall_visc_factor)

        f = shard_map(body, mesh=self.mesh,
                      in_specs=(rp,) * 10, out_specs=(rp, rp),
                      check_vma=False)
        return f(lay, x, y, vx, vol, b11, b12, b21, b22,
                 jnp.asarray(mu, x.dtype))

    def _fused_cell_step(self, lay, x, y, vx, vy, drho_dt, dt, g, mu,
                         transport_coeff=None):
        pc, spec, cfg = self._pc, self.spec, self.cfg
        tc = (cfg.transport_coeff if transport_coeff is None
              else transport_coeff)
        G, rows_loc, n_dev = self.ghost, self.rows_loc, self.n_dev
        R, L, n_groups, nyp = pc.plan(spec)
        nx, K = spec.nx, spec.K
        nyp_pad = self.nyp_pad
        fdtype = x.dtype
        BIG = pc._BIG_X

        def pad_rows(p, fill):
            if nyp_pad == nyp:
                return p
            return jnp.concatenate(
                [p, jnp.full((nyp_pad - nyp, K, nx), fill, p.dtype)],
                axis=0)

        def strip(c):  # halo'd static core -> plain interior
            return c[1:nyp + 1, :, 1:nx + 1]

        # replicated packed scatters into plain cores, padded so the row
        # axis splits evenly over the mesh
        xP = pad_rows(pc.make_plain(spec, lay.pidx, x, fill=BIG), BIG)
        yP = pad_rows(pc.make_plain(spec, lay.pidx, y), 0.0)
        vxP = pad_rows(pc.make_plain(spec, lay.pidx, vx), 0.0)
        vyP = pad_rows(pc.make_plain(spec, lay.pidx, vy), 0.0)
        drP = pad_rows(pc.make_plain(spec, lay.pidx, drho_dt), 0.0)
        isfP = pad_rows(strip(lay.isf_c), 0.0)
        massP = pad_rows(strip(lay.mass_c), 0.0)
        wvxP = pad_rows(strip(lay.wvx_c), 0.0)
        wvyP = pad_rows(strip(lay.wvy_c), 0.0)

        rows_ext = rows_loc + 2 * G
        ls = dataclasses.replace(spec, ny=rows_ext)
        Rl, Ll, ngl, nypl = pc.plan(ls)
        gather_mode = self._gather_mode

        def exchange(slab, fill):
            """(lo, hi) ghost bands of this device's slab: the last/first
            G rows of the y-neighbor slabs (domain-edge devices read the
            core fill — walls bound y, nothing beyond them)."""
            if n_dev == 1:
                z = jnp.full((G,) + slab.shape[1:], fill, slab.dtype)
                return z, z
            idx = jax.lax.axis_index(AXIS)
            if gather_mode:
                full = jax.lax.all_gather(slab, AXIS, axis=0, tiled=True)
                cap = jnp.full((G,) + full.shape[1:], fill, full.dtype)
                padded = jnp.concatenate([cap, full, cap], axis=0)
                i0 = idx * rows_loc
                lo = jax.lax.dynamic_slice_in_dim(padded, i0, G, axis=0)
                hi = jax.lax.dynamic_slice_in_dim(
                    padded, i0 + rows_loc + G, G, axis=0)
                return lo, hi
            lo = jax.lax.ppermute(
                slab[-G:], AXIS, [(i, i + 1) for i in range(n_dev - 1)])
            hi = jax.lax.ppermute(
                slab[:G], AXIS, [(i, i - 1) for i in range(1, n_dev)])
            cap = jnp.full_like(lo, fill)
            lo = jnp.where(idx == 0, cap, lo)
            hi = jnp.where(idx == n_dev - 1, cap, hi)
            return lo, hi

        def local_step(xs, ys, vxs, vys, drs, isfs, ms, wvxs, wvys,
                       dtl, gl, mul):
            def ext(slab, fill):
                lo, hi = exchange(slab, fill)
                e = jnp.concatenate([lo, slab, hi], axis=0)
                if nypl > rows_ext:
                    e = jnp.concatenate(
                        [e, jnp.full((nypl - rows_ext, K, nx), fill,
                                     e.dtype)], axis=0)
                return e

            x_e = ext(xs, BIG)
            y_e, vx_e, vy_e, dr_e = (ext(s, 0.0)
                                     for s in (ys, vxs, vys, drs))
            isf_e, m_e, wvx_e, wvy_e = (ext(s, 0.0)
                                        for s in (isfs, ms, wvxs, wvys))

            # local k-loop bounds from slot occupancy (empty slots ride at
            # x = BIG; assign_slots packs ranks contiguously, so the count
            # IS the bound)
            cnt_cell = jnp.sum((x_e < 0.5 * BIG).astype(jnp.int32), axis=1)
            occl = jnp.minimum(
                jnp.max(cnt_cell.reshape(ngl, Rl * nx), axis=1,
                        keepdims=True), K).astype(jnp.int32)

            cores = [pc.halo_ify(ls, x_e, fill=BIG, xshift=spec.DL),
                     pc.halo_ify(ls, y_e), pc.halo_ify(ls, vx_e),
                     pc.halo_ify(ls, vy_e), dr_e,
                     pc.halo_ify(ls, isf_e), pc.halo_ify(ls, m_e),
                     pc.halo_ify(ls, wvx_e), pc.halo_ify(ls, wvy_e)]
            outs = pc._fused_call(
                ls, cores, occl, dtl,
                (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, tc,
                 gl, mul, cfg.wall_visc_factor))
            (volH, b11H, b12H, b21H, b22H, vx2H, vy2H,
             rhoP, pP, drhoP, fxP, fyP, fpxP, fpyP, x2P, y2P, cnt) = outs

            def ih(c):  # halo'd local core -> interior slab rows
                return c[1 + G:1 + G + rows_loc, :, 1:nx + 1]

            def ip(c):
                return c[G:G + rows_loc]

            # cnt lanes are (row-in-group, x): exact interior pair count
            cnt_rows = cnt.reshape(ngl * Rl, nx)[G:G + rows_loc]
            npairs = jax.lax.psum(jnp.sum(cnt_rows), AXIS)
            return (ih(volH), ih(b11H), ih(b12H), ih(b21H), ih(b22H),
                    ih(vx2H), ih(vy2H), ip(rhoP), ip(pP), ip(drhoP),
                    ip(fxP), ip(fyP), ip(fpxP), ip(fpyP), ip(x2P),
                    ip(y2P), npairs)

        sh, rp = P(AXIS), P()
        f = shard_map(local_step, mesh=self.mesh,
                      in_specs=(sh,) * 9 + (rp, rp, rp),
                      out_specs=(sh,) * 16 + (rp,),
                      check_vma=False)
        (volI, b11I, b12I, b21I, b22I, vx2I, vy2I, rhoI, pI, drhoI,
         fxI, fyI, fpxI, fpyI, x2I, y2I, npairs) = f(
            xP, yP, vxP, vyP, drP, isfP, massP, wvxP, wvyP,
            jnp.asarray(dt, fdtype), jnp.asarray(g, fdtype),
            jnp.asarray(mu, fdtype))

        def take(a):
            return a.reshape(-1)[lay.pidx]

        return dict(
            rho=take(rhoI), p=take(pI), drho_dt=take(drhoI),
            vx=take(vx2I), vy=take(vy2I), fx=take(fxI), fy=take(fyI),
            fpx=take(fpxI), fpy=take(fpyI), vol=take(volI),
            b11=take(b11I), b12=take(b12I), b21=take(b21I),
            b22=take(b22I), x=take(x2I), y=take(y2I),
            n_pairs=jnp.round(npairs).astype(jnp.int32))
