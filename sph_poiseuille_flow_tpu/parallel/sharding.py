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
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

shard_map = jax.shard_map

from ..config import SPHConfig
from ..models.poiseuille import Scene
from ..stepper import (CellEngine, Engine, IntervalResult,
                       PallasCellEngine, State, _t_add)


AXIS = "shard"


def _exchange_bands(slab, fill, G, n_dev, rows_loc, gather_mode):
    """(lo, hi) G-row ghost bands of this device's y-slab: the last/first
    G rows of the y-neighbor slabs, over ICI via ``lax.ppermute``
    (domain-edge devices read the core ``fill`` — walls bound y, nothing
    beyond them). Slabs shallower than G (tiny domains / many devices)
    use an ``all_gather`` of the slab axis instead — same values, more
    bytes. The distributed twin of the reference's ghost-entry halo
    (sph_neighbor_search_mex.c:282-295), pointed across the mesh."""
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
                 ghost: int = None):
        self.mesh = mesh
        self.n_dev = int(mesh.devices.size)
        if ghost is None:
            # 4 = the kernel's cross-row dependency depth (4 sweeps x
            # 1-row stencil). A 1-device mesh needs NO ghost rows: both
            # band edges are DOMAIN edges (walls bound y, nothing
            # beyond), so the slab IS the whole domain and the ghost=0
            # spec is identical to the single-chip plan — the interval
            # loop then runs the single-chip core-carry body verbatim
            # under shard_map (_mesh1_interval), eliminating the
            # slot-space staging whose per-group cost measured ~20-30%
            # (experiments/probe_mesh1_scalelen.py: the gap scales with
            # interval length, i.e. it was per-group glue, not dispatch).
            # Pass ghost=4 explicitly to hardware-validate the
            # extended-slab Mosaic compile (experiments/mesh1_tpu.py).
            ghost = 4 if self.n_dev > 1 else 0
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

    def _run_interval(self, state: State, lay, geom, interval_len,
                      g=None, mu=None, t_base=None, step_base=None):
        if (self.cfg.step_log_every > 0
                or os.environ.get("SPH_SHARDED_CHUNK", "1") == "0"):
            # in-loop logging needs per-step particle-order observables:
            # fall back to the generic per-step loop over the
            # shard_mapped single-step kernel (correctness-grade; also the
            # SPH_SHARDED_CHUNK=0 A/B knob)
            return CellEngine._run_interval(
                self, state, lay, geom, interval_len, g=g, mu=mu,
                t_base=t_base, step_base=step_base)
        if self.n_dev == 1 and self.ghost == 0:
            return self._mesh1_interval(state, lay, geom, interval_len,
                                        g=g, mu=mu, t_base=t_base,
                                        step_base=step_base)
        return self._chunked_interval(state, lay, geom, interval_len,
                                      g=g, mu=mu)

    def _mesh1_interval(self, state: State, lay, geom, interval_len,
                        g=None, mu=None, t_base=None, step_base=None):
        """1-device mesh, ghost=0: run the single-chip core-carry
        interval loop VERBATIM under ``shard_map``.

        With one device the slab is the whole domain (both band edges
        are walls) and the ghost=0 kernel spec equals the single-chip
        plan, so the slot-space machinery of ``_chunked_interval`` —
        per-group slab staging, the slot-ranked ``local_rebuild``, the
        interval-final collect — buys nothing and measurably costs:
        the wall gap vs the unsharded engine scales linearly with the
        interval length (~23 us/step at dp=0.025,
        experiments/probe_mesh1_scalelen.py), i.e. it is per-group
        device glue, not dispatch. Running
        ``PallasCellEngine._run_interval`` inside the mesh instead
        makes the ``--mesh 1`` program the single-chip program by
        construction (same packed rebuilds, same carry structure) while
        Mosaic still compiles the kernels under ``shard_map`` on the
        mesh. Trajectories stay bit-identical to the unsharded engine
        (tests/test_parallel.py n_dev=1; hardware:
        experiments/mesh1_tpu.py). The extended-slab slot-space path
        remains reachable with an explicit ``ghost=4`` — the multi-chip
        spec hardware-validation configuration."""

        def run(s, la, ge, il):
            return PallasCellEngine._run_interval(
                self, s, la, ge, il, g=g, mu=mu, t_base=t_base,
                step_base=step_base)

        f = shard_map(run, mesh=self.mesh,
                      in_specs=(P(), P(), P(), P()), out_specs=P(),
                      check_vma=False)
        return f(state, lay, geom, jnp.asarray(
            interval_len, jnp.dtype(self.cfg.dtype)))

    def _chunked_interval(self, state: State, lay, geom, interval_len,
                          g=None, mu=None):
        """Perf-grade sharded interval loop: the single-chip core-carry
        chunk design (stepper.PallasCellEngine._run_interval), run
        slab-locally inside ONE ``shard_map`` region.

        Per device and per step: exchange a ``ghost``-row band of the
        five dynamic state slabs with the y-neighbors (``ppermute`` over
        ICI), run the UNMODIFIED fused step kernel on the extended slab,
        keep the interior. Between sub-chunks, the pair-drift guard and
        the predictive rebuild scheduler run on slab-local bounds merged
        across the mesh (one small ``all_gather`` of row-reduced ranges),
        so every device takes the SAME rebuild/rollback decision — the
        trajectory is the single-chip chunk trajectory, bit for bit.
        Rebuilds are LOCAL: each device re-bins its own cell rows from a
        1-row-extended slab (a particle's row changes by at most one
        between rebuilds — drift is bounded by the skin), ranking
        particles within a cell by particle id to reproduce the global
        ``assign_slots`` placement exactly. Per-particle order, the
        global layout, and the wall-shear monitor materialize ONCE per
        interval, at the end.

        vs the per-step fallback this removes the two scale blockers the
        round-3 review named (parallel/sharding.py:241-300 then):
        replicated per-step packed scatters of all state cores (~2x the
        kernel, measured) and the clamped rebuild cadence — the
        drift-adaptive cadence and the rollback-with-backoff now run
        under sharding. Reference mechanism generalized: the ghost-entry
        halo (sph_neighbor_search_mex.c:282-295), per step and per
        sub-chunk across the mesh instead of per step across the seam."""
        cfg, spec, pc = self.cfg, self.spec, self._pc
        g = cfg.gravity_g if g is None else g
        mu = cfg.mu if mu is None else mu
        dtype = jnp.dtype(cfg.dtype)
        scalars = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0,
                   cfg.transport_coeff, g, mu, cfg.wall_visc_factor)
        R, L, n_groups, nyp = pc.plan(spec)
        nx, K, h = spec.nx, spec.K, spec.h
        n_total, n_fluid = spec.n_total, spec.n_fluid
        Gh, n_dev = self.ghost, self.n_dev
        rows_loc, nyp_pad = self.rows_loc, self.nyp_pad
        gather_mode = self._gather_mode
        BIG = pc._BIG_X
        BIGB = jnp.asarray(1e30, dtype)   # drift-bound sentinel
        rows_ext = rows_loc + 2 * Gh
        ls = dataclasses.replace(spec, ny=rows_ext)
        Rl, Ll, ngl, nypl = pc.plan(ls)
        n_loc_cells = rows_loc * nx
        rb = max(1, int(cfg.rebuild_every))
        _SUB = min(rb, int(os.environ.get("SPH_SUB_STEPS", "")
                           or getattr(cfg, "sub_steps", 16)))
        _PREDICT = os.environ.get("SPH_DRIFT_PREDICTOR", "1") != "0"
        sxb = jnp.asarray(spec.skin_x, dtype)
        syb = jnp.asarray(spec.skin_y, dtype)
        from ..ops.neighbors import _cell_coords

        def pad_rows(p, fill):
            if nyp_pad == p.shape[0]:
                return p
            return jnp.concatenate(
                [p, jnp.full((nyp_pad - p.shape[0],) + p.shape[1:], fill,
                             p.dtype)], axis=0)

        def strip(c):
            return c[1:nyp + 1, :, 1:nx + 1]

        # one global scatter into padded plain cores at interval entry
        # (particle order exists only here and at the interval end)
        pid = jnp.arange(n_total, dtype=jnp.int32)
        interval_len = jnp.asarray(interval_len, dtype)
        slabs_in = (
            pad_rows(pc.make_plain(spec, lay.pidx, state.x, fill=BIG), BIG),
            pad_rows(pc.make_plain(spec, lay.pidx, state.y), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.vx), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.vy), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.drho_dt), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, pid, fill=n_total),
                     n_total),
            pad_rows(strip(lay.isf_c), 0.0),
            pad_rows(strip(lay.mass_c), 0.0),
            pad_rows(strip(lay.wvx_c), 0.0),
            pad_rows(strip(lay.wvy_c), 0.0),
            pad_rows(strip(lay.wbot_c), 0.0),
            pad_rows(strip(lay.wtop_c), 0.0),
            pad_rows(lay.refx_p, BIG),
            pad_rows(lay.refy_p, 0.0),
            # rollback seeds for the aux state (vol/B/rho/p/forces):
            # mirror the single-chip scatter_all so a first-group rollback
            # restores the incoming state exactly
            pad_rows(pc.make_plain(spec, lay.pidx, state.vol), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.b11), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.b12), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.b21), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.b22), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.rho), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.p), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.fx), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.fy), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.fpx), 0.0),
            pad_rows(pc.make_plain(spec, lay.pidx, state.fpy), 0.0),
        )

        AUX_KEYS = ("vol", "b11", "b12", "b21", "b22", "rho", "p",
                    "fx", "fy", "fpx", "fpy")

        def body(il, xS, yS, vxS, vyS, drS, pidS, isfS, massS, wvxS,
                 wvyS, wbotS, wtopS, refxS, refyS, *aux_in):
            didx = jax.lax.axis_index(AXIS)
            r0 = didx * rows_loc

            def ext(slab, fill):
                lo, hi = _exchange_bands(slab, fill, Gh, n_dev, rows_loc,
                                         gather_mode)
                e = jnp.concatenate([lo, slab, hi], axis=0)
                if nypl > rows_ext:
                    e = jnp.concatenate(
                        [e, jnp.full((nypl - rows_ext, K, nx), fill,
                                     e.dtype)], axis=0)
                return e

            def make_stat_h(isf, mass, wvx, wvy):
                """Extended halo'd static cores — refreshed per rebuild
                group only (they change at rebuilds, not steps)."""
                return (pc.halo_ify(ls, ext(isf, 0.0)),
                        pc.halo_ify(ls, ext(mass, 0.0)),
                        pc.halo_ify(ls, ext(wvx, 0.0)),
                        pc.halo_ify(ls, ext(wvy, 0.0)))

            mu32 = jnp.asarray(mu, dtype)
            g32 = jnp.asarray(g, dtype)
            # dt criteria EXACTLY as the single-chip chunk kernel
            # (ops/fused_cell._chunk_kernel) so trajectories are bit-equal
            nu32 = mu32 / cfg.rho0
            dt_visc = 0.125 * h * h / jnp.maximum(nu32, 1e-12)
            dt_body = 0.25 * jnp.sqrt(
                h / jnp.maximum(jnp.abs(g32), 1e-12))

            def ih(c):
                return c[1 + Gh:1 + Gh + rows_loc, :, 1:nx + 1]

            def ip(c):
                return c[Gh:Gh + rows_loc]

            def group_occl(x_e):
                """Occupancy k-loop bounds from the frozen cell
                membership — REBUILD-constant (empty slots ride x = BIG
                through every step, and the exchanged ghost bands carry
                the neighbors' equally-frozen membership), so this is
                computed once per rebuild group, not per step (round-5
                hoist; the per-step recompute was pure overhead)."""
                cnt_cell = jnp.sum((x_e < 0.5 * BIG).astype(jnp.int32),
                                   axis=1)
                return jnp.minimum(
                    jnp.max(cnt_cell.reshape(ngl, Rl * nx), axis=1,
                            keepdims=True), K).astype(jnp.int32)

            def one_step(st, stat_h, occl, t, tc):
                # global v_max: slab max + pmax (exact: max of maxes;
                # walls/empty slots carry velocity 0 by kernel invariant)
                v_max = jnp.sqrt(jax.lax.pmax(
                    jnp.max(st["vx"] ** 2 + st["vy"] ** 2), AXIS))
                remain = il - t
                dt_ac = 0.25 * h / jnp.maximum(cfg.c_f + v_max, 1e-12)
                dt = jnp.maximum(
                    jnp.minimum(jnp.minimum(dt_ac, dt_visc),
                                jnp.minimum(dt_body, remain)),
                    1e-12)
                x_e = ext(st["x"], BIG)
                y_e = ext(st["y"], 0.0)
                vx_e = ext(st["vx"], 0.0)
                vy_e = ext(st["vy"], 0.0)
                dr_e = ext(st["dr"], 0.0)
                cores = [pc.halo_ify(ls, x_e, fill=BIG, xshift=spec.DL),
                         pc.halo_ify(ls, y_e), pc.halo_ify(ls, vx_e),
                         pc.halo_ify(ls, vy_e), dr_e] + list(stat_h)
                outs = pc._fused_call(ls, cores, occl, dt, scalars)
                (volH, b11H, b12H, b21H, b22H, vx2H, vy2H,
                 rhoP, pP, drhoP, fxP, fyP, fpxP, fpyP, x2P, y2P,
                 cnt) = outs
                t2, tc2 = _t_add(t, tc, dt)
                st2 = dict(
                    x=ip(x2P), y=ip(y2P), vx=ih(vx2H), vy=ih(vy2H),
                    dr=ip(drhoP),
                    vol=ih(volH), b11=ih(b11H), b12=ih(b12H),
                    b21=ih(b21H), b22=ih(b22H), rho=ip(rhoP), p=ip(pP),
                    fx=ip(fxP), fy=ip(fyP), fpx=ip(fpxP), fpy=ip(fpyP),
                    cnt=cnt.reshape(ngl * Rl, nx)[Gh:Gh + rows_loc])
                return st2, t2, tc2

            def drift_bounds(st, refx, refy, isf):
                """Slab-local twin of fused_cell.pair_drift_bounds: the
                per-row displacement ranges reduce locally, the tiny
                (2, rows, nx) row table gathers across the mesh, and the
                2-row/2-col windowing runs identically on every device —
                bounds (and therefore every scheduler/rollback decision)
                are bit-equal to the single-chip computation."""
                fl = isf > 0
                occm = refx < 0.5 * BIG
                d = jnp.stack([st["x"] - refx, st["y"] - refy])
                dmax = jnp.where(fl, d, jnp.where(occm, 0.0, -BIGB))
                dmin = jnp.where(fl, d, jnp.where(occm, 0.0, BIGB))
                mx = jnp.max(dmax, axis=2)   # (2, rows_loc, nx)
                mn = jnp.min(dmin, axis=2)
                if n_dev > 1:
                    mx = jax.lax.all_gather(mx, AXIS, axis=1, tiled=True)
                    mn = jax.lax.all_gather(mn, AXIS, axis=1, tiled=True)
                mx2 = jnp.maximum(mx[:, :-1], mx[:, 1:])
                mn2 = jnp.minimum(mn[:, :-1], mn[:, 1:])
                if nx >= 3:
                    mx2 = jnp.maximum(mx2, jnp.roll(mx2, -1, axis=2))
                    mn2 = jnp.minimum(mn2, jnp.roll(mn2, -1, axis=2))
                else:
                    mx2 = jnp.max(mx2, axis=2, keepdims=True)
                    mn2 = jnp.min(mn2, axis=2, keepdims=True)
                b = jnp.max(jnp.maximum(mx2 - mn2, 0.0), axis=(1, 2))
                return b[0], b[1]

            def local_rebuild(st, pidS, isfS, massS, wvxS, wvyS, wbotS,
                              wtopS):
                """Slab-local re-bin: wrap x, bin the 1-row-extended slab
                with the global cell rule (ops/neighbors._cell_coords),
                keep particles whose new row is local, rank within each
                cell by particle id — reproducing the global
                ``assign_slots`` placement (ops/cellgrid.py:118-136)
                exactly, with zero cross-device state beyond the 1-row
                band. Flags: per-cell count > K (overflow) and any
                occupied slot whose row moved by more than one
                (impossible under the drift budget — divergence)."""
                def ext1(slab, fill):
                    lo, hi = _exchange_bands(slab, fill, 1, n_dev,
                                             rows_loc, False)
                    return jnp.concatenate([lo, slab, hi], axis=0)

                occ_mask = st["x"] < 0.5 * BIG
                xw = jnp.where(
                    jnp.logical_and(occ_mask, isfS > 0),
                    jnp.mod(st["x"], spec.DL), st["x"])
                fields = dict(x=xw, y=st["y"], vx=st["vx"], vy=st["vy"],
                              dr=st["dr"], isf=isfS, mass=massS,
                              wvx=wvxS, wvy=wvyS, wbot=wbotS, wtop=wtopS)
                fills = dict(x=BIG, y=0.0, vx=0.0, vy=0.0, dr=0.0,
                             isf=0.0, mass=0.0, wvx=0.0, wvy=0.0,
                             wbot=0.0, wtop=0.0)
                # the aux diagnostics (rho/p/vol/B/forces) must FOLLOW
                # their particles through the re-bin: the interval-final
                # collect scatters every slab with the POST-rebuild pid
                # layout, so a slab left in the pre-rebuild layout would
                # attribute aux values to whichever particle now occupies
                # the old slot (and lose them entirely for particles that
                # migrated slabs). Found by the round-5 hardware
                # equivalence probe (experiments/mesh1_tpu.py): ~990-step
                # intervals move particles between cells in the trailing
                # group, where the short CI windows did not.
                for k in AUX_KEYS:
                    fields[k] = st[k]
                    fills[k] = 0.0
                es = {k: ext1(v, fills[k]).reshape(-1)
                      for k, v in fields.items()}
                pid_e = ext1(pidS, n_total).reshape(-1)
                S_e = pid_e.shape[0]
                valid = pid_e < n_total
                cx, cy = _cell_coords(spec, es["x"], es["y"])
                old_row = jnp.broadcast_to(
                    (r0 - 1 + jnp.arange(rows_loc + 2,
                                         dtype=jnp.int32))[:, None, None],
                    (rows_loc + 2, K, nx)).reshape(-1)
                jumped = jnp.any(jnp.logical_and(
                    valid, jnp.abs(cy - old_row) > 1))
                keep = jnp.logical_and(
                    valid, jnp.logical_and(cy >= r0,
                                           cy < r0 + rows_loc))
                cid = jnp.where(keep, (cy - r0) * nx + cx, n_loc_cells)
                # rank within cell by particle id == assign_slots' stable
                # particle-index ranking
                ord1 = jnp.argsort(pid_e).astype(jnp.int32)
                cid1 = cid[ord1]
                ord2 = jnp.argsort(cid1, stable=True).astype(jnp.int32)
                order = ord1[ord2]
                cid_s = cid1[ord2]
                counts = jax.ops.segment_sum(
                    jnp.ones((S_e,), jnp.int32), cid,
                    num_segments=n_loc_cells + 1)
                starts = jnp.cumsum(counts) - counts
                rank = jnp.arange(S_e, dtype=jnp.int32) - starts[cid_s]
                ovf = jnp.max(counts[:n_loc_cells]) > K
                slot_s = jnp.where(
                    jnp.logical_and(rank < K, cid_s < n_loc_cells),
                    cid_s * K + rank, n_loc_cells * K)
                slot = jnp.zeros((S_e,), jnp.int32).at[order].set(slot_s)
                cid2 = slot // K
                k2 = slot - cid2 * K
                iy2 = cid2 // nx
                ix2 = cid2 - iy2 * nx
                in_r = slot < n_loc_cells * K
                pidx_n = jnp.where(in_r, (iy2 * K + k2) * nx + ix2,
                                   n_loc_cells * K).astype(jnp.int32)

                names = list(fields)
                pack = jnp.stack([es[k] for k in names], axis=-1)
                fill_row = jnp.asarray([fills[k] for k in names],
                                       pack.dtype)
                flat = jnp.broadcast_to(fill_row,
                                        (n_loc_cells * K, len(names)))
                out = flat.at[pidx_n].set(pack, mode="drop").reshape(
                    rows_loc, K, nx, len(names))
                new = {k: out[..., i] for i, k in enumerate(names)}
                pid_n = jnp.full((n_loc_cells * K,), n_total,
                                 jnp.int32).at[pidx_n].set(
                    pid_e, mode="drop").reshape(rows_loc, K, nx)
                return new, pid_n, ovf, jumped

            # ---- the interval loop: groups of drift-bounded sub-chunks
            # (mirrors stepper.PallasCellEngine._run_interval body) ----
            zero = jnp.asarray(0.0, dtype)
            zi = jnp.asarray(0, jnp.int32)
            false = jnp.asarray(False)

            st0 = dict(x=xS, y=yS, vx=vxS, vy=vyS, dr=drS,
                       cnt=jnp.zeros((rows_loc, nx), dtype))
            for k, a in zip(AUX_KEYS, aux_in):
                st0[k] = a

            def group_body(carry):
                (st, pidS, isfS, massS, wvxS, wvyS, wbotS, wtopS,
                 refxS, refyS, t, tc, n_steps, overflow, guard, nroll,
                 sub_len) = carry
                stat_h = make_stat_h(isfS, massS, wvxS, wvyS)
                x_e0 = ext(st["x"], BIG)
                occl_g = group_occl(x_e0)

                def guard_eval(xI, yI, bp, n_sub, done_i):
                    """Drift guard + rollback decision (shared by both
                    paths; all inputs are mesh-identical scalars, so
                    every device takes the same decision)."""
                    if spec.skin > 0.0:
                        bx, by = drift_bounds(dict(x=xI, y=yI),
                                              refxS, refyS, isfS)
                        trip = jnp.logical_or(bx > sxb, by > syb)
                        if _PREDICT:
                            # predictive soft-stop + 3/4-consumed floor
                            # (see stepper.py for the measured rationale)
                            soft2 = jnp.logical_or(
                                jnp.logical_or(
                                    bx + 1.5 * (bx - bp[0]) > sxb,
                                    by + 1.5 * (by - bp[1]) > syb),
                                jnp.logical_or(bx > 0.75 * sxb,
                                               by > 0.75 * syb))
                        else:
                            soft2 = trip
                    else:
                        bx = by = zero
                        soft2, trip = jnp.asarray(True), false
                    # optimistic execution + rollback with backoff —
                    # identical decision logic to the single-chip loop
                    unrecoverable = jnp.logical_and(n_sub == 1,
                                                    done_i == 0)
                    recov = jnp.logical_and(
                        trip, jnp.logical_not(unrecoverable))
                    grd2 = jnp.logical_and(trip, unrecoverable)
                    return bx, by, soft2, recov, grd2

                def sub_cond(sc):
                    # both carries share the tail layout
                    # (..., t, tc, done, soft, grd, bp, nrb, slen)
                    t_i, done_i, soft = sc[-8], sc[-6], sc[-5]
                    return jnp.logical_and(
                        jnp.logical_not(soft),
                        jnp.logical_and(done_i < rb, t_i < il))

                if n_dev == 1:
                    # n_dev == 1 fast path: both ghost bands of the one
                    # slab are DOMAIN edges (walls bound y; the band fill
                    # never decays with steps), so up to sub_len whole
                    # steps run inside ONE chunk kernel call on the
                    # extended slab — the single-chip amortization —
                    # kept under shard_map so Mosaic still compiles the
                    # extended-slab spec. Round-5: the chunk kernel's
                    # HALO'D carry cores feed the next call DIRECTLY
                    # (the single-chip core-carry pattern) — slabs are
                    # extended/halo'd once per rebuild GROUP, not per
                    # sub-chunk, and the occupancy bound is the hoisted
                    # group constant. Step-for-step identical to the
                    # per-step path (CI: test_parallel.py chunked
                    # equivalence at n_dev=1).
                    zero3 = jnp.zeros((nypl, K, nx), dtype)
                    z1 = jnp.zeros((1,), jnp.int32)
                    lay_shim = pc.FusedLayout(
                        pidx=z1, hidx=z1, isf_c=stat_h[0],
                        mass_c=stat_h[1], wvx_c=stat_h[2],
                        wvy_c=stat_h[3], wbot_c=z1, wtop_c=z1,
                        refx_p=zero3, refy_p=zero3, occ=occl_g,
                        overflow=jnp.asarray(False))
                    hc0 = dict(
                        xH=pc.halo_ify(ls, x_e0, fill=BIG,
                                       xshift=spec.DL),
                        yH=pc.halo_ify(ls, ext(st["y"], 0.0)),
                        vxH=pc.halo_ify(ls, ext(st["vx"], 0.0)),
                        vyH=pc.halo_ify(ls, ext(st["vy"], 0.0)),
                        drP=ext(st["dr"], 0.0))
                    # rollback seeds in the chunk call's native (raw)
                    # forms: a first-sub-chunk rollback must restore the
                    # group-entry state exactly (halo_ify->ih and
                    # ext->ip are interior-exact inverses)
                    cnt_pad = jnp.zeros((ngl * Rl, nx), dtype)
                    cnt_pad = cnt_pad.at[Gh:Gh + rows_loc].set(st["cnt"])
                    aux0 = dict(
                        volH=pc.halo_ify(ls, ext(st["vol"], 0.0)),
                        b11H=pc.halo_ify(ls, ext(st["b11"], 0.0)),
                        b12H=pc.halo_ify(ls, ext(st["b12"], 0.0)),
                        b21H=pc.halo_ify(ls, ext(st["b21"], 0.0)),
                        b22H=pc.halo_ify(ls, ext(st["b22"], 0.0)),
                        rhoP=ext(st["rho"], 0.0), pP=ext(st["p"], 0.0),
                        drP=ext(st["dr"], 0.0), fxP=ext(st["fx"], 0.0),
                        fyP=ext(st["fy"], 0.0), fpxP=ext(st["fpx"], 0.0),
                        fpyP=ext(st["fpy"], 0.0),
                        cnt=cnt_pad.reshape(ngl, Rl * nx))

                    def sub_body(sc):
                        (hc, xPl, yPl, auxc, t_i, tc_i, done_i, soft,
                         grd, bp, nrb, slen) = sc
                        n_sub = jnp.minimum(
                            slen, jnp.asarray(rb, jnp.int32) - done_i)
                        stC, auxC, steps_done, t2, tc2 = \
                            pc.fused_chunk_call(
                                ls, lay_shim, hc["xH"], hc["yH"],
                                hc["vxH"], hc["vyH"], hc["drP"],
                                t_i, tc_i, il, n_sub, *scalars)
                        hc2 = dict(xH=stC["xH"], yH=stC["yH"],
                                   vxH=stC["vxH"], vyH=stC["vyH"],
                                   drP=stC["drP"])
                        bx, by, soft2, recov, grd2 = guard_eval(
                            ip(stC["xP"]), ip(stC["yP"]), bp, n_sub,
                            done_i)

                        def w(a, b):
                            return jnp.where(recov, a, b)

                        return (jax.tree_util.tree_map(w, hc, hc2),
                                w(xPl, stC["xP"]), w(yPl, stC["yP"]),
                                jax.tree_util.tree_map(w, auxc, auxC),
                                w(t_i, t2), w(tc_i, tc2),
                                jnp.where(recov, done_i,
                                          done_i + steps_done),
                                soft2 | recov, grd | grd2, (bx, by),
                                nrb + recov.astype(jnp.int32),
                                jnp.where(recov,
                                          jnp.maximum(n_sub // 2, 1),
                                          slen))

                    (hc, xPf, yPf, auxf, t2, tc2, steps_done, _, grd,
                     _, nrb_g, slen_g) = jax.lax.while_loop(
                        sub_cond, sub_body,
                        (hc0, x_e0, ext(st["y"], 0.0), aux0, t, tc, zi,
                         false, false, (zero, zero), zi, sub_len))
                    st = dict(
                        x=ip(xPf), y=ip(yPf),
                        vx=ih(hc["vxH"]), vy=ih(hc["vyH"]),
                        dr=ip(hc["drP"]),
                        vol=ih(auxf["volH"]), b11=ih(auxf["b11H"]),
                        b12=ih(auxf["b12H"]), b21=ih(auxf["b21H"]),
                        b22=ih(auxf["b22H"]), rho=ip(auxf["rhoP"]),
                        p=ip(auxf["pP"]), fx=ip(auxf["fxP"]),
                        fy=ip(auxf["fyP"]), fpx=ip(auxf["fpxP"]),
                        fpy=ip(auxf["fpyP"]),
                        cnt=auxf["cnt"].reshape(ngl * Rl, nx)
                        [Gh:Gh + rows_loc])
                else:
                    def sub_body(sc):
                        (st_i, t_i, tc_i, done_i, soft, grd, bp, nrb,
                         slen) = sc
                        n_sub = jnp.minimum(
                            slen, jnp.asarray(rb, jnp.int32) - done_i)

                        def scond(c):
                            i, s, t_c, tc_c = c
                            return jnp.logical_and(i < n_sub, t_c < il)

                        def sbody(c):
                            i, s, t_c, tc_c = c
                            s2, t2, tc2 = one_step(s, stat_h, occl_g,
                                                   t_c, tc_c)
                            return (i + 1, s2, t2, tc2)

                        steps_done, st2, t2, tc2 = jax.lax.while_loop(
                            scond, sbody, (zi, st_i, t_i, tc_i))
                        bx, by, soft2, recov, grd2 = guard_eval(
                            st2["x"], st2["y"], bp, n_sub, done_i)
                        st_out = jax.tree_util.tree_map(
                            lambda a, b: jnp.where(recov, a, b), st_i,
                            st2)
                        return (st_out, jnp.where(recov, t_i, t2),
                                jnp.where(recov, tc_i, tc2),
                                jnp.where(recov, done_i,
                                          done_i + steps_done),
                                soft2 | recov, grd | grd2, (bx, by),
                                nrb + recov.astype(jnp.int32),
                                jnp.where(recov,
                                          jnp.maximum(n_sub // 2, 1),
                                          slen))

                    (st, t2, tc2, steps_done, _, grd, _, nrb_g,
                     slen_g) = jax.lax.while_loop(
                        sub_cond, sub_body,
                        (st, t, tc, zi, false, false, (zero, zero), zi,
                         sub_len))
                sub_len2 = jnp.where(nrb_g == 0,
                                     jnp.minimum(2 * slen_g, _SUB), slen_g)

                new, pid_n, ovf, jumped = local_rebuild(
                    st, pidS, isfS, massS, wvxS, wvyS, wbotS, wtopS)
                st_next = dict(st)
                for k in ("x", "y", "vx", "vy", "dr") + AUX_KEYS:
                    st_next[k] = new[k]
                ovf_all = jax.lax.pmax(ovf.astype(jnp.int32), AXIS) > 0
                jump_all = jax.lax.pmax(jumped.astype(jnp.int32),
                                        AXIS) > 0
                return (st_next, pid_n, new["isf"], new["mass"],
                        new["wvx"], new["wvy"], new["wbot"], new["wtop"],
                        new["x"], new["y"], t2, tc2,
                        n_steps + steps_done, overflow | ovf_all,
                        guard | grd | jump_all, nroll + nrb_g, sub_len2)

            def group_cond(carry):
                return carry[10] < il

            carry = (st0, pidS, isfS, massS, wvxS, wvyS, wbotS, wtopS,
                     refxS, refyS, zero, zero, zi, false, false, zi,
                     jnp.asarray(_SUB, jnp.int32))
            (st, pidS, isfS, massS, wvxS, wvyS, wbotS, wtopS, _, _,
             _, _, n_steps, overflow, guard, nroll, _) = \
                jax.lax.while_loop(group_cond, group_body, carry)

            npairs = jax.lax.psum(jnp.sum(st["cnt"]), AXIS)
            outs = [st[k] for k in
                    ("x", "y", "vx", "vy", "dr")] + [pidS] + \
                   [st[k] for k in AUX_KEYS]
            return tuple(outs) + (n_steps, overflow, guard, nroll,
                                  npairs)

        sh, rp = P(AXIS), P()
        n_in = len(slabs_in)
        f = shard_map(body, mesh=self.mesh,
                      in_specs=(rp,) + (sh,) * n_in,
                      out_specs=(sh,) * (6 + len(AUX_KEYS))
                      + (rp,) * 5,
                      check_vma=False)
        out = f(interval_len, *slabs_in)
        (xO, yO, vxO, vyO, drO, pidO) = out[:6]
        aux_o = dict(zip(AUX_KEYS, out[6:6 + len(AUX_KEYS)]))
        n_steps, overflow, guard, n_rollbacks, npairs = out[-5:]

        # ---- collect to particle order (once per interval) ----
        pidF = pidO.reshape(-1)

        def collect(slab, fill=0.0):
            return jnp.full((n_total,), fill, slab.dtype).at[pidF].set(
                slab.reshape(-1), mode="drop")

        from ..ops.integration import periodic_wrap
        x_pp = periodic_wrap(spec, collect(xO))
        y_pp = collect(yO)
        new_state = State(
            x=x_pp, y=y_pp, vx=collect(vxO), vy=collect(vyO),
            rho=collect(aux_o["rho"]), p=collect(aux_o["p"]),
            drho_dt=collect(drO), fx=collect(aux_o["fx"]),
            fy=collect(aux_o["fy"]), fpx=collect(aux_o["fpx"]),
            fpy=collect(aux_o["fpy"]), vol=collect(aux_o["vol"]),
            b11=collect(aux_o["b11"]), b12=collect(aux_o["b12"]),
            b21=collect(aux_o["b21"]), b22=collect(aux_o["b22"]))

        # interval-final global rebuild (replicated, once per interval):
        # the returned layout feeds the next interval's entry scatter and
        # the wall-shear monitor — the reference's monitor-after-rebuild
        # ordering (SPH_Poiseuille.m:280-283)
        lay2 = pc.build_fused_layout(spec, x_pp, y_pp, self._mass,
                                     self._wall_vx, self._wall_vy,
                                     self._wall_y)
        tau_b, tau_t = self._fused_wall_shear(
            lay2, new_state.x, new_state.y, new_state.vx, new_state.vol,
            new_state.b11, new_state.b12, new_state.b21, new_state.b22,
            mu)
        v_max = jnp.sqrt(jnp.max(new_state.vx[:n_fluid] ** 2
                                 + new_state.vy[:n_fluid] ** 2))
        n_pairs = jnp.round(npairs).astype(jnp.int32)
        return IntervalResult(
            state=new_state, cands=lay2, geom=n_pairs,
            tau_bottom=tau_b, tau_top=tau_t, n_steps=n_steps,
            overflow=overflow | lay2.overflow, skin_guard=guard,
            v_max=v_max, n_pairs=n_pairs, n_rollbacks=n_rollbacks)

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
            return _exchange_bands(slab, fill, G, n_dev, rows_loc,
                                   gather_mode)

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
