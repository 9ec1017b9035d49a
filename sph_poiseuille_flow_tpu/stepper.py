"""On-device time stepper: the reference's hot loop as one jitted function.

The reference crosses the MATLAB<->C boundary 6 times per inner step
(SPH_Poiseuille.m:254-283). Here the ENTIRE output interval runs inside one
``lax.while_loop`` on device — zero host round-trips. Operator ORDER matches
the reference exactly, including its quirks:

  density_correction -> viscous(+gravity) -> shifting -> dt ->
  verlet(int1, kick, int2, finalize) -> wrap -> rebuild neighbors ->
  wall-shear monitor

i.e. shifting moves positions but the pair cache is only rebuilt AFTER
integration, so the verlet step integrates on slightly stale pair geometry
(SPH_Poiseuille.m:257, :280 — reproduced deliberately), and drho_dt is
carried across steps into the next step's half-kick. (Two computations are
hoisted without changing any value: dt depends only on pre-step velocities,
and the stage-1 density half-kick/EOS depends only on the density pass +
carried drho_dt.)

TPU performance shape: every physics operator is pure row-math over the
compacted dense neighbor matrix; ALL neighbor-side values flow through
exactly four packed gathers per step (gathers are the dominant cost on
TPU — see ops/neighbors.py):

  A [vol]  ->  B [B(4), v(2), rho_half, p_half]  ->  C [v_new(2)]
  ->  D [x, y, vol] (the next step's geometry)

The reference's cache-locality sort (SPH_Poiseuille.m:529-568) is
unnecessary on TPU (fixed data layout; the neighbor engine re-bins at every
rebuild) and is intentionally dropped; ``sort_interval`` remains accepted in
the config for compatibility.
"""

from __future__ import annotations

import dataclasses
import math
import os

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SPHConfig
from .models.poiseuille import Scene
from .ops import neighbors as nbr
from .ops.density import density_sums, kernel_gradient_correction
from .ops.viscosity import viscous_force
from .ops.transport import transport_correction
from .ops.integration import (continuity_rate, finalize_density, half_drift,
                              half_kick_eos, kick, periodic_wrap,
                              pressure_force, verlet_dt)
from .ops.monitors import wall_shear
from .ops.neighbors import gather_pack


class State(NamedTuple):
    """Particle state pytree (fluid first, walls last; reference
    SPH_Poiseuille.m:107-123, 208-219). Components are separate 1-D arrays
    — TPU-friendly layout (no (n,2) lane-2 tensors)."""

    x: jnp.ndarray
    y: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    rho: jnp.ndarray
    p: jnp.ndarray
    drho_dt: jnp.ndarray
    fx: jnp.ndarray        # pressure force (reference `force`)
    fy: jnp.ndarray
    fpx: jnp.ndarray       # prior force (viscous + gravity)
    fpy: jnp.ndarray
    vol: jnp.ndarray
    b11: jnp.ndarray
    b12: jnp.ndarray
    b21: jnp.ndarray
    b22: jnp.ndarray


STEP_LOG_CAP = 1024  # ring-buffer rows per interval (plenty: the densest
#                      preset logs interval/dt/step_log_every ~ 60 rows)
STEP_LOG_COLS = 7    # step, t, dt, n_pairs, v_max, tau_bottom, tau_top


class IntervalResult(NamedTuple):
    state: State
    cands: nbr.Candidates
    geom: nbr.Geometry
    tau_bottom: jnp.ndarray
    tau_top: jnp.ndarray
    n_steps: jnp.ndarray        # i32 steps executed this interval
    overflow: jnp.ndarray       # bool: neighbor cell-capacity overflow
    skin_guard: jnp.ndarray     # bool: skin displacement guard tripped
    v_max: jnp.ndarray
    n_pairs: jnp.ndarray        # reference-convention pair count
    # device-side step-log ring buffer (step_log_every > 0 only, else
    # None): every Nth step appends a STEP_LOG_COLS row; the driver
    # drains and prints them host-side per interval in the reference's
    # per-step format (SPH_Poiseuille.m:285-291). Replaces host
    # callbacks, which the tunneled TPU platform does not support.
    step_log: jnp.ndarray = None
    step_log_n: jnp.ndarray = None
    # fused engine only: sub-chunks discarded and re-run on fresh
    # candidates after a genuine drift-budget crossing (each costs one
    # wasted sub-chunk; a nonzero count is normal for burst transients,
    # the skin_guard flag above marks the unrecoverable case)
    n_rollbacks: jnp.ndarray = None
    # interval-local Kahan clock (value + compensation) at return. With
    # ``max_steps`` the loop may stop MID-interval (t_local <
    # interval_len); feeding (t_local, t_comp) back as (t_local0,
    # t_comp0) resumes the exact clock, so a step-bounded sequence of
    # dispatches reproduces the single-dispatch trajectory BIT-FOR-BIT —
    # the dt remainder clamp (min(dt, interval_len - t), the reference's
    # SPH_Poiseuille.m:250,259,267 semantics) still fires only at the
    # true output point (tests/test_stepper.py split-vs-unsplit)
    t_local: jnp.ndarray = None
    t_comp: jnp.ndarray = None
    # fused engine only: the rollback-backoff sub-chunk length at return
    # — feed back as ``sub_len0`` so a resumed call continues the
    # adaptive schedule exactly (required for split-vs-unsplit
    # bit-equality when a rollback halved the chunk length mid-interval)
    sub_len: jnp.ndarray = None


def _log_row_update(every, logbuf, logn, g_step, t_after, dt, n_pairs,
                    vmax, tau_b, tau_t):
    """Append one step-log row to the ring buffer when ``g_step`` lands on
    the ``every``-step cadence. Rows beyond STEP_LOG_CAP are dropped but
    still counted, so the driver can report truncation."""
    pred = (g_step % every) == 0
    row = jnp.stack([g_step.astype(logbuf.dtype), t_after, dt,
                     n_pairs.astype(logbuf.dtype), vmax, tau_b, tau_t])
    idx = jnp.minimum(logn, STEP_LOG_CAP - 1)
    write = jnp.logical_and(pred, logn < STEP_LOG_CAP)
    logbuf = jnp.where(write, logbuf.at[idx].set(row), logbuf)
    return logbuf, logn + pred.astype(jnp.int32)


def _t_add(t, comp, dt):
    """Kahan-compensated interval clock ``t += dt``.

    Interval-local time is O(1) while dt is O(1e-4..1e-3); bare f32
    accumulation drifts the per-interval step count by +-1 depending on
    interval length. Compensated summation keeps the clock exact to one
    ulp at zero carry cost, so the loop can terminate on ``t < interval``
    with a true remainder step — the reference's exact semantics
    (SPH_Poiseuille.m:250, :259, :267: dt = min(..., target - t), final
    step lands exactly on the output point)."""
    y = dt - comp
    s = t + y
    return s, (s - t) - y


def initial_state(cfg: SPHConfig, scene: Scene) -> State:
    dtype = jnp.dtype(cfg.dtype)
    n = scene.n_total
    z = jnp.zeros((n,), dtype)

    def arr(a):
        return jnp.asarray(a, dtype)

    mass = arr(scene.mass)
    rho = jnp.full((n,), cfg.rho0, dtype)
    return State(
        x=arr(scene.x), y=arr(scene.y), vx=z, vy=z, rho=rho, p=z,
        drho_dt=z, fx=z, fy=z, fpx=z, fpy=z, vol=mass / rho,
        b11=jnp.ones((n,), dtype), b12=z, b21=z, b22=jnp.ones((n,), dtype),
    )


class Engine:
    """Compiled simulation engine bound to one (config, scene) pair.

    Exposes: ``init(state)`` (initial neighbor build + density pass, maps
    SPH_Poiseuille.m:165-173), ``run_interval(state, cands, geom,
    interval_len)`` (the full inner loop to the next output point), and
    ``step(...)`` (a single step, for tests)."""

    def __init__(self, cfg: SPHConfig, scene: Scene):
        self.cfg = cfg
        self.scene = scene
        self.spec = nbr.make_grid_spec(cfg, scene)
        dtype = jnp.dtype(cfg.dtype)
        self._mass = jnp.asarray(scene.mass, dtype)
        self._wall_vx = jnp.zeros((scene.n_total,), dtype)
        self._wall_vy = jnp.zeros((scene.n_total,), dtype)
        self.init = jax.jit(self._init)
        self.run_interval = jax.jit(self._run_interval)

    def _rebuild(self, x, y):
        return nbr.build_candidates(self.spec, x, y, self._mass,
                                    self._wall_vx, self._wall_vy)

    # ---- single step (the reference's inner-loop body) ----
    def _step(self, state: State, cands, geom, step_idx, remain,
              g=None, mu=None):
        """One inner step. ``g``/``mu`` default to the config constants but
        may be traced scalars (parameter sweeps vmap over them)."""
        cfg, spec = self.cfg, self.spec
        g = cfg.gravity_g if g is None else g
        mu = cfg.mu if mu is None else mu
        nu = mu / cfg.rho0
        nf = spec.n_fluid
        js = cands.jsafe

        # dt (value identical to the reference's post-shifting evaluation:
        # it depends only on pre-step velocities, SPH_Poiseuille.m:259)
        dt = verlet_dt(state.vx[:nf], state.vy[:nf], cfg.c_f, cfg.h, nu, g,
                       remain)

        # density reinit + stage-1 half-kick EOS (value-preserving hoist)
        rho, vol = density_sums(spec, geom, cands, self._mass, cfg.rho0,
                                cfg.inv_sigma0)
        rho_half, p_half = half_kick_eos(spec, rho, state.drho_dt, dt,
                                         cfg.rho0, cfg.p0)

        (vol_j,) = gather_pack(js, (vol,))                     # gather A
        b11, b12, b21, b22 = kernel_gradient_correction(spec, geom, vol_j)

        (b11_j, b12_j, b21_j, b22_j, vx_j, vy_j, rho_half_j,
         p_half_j) = gather_pack(js, (b11, b12, b21, b22, state.vx,
                                      state.vy, rho_half, p_half))  # B

        fpx, fpy = viscous_force(
            spec, geom, cands, state.vx, state.vy, vol, b11, b12, b21, b22,
            vol_j, b11_j, b12_j, b21_j, b22_j, vx_j, vy_j, mu, cfg.h,
            cfg.wall_visc_factor)
        fpx = fpx.at[:nf].add(self._mass[:nf] * g)

        x, y = transport_correction(
            spec, geom, state.x, state.y, b11, b12, b21, b22,
            vol_j, b11_j, b12_j, b21_j, b22_j, cfg.h, cfg.transport_coeff)

        # verlet: stage 1 force, kick, stage 2, finalize
        x, y = half_drift(spec, x, y, state.vx, state.vy, dt)
        fx, fy, _ = pressure_force(
            spec, geom, cands, rho_half, p_half, self._mass, state.vx,
            state.vy, fpx, fpy, vol, b11, b12, b21, b22,
            vol_j, b11_j, b12_j, b21_j, b22_j, vx_j, vy_j,
            rho_half_j, p_half_j, cfg.rho0, cfg.c_f)
        vx2, vy2 = kick(spec, state.vx, state.vy, fpx, fpy, fx, fy,
                        self._mass, dt)
        x, y = half_drift(spec, x, y, vx2, vy2, dt)
        vx2_j, vy2_j = gather_pack(js, (vx2, vy2))             # gather C
        drho_dt = continuity_rate(spec, geom, cands, rho_half, vx2, vy2,
                                  vol_j, vx2_j, vy2_j)
        rho, p = finalize_density(spec, rho_half, drho_dt, dt, cfg.rho0,
                                  cfg.p0)

        x = periodic_wrap(spec, x)

        # neighbor refresh: candidates every `rebuild_every` steps (with a
        # runtime skin guard), geometry every step (gather D)
        if cfg.rebuild_every <= 1:
            cands = self._rebuild(x, y)
            guard = jnp.asarray(False)
        else:
            # accumulated stale-list drift past the half-skin budget is
            # SELF-HEALED by an early rebuild (the per-step analogue of
            # the fused engine's sub-chunk rollback; at the first budget
            # crossing no pair can yet be missing by more than one step's
            # motion, so healing forward is sound). Fatal only when ONE
            # step's own motion crosses the budget — rebuilding cannot
            # restore the invariant then (divergence / skin too small).
            drift_over = nbr.displacement_exceeded(self.spec, cands, x, y)
            cands = jax.lax.cond(
                jnp.logical_or(step_idx % cfg.rebuild_every == 0,
                               drift_over),
                lambda: self._rebuild(x, y),
                lambda: cands)
            guard = nbr.step_displacement_exceeded(
                self.spec, state.x, state.y, x, y)
        geom = nbr.compute_geometry(spec, cands, x, y, vol)

        tau_bottom, tau_top = wall_shear(
            spec, geom, cands, vx2, vol, b11, b12, b21, b22, cfg.DL, mu,
            cfg.h, cfg.wall_visc_factor)

        new_state = State(x=x, y=y, vx=vx2, vy=vy2, rho=rho, p=p,
                          drho_dt=drho_dt, fx=fx, fy=fy, fpx=fpx, fpy=fpy,
                          vol=vol, b11=b11, b12=b12, b21=b21, b22=b22)
        return (new_state, cands, geom, dt, cands.overflow, guard,
                tau_bottom, tau_top)

    def step(self, state: State, cands, geom, step_idx=0, remain=jnp.inf):
        """Single-step entry point for tests."""
        remain = jnp.asarray(remain, state.x.dtype)
        return self._step(state, cands, geom,
                          jnp.asarray(step_idx, jnp.int32), remain)

    # ---- initial neighbor + density pass (SPH_Poiseuille.m:165-173) ----
    def _init(self, state: State):
        cfg, spec = self.cfg, self.spec
        cands = self._rebuild(state.x, state.y)
        geom = nbr.compute_geometry(spec, cands, state.x, state.y,
                                    state.vol)
        rho, vol = density_sums(spec, geom, cands, self._mass, cfg.rho0,
                                cfg.inv_sigma0)
        (vol_j,) = gather_pack(cands.jsafe, (vol,))
        b11, b12, b21, b22 = kernel_gradient_correction(spec, geom, vol_j)
        p_f = cfg.p0 * (rho[: spec.n_fluid] / cfg.rho0 - 1.0)
        p = jnp.concatenate(
            [p_f, jnp.zeros((spec.n_total - spec.n_fluid,), p_f.dtype)])
        state = state._replace(rho=rho, p=p, vol=vol, b11=b11, b12=b12,
                               b21=b21, b22=b22)
        return state, cands, geom, cands.overflow

    def _count_pairs(self, cands, geom):
        return nbr.count_pairs(geom)

    # ---- full inner loop to the next output point ----
    def _run_interval(self, state: State, cands, geom, interval_len,
                      g=None, mu=None, t_base=None, step_base=None,
                      max_steps=None, t_local0=None, t_comp0=None,
                      steps_done0=None, sub_len0=None):
        """``max_steps`` (optional, traced) bounds this CALL's step count
        with NO change to any step's dt — the remainder clamp still
        fires only at the true output point. Feeding the returned
        (t_local, t_comp) back as (t_local0, t_comp0), and the number of
        interval steps already run as ``steps_done0``, continues the
        interval exactly where it stopped (see IntervalResult.t_local);
        Simulation uses this to split one output interval across
        device dispatches without changing the trajectory (the tunneled
        TPU kills single dispatches past ~60 s). ``steps_done0`` keeps
        the interval-local step index — and with it the
        ``rebuild_every`` candidate-refresh schedule — continuous:
        rebuilds at different steps re-order candidate slots, and
        non-associative f32 row sums then differ in the last ulp, so
        the schedule must match for bit-equality. ``sub_len0`` is a
        fused-engine resume knob, accepted and ignored here."""
        del sub_len0  # per-step engines have no chunk backoff state
        dtype = state.x.dtype
        interval_len = jnp.asarray(interval_len, dtype)
        every = self.cfg.step_log_every
        t_base = (jnp.asarray(0.0, dtype) if t_base is None
                  else jnp.asarray(t_base, dtype))
        step_base = (jnp.asarray(0, jnp.int32) if step_base is None
                     else jnp.asarray(step_base, jnp.int32))
        nf = self.spec.n_fluid
        ms = (None if max_steps is None
              else jnp.asarray(max_steps, jnp.int32))
        sd0 = (jnp.asarray(0, jnp.int32) if steps_done0 is None
               else jnp.asarray(steps_done0, jnp.int32))

        def cond(carry):
            _, _, _, t_local, _, n_steps, *_ = carry
            in_time = t_local < interval_len
            if ms is None:
                return in_time
            return jnp.logical_and(in_time, n_steps < ms)

        def body(carry):
            (state, cands, geom, t_local, t_comp, n_steps, overflow, guard,
             tau_b, tau_t, logbuf, logn) = carry
            remain = interval_len - t_local
            state, cands, geom, dt, ovf, grd, tau_b, tau_t = self._step(
                state, cands, geom, sd0 + n_steps, remain, g, mu)
            t_local, t_comp = _t_add(t_local, t_comp, dt)
            if every > 0:
                vmax = jnp.sqrt(jnp.max(state.vx[:nf] ** 2
                                        + state.vy[:nf] ** 2))
                logbuf, logn = _log_row_update(
                    every, logbuf, logn, step_base + n_steps + 1,
                    t_base + t_local, dt, self._count_pairs(cands, geom),
                    vmax, tau_b, tau_t)
            return (state, cands, geom, t_local, t_comp, n_steps + 1,
                    overflow | ovf, guard | grd, tau_b, tau_t,
                    logbuf, logn)

        zero = jnp.asarray(0.0, dtype)
        false = jnp.asarray(False)
        t0 = zero if t_local0 is None else jnp.asarray(t_local0, dtype)
        tc0 = zero if t_comp0 is None else jnp.asarray(t_comp0, dtype)
        logbuf0 = (jnp.zeros((STEP_LOG_CAP, STEP_LOG_COLS), dtype)
                   if every > 0 else None)
        carry = (state, cands, geom, t0, tc0, jnp.asarray(0, jnp.int32),
                 false, false, zero, zero, logbuf0,
                 jnp.asarray(0, jnp.int32) if every > 0 else None)
        (state, cands, geom, t_fin, tc_fin, n_steps, overflow, guard,
         tau_b, tau_t, logbuf, logn) = jax.lax.while_loop(cond, body, carry)

        v_max = jnp.sqrt(jnp.max(state.vx[:nf] ** 2 + state.vy[:nf] ** 2))
        n_pairs = self._count_pairs(cands, geom)
        return IntervalResult(state=state, cands=cands, geom=geom,
                              tau_bottom=tau_b, tau_top=tau_t,
                              n_steps=n_steps, overflow=overflow,
                              skin_guard=guard, v_max=v_max,
                              n_pairs=n_pairs,
                              step_log=logbuf, step_log_n=logn,
                              t_local=t_fin, t_comp=tc_fin)


class CellEngine:
    """Gather-free engine on the padded cell layout (ops/cellgrid.py).

    Same public API and step semantics as ``Engine`` — validated
    step-for-step against it — but every per-pair access is a static slice
    of the cell grid instead of a general gather; only one packed scatter
    and one packed collect per step touch particle order. This is the
    production TPU hot path."""

    def __init__(self, cfg: SPHConfig, scene: Scene, s_multiple: int = 1):
        from .ops import cellgrid as cg
        self._cg = cg
        self.cfg = cfg
        self.scene = scene
        self.spec = nbr.make_grid_spec(cfg, scene, s_multiple=s_multiple)
        dtype = jnp.dtype(cfg.dtype)
        self._mass = jnp.asarray(scene.mass, dtype)
        self._wall_vx = jnp.zeros((scene.n_total,), dtype)
        self._wall_vy = jnp.zeros((scene.n_total,), dtype)
        self._wall_y = jnp.asarray(scene.y, dtype)  # wall positions static
        self.init = jax.jit(self._init)
        self.run_interval = jax.jit(self._run_interval)

    def _rebuild(self, x, y):
        return self._cg.build_layout(self.spec, x, y, self._mass,
                                     self._wall_vx, self._wall_vy,
                                     self._wall_y)

    def _count_pairs(self, lay, geom):
        return self._cg.count_pairs(lay, geom)

    def _step(self, state: State, lay, geom, step_idx, remain,
              g=None, mu=None, tau_prev=None):
        cfg, spec, cg = self.cfg, self.spec, self._cg
        g = cfg.gravity_g if g is None else g
        mu = cfg.mu if mu is None else mu
        nu = mu / cfg.rho0
        nf = spec.n_fluid

        dt = verlet_dt(state.vx[:nf], state.vy[:nf], cfg.c_f, cfg.h, nu, g,
                       remain)
        out = cg.cell_step(
            spec, lay, geom, self._mass, state.x, state.y, state.vx,
            state.vy, state.drho_dt, dt, cfg.rho0, cfg.p0, cfg.c_f,
            cfg.inv_sigma0, cfg.transport_coeff, g, mu,
            cfg.wall_visc_factor)

        x = periodic_wrap(spec, out["x"])
        y = out["y"]

        if cfg.rebuild_every <= 1:
            lay = self._rebuild(x, y)
            guard = jnp.asarray(False)
        else:
            # same self-healing semantics as Engine._step: accumulated
            # drift -> early rebuild; single-step crossing -> fatal guard
            drift_over = cg.displacement_exceeded(spec, lay, x, y)
            lay = jax.lax.cond(
                jnp.logical_or(step_idx % cfg.rebuild_every == 0,
                               drift_over),
                lambda: self._rebuild(x, y),
                lambda: lay)
            guard = nbr.step_displacement_exceeded(
                spec, state.x, state.y, x, y)
        geom = cg.compute_geometry(spec, lay, x, y)

        # tau is only OBSERVED at the per-20-step log and at the output
        # point (SPH_Poiseuille.m:285-291, :289). When in-loop logging is
        # off, the monitor's (S, K, 9K) pair pass is STATICALLY dropped
        # from the loop body and _run_interval computes tau once per
        # interval from the final carry — value-identical to the final
        # step's in-loop tau. (A lax.cond here costs more than the monitor:
        # it splits the while body and forces operand materialization.)
        if tau_prev is None or cfg.step_log_every > 0:
            tau_bottom, tau_top = cg.cell_wall_shear(
                spec, lay, geom, out["vx"], out["vol"], out["b11"],
                out["b12"], out["b21"], out["b22"], mu,
                cfg.wall_visc_factor)
        else:
            tau_bottom, tau_top = tau_prev

        new_state = State(
            x=x, y=y, vx=out["vx"], vy=out["vy"], rho=out["rho"],
            p=out["p"], drho_dt=out["drho_dt"], fx=out["fx"], fy=out["fy"],
            fpx=out["fpx"], fpy=out["fpy"], vol=out["vol"],
            b11=out["b11"], b12=out["b12"], b21=out["b21"],
            b22=out["b22"])
        return (new_state, lay, geom, dt, lay.overflow, guard,
                tau_bottom, tau_top)

    def step(self, state: State, lay, geom, step_idx=0, remain=jnp.inf):
        remain = jnp.asarray(remain, state.x.dtype)
        return self._step(state, lay, geom,
                          jnp.asarray(step_idx, jnp.int32), remain)

    def _init(self, state: State):
        """Initial neighbor build + density/KGC/EOS pass
        (SPH_Poiseuille.m:165-173): a zero-dt, zero-shift cell step whose
        kinematic outputs are identities. ``drho_dt`` is PRESERVED — the
        reference carries it through its post-restart init into the first
        step's half-kick (SPH_Poiseuille.m S5), and it is already zero on a
        fresh start. (The zero-dt cell step never reads it.)"""
        cfg, spec, cg = self.cfg, self.spec, self._cg
        lay = self._rebuild(state.x, state.y)
        geom = cg.compute_geometry(spec, lay, state.x, state.y)
        out = cg.cell_step(
            spec, lay, geom, self._mass, state.x, state.y, state.vx,
            state.vy, state.drho_dt,
            jnp.asarray(0.0, state.x.dtype), cfg.rho0, cfg.p0, cfg.c_f,
            cfg.inv_sigma0, 0.0, cfg.gravity_g, cfg.mu,
            cfg.wall_visc_factor)
        state = state._replace(
            rho=out["rho"], p=out["p"], vol=out["vol"], b11=out["b11"],
            b12=out["b12"], b21=out["b21"], b22=out["b22"])
        return state, lay, geom, lay.overflow

    def _final_shear(self, state: State, lay, geom, mu):
        """Interval-final wall shear from the loop's final carry — equals
        the final step's in-loop value (same post-rebuild lay/geom and
        post-kick state, SPH_Poiseuille.m:280-283)."""
        cfg, spec = self.cfg, self.spec
        return self._cg.cell_wall_shear(
            spec, lay, geom, state.vx, state.vol, state.b11, state.b12,
            state.b21, state.b22, mu, cfg.wall_visc_factor)

    def _run_interval(self, state: State, lay, geom, interval_len,
                      g=None, mu=None, t_base=None, step_base=None,
                      max_steps=None, t_local0=None, t_comp0=None,
                      steps_done0=None, sub_len0=None):
        """``max_steps``/``t_local0``/``t_comp0``/``steps_done0``:
        trajectory-preserving step-bounded dispatch — see
        Engine._run_interval (``sub_len0`` accepted and ignored)."""
        del sub_len0
        dtype = state.x.dtype
        interval_len = jnp.asarray(interval_len, dtype)
        every = self.cfg.step_log_every
        t_base = (jnp.asarray(0.0, dtype) if t_base is None
                  else jnp.asarray(t_base, dtype))
        step_base = (jnp.asarray(0, jnp.int32) if step_base is None
                     else jnp.asarray(step_base, jnp.int32))
        nf = self.spec.n_fluid
        ms = (None if max_steps is None
              else jnp.asarray(max_steps, jnp.int32))
        sd0 = (jnp.asarray(0, jnp.int32) if steps_done0 is None
               else jnp.asarray(steps_done0, jnp.int32))

        def cond(carry):
            _, _, _, t_local, _, n_steps, *_ = carry
            in_time = t_local < interval_len
            if ms is None:
                return in_time
            return jnp.logical_and(in_time, n_steps < ms)

        def body(carry):
            (state, lay, geom, t_local, t_comp, n_steps, overflow, guard,
             tau_b, tau_t, logbuf, logn) = carry
            remain = interval_len - t_local
            state, lay, geom, dt, ovf, grd, tau_b, tau_t = self._step(
                state, lay, geom, sd0 + n_steps, remain, g, mu,
                tau_prev=(tau_b, tau_t))
            t_local, t_comp = _t_add(t_local, t_comp, dt)
            if every > 0:
                vmax = jnp.sqrt(jnp.max(state.vx[:nf] ** 2
                                        + state.vy[:nf] ** 2))
                logbuf, logn = _log_row_update(
                    every, logbuf, logn, step_base + n_steps + 1,
                    t_base + t_local, dt, self._count_pairs(lay, geom),
                    vmax, tau_b, tau_t)
            return (state, lay, geom, t_local, t_comp, n_steps + 1,
                    overflow | ovf, guard | grd, tau_b, tau_t,
                    logbuf, logn)

        zero = jnp.asarray(0.0, dtype)
        false = jnp.asarray(False)
        t0 = zero if t_local0 is None else jnp.asarray(t_local0, dtype)
        tc0 = zero if t_comp0 is None else jnp.asarray(t_comp0, dtype)
        logbuf0 = (jnp.zeros((STEP_LOG_CAP, STEP_LOG_COLS), dtype)
                   if every > 0 else None)
        carry = (state, lay, geom, t0, tc0, jnp.asarray(0, jnp.int32),
                 false, false, zero, zero, logbuf0,
                 jnp.asarray(0, jnp.int32) if every > 0 else None)
        (state, lay, geom, t_fin, tc_fin, n_steps, overflow, guard,
         tau_b, tau_t, logbuf, logn) = jax.lax.while_loop(cond, body, carry)

        if every == 0:
            # the loop body statically dropped the monitor (see _step)
            tau_b, tau_t = self._final_shear(
                state, lay, geom, self.cfg.mu if mu is None else mu)

        v_max = jnp.sqrt(jnp.max(state.vx[:nf] ** 2 + state.vy[:nf] ** 2))
        n_pairs = self._count_pairs(lay, geom)
        return IntervalResult(state=state, cands=lay, geom=geom,
                              tau_bottom=tau_b, tau_top=tau_t,
                              n_steps=n_steps, overflow=overflow,
                              skin_guard=guard, v_max=v_max,
                              n_pairs=n_pairs,
                              step_log=logbuf, step_log_n=logn,
                              t_local=t_fin, t_comp=tc_fin)


class PallasCellEngine(CellEngine):
    """Cell-layout engine with the ENTIRE physics step fused into one
    Pallas kernel (ops/fused_cell.py): four phase-sweeps over a
    (sweep, row-group) grid with every pair intermediate resident in VMEM
    — per step only the tiny per-particle state crosses HBM. The ``geom``
    slot of the engine API carries the step's pair count (the kernel
    replaces the geometry structure entirely).

    The interval loop carries state AS CORES: per step, positions and
    velocities flow kernel-output -> wrap -> halo-ify -> kernel-input
    without ever materializing particle order (scatter/take are general
    gathers — measured ~2x the kernel's own cost when done per step).
    Per-particle order exists only at candidate rebuilds (every
    ``rebuild_every`` steps) and at interval ends."""

    def __init__(self, cfg: SPHConfig, scene: Scene, s_multiple: int = 1):
        super().__init__(cfg, scene, s_multiple=s_multiple)
        # lane-packed grid: nx chosen so a row group fills 128-lane vregs
        # and x cells widen beyond cand_cutoff (enlarging the per-axis x
        # drift budget the chunk guard checks); the XLA cellgrid twins
        # this class falls back to for logging/tests accept any
        # consistent spec, and their radial skin guard is conservative
        # w.r.t. the per-axis budgets (skin <= min(skin_x, skin_y))
        self.spec = nbr.make_grid_spec(cfg, scene, s_multiple=s_multiple,
                                       lane_pack=True)
        from .ops import fused_cell as pc
        self._pc = pc

    def _rebuild(self, x, y):
        return self._pc.build_fused_layout(
            self.spec, x, y, self._mass, self._wall_vx, self._wall_vy,
            self._wall_y)

    def _fused_cell_step(self, lay, x, y, vx, vy, drho_dt, dt, g, mu,
                         transport_coeff=None):
        """Single fused-step hook: the sharded engine
        (parallel.ShardedPallasEngine) overrides this with the y-slab
        shard_map version; everything else in _step/_init is shared."""
        cfg = self.cfg
        tc = (cfg.transport_coeff if transport_coeff is None
              else transport_coeff)
        return self._pc.fused_cell_step(
            self.spec, lay, x, y, vx, vy, drho_dt, dt, cfg.rho0, cfg.p0,
            cfg.c_f, cfg.inv_sigma0, tc, g, mu, cfg.wall_visc_factor)

    def _step(self, state: State, lay, geom, step_idx, remain,
              g=None, mu=None, tau_prev=None):
        cfg, spec = self.cfg, self.spec
        g = cfg.gravity_g if g is None else g
        mu = cfg.mu if mu is None else mu
        nu = mu / cfg.rho0
        nf = spec.n_fluid

        dt = verlet_dt(state.vx[:nf], state.vy[:nf], cfg.c_f, cfg.h, nu, g,
                       remain)
        out = self._fused_cell_step(
            lay, state.x, state.y, state.vx, state.vy,
            state.drho_dt, dt, g, mu)

        # positions stay UNWRAPPED between rebuilds (translated-halo pair
        # geometry needs center values continuous with the frozen cell
        # assignment); the wrap lands exactly on rebuild steps
        x_raw = out["x"]
        y = out["y"]

        def fused_guard(lay, x):
            if spec.skin <= 0.0:
                return jnp.asarray(False)
            ddx = x - self._pc.take_p(lay, lay.refx_p)
            ddx = ddx - spec.DL * jnp.round(ddx / spec.DL)
            ddy = y - self._pc.take_p(lay, lay.refy_p)
            return jnp.max(ddx * ddx + ddy * ddy) > (0.5 * spec.skin) ** 2

        # the single-step path keeps the conservative ABSOLUTE-displacement
        # guard, so its cadence is clamped to 8 regardless of the chunk
        # path's pair-relative cap (rebuild_every); this path only serves
        # in-loop logging and tests, not the hot path
        rb_eff = min(cfg.rebuild_every, 8)
        if rb_eff <= 1:
            x = periodic_wrap(spec, x_raw)
            lay = self._rebuild(x, y)
            guard = jnp.asarray(False)
        else:
            do_rb = step_idx % rb_eff == 0
            x = jnp.where(do_rb, periodic_wrap(spec, x_raw), x_raw)
            lay = jax.lax.cond(
                do_rb,
                lambda: self._rebuild(x, y),
                lambda: lay)
            guard = fused_guard(lay, x)

        # same static tau-observation schedule as CellEngine._step
        if tau_prev is None or cfg.step_log_every > 0:
            tau_bottom, tau_top = self._fused_wall_shear(
                lay, x, y, out["vx"], out["vol"], out["b11"],
                out["b12"], out["b21"], out["b22"], mu)
        else:
            tau_bottom, tau_top = tau_prev

        new_state = State(
            x=x, y=y, vx=out["vx"], vy=out["vy"], rho=out["rho"],
            p=out["p"], drho_dt=out["drho_dt"], fx=out["fx"], fy=out["fy"],
            fpx=out["fpx"], fpy=out["fpy"], vol=out["vol"],
            b11=out["b11"], b12=out["b12"], b21=out["b21"],
            b22=out["b22"])
        return (new_state, lay, out["n_pairs"], dt, lay.overflow, guard,
                tau_bottom, tau_top)

    def _init(self, state: State):
        cfg, spec = self.cfg, self.spec
        lay = self._rebuild(state.x, state.y)
        out = self._fused_cell_step(
            lay, state.x, state.y, state.vx, state.vy, state.drho_dt,
            jnp.asarray(0.0, state.x.dtype), cfg.gravity_g, cfg.mu,
            transport_coeff=0.0)
        # drho_dt preserved across restart (see CellEngine._init)
        state = state._replace(
            rho=out["rho"], p=out["p"], vol=out["vol"], b11=out["b11"],
            b12=out["b12"], b21=out["b21"], b22=out["b22"])
        return state, lay, out["n_pairs"], lay.overflow

    def _fused_wall_shear(self, lay, x, y, vx, vol, b11, b12, b21, b22,
                          mu):
        """Wall-shear hook (sharded engine wraps it in a replicated
        shard_map so the Pallas monitor runs per-device under GSPMD)."""
        return self._pc.fused_wall_shear(
            self.spec, lay, x, y, vx, vol, b11, b12, b21, b22, mu,
            self.cfg.wall_visc_factor)

    def _final_shear(self, state: State, lay, geom, mu):
        return self._fused_wall_shear(
            lay, state.x, state.y, state.vx, state.vol,
            state.b11, state.b12, state.b21, state.b22, mu)

    def _count_pairs(self, lay, geom):
        return geom  # carried from the step's density kernel

    def _run_interval(self, state: State, lay, geom, interval_len,
                      g=None, mu=None, t_base=None, step_base=None,
                      max_steps=None, t_local0=None, t_comp0=None,
                      steps_done0=None, sub_len0=None):
        """Core-carry interval loop (see class docstring). Falls back to
        the generic per-particle loop when in-loop logging is on (the log
        path needs per-step particle-order observables and is not a hot
        path). ``max_steps``/``t_local0``/``t_comp0``: trajectory-
        preserving step-bounded dispatch — see Engine._run_interval. The
        bound binds at sub-chunk GROUP boundaries (see the note above
        ``ms`` below), so a call may overshoot by up to rebuild_every - 1
        steps. ``steps_done0`` is unused by the hot path (the adaptive
        drift guard schedules rebuilds from measured drift, not the step
        index) but accepted for driver symmetry and passed to the
        logging fallback. ``sub_len0`` resumes the rollback-backoff
        chunk length (IntervalResult.sub_len) so the adaptive schedule
        continues exactly where the previous call stopped."""
        if self.cfg.step_log_every > 0:
            return CellEngine._run_interval(
                self, state, lay, geom, interval_len, g=g, mu=mu,
                t_base=t_base, step_base=step_base, max_steps=max_steps,
                t_local0=t_local0, t_comp0=t_comp0,
                steps_done0=steps_done0)

        cfg, spec, pc = self.cfg, self.spec, self._pc
        g = cfg.gravity_g if g is None else g
        mu = cfg.mu if mu is None else mu
        nu = mu / cfg.rho0
        dtype = state.x.dtype
        interval_len = jnp.asarray(interval_len, dtype)
        scalars = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0,
                   cfg.transport_coeff, g, mu, cfg.wall_visc_factor)

        def scatter_all(lay, s: State):
            cores = dict(
                xH=pc.make_core(spec, lay.pidx, s.x, fill=pc._BIG_X,
                                xshift=spec.DL),
                yH=pc.make_core(spec, lay.pidx, s.y),
                vxH=pc.make_core(spec, lay.pidx, s.vx),
                vyH=pc.make_core(spec, lay.pidx, s.vy),
                drP=pc.make_plain(spec, lay.pidx, s.drho_dt),
                rhoP=pc.make_plain(spec, lay.pidx, s.rho),
                pP=pc.make_plain(spec, lay.pidx, s.p),
                fxP=pc.make_plain(spec, lay.pidx, s.fx),
                fyP=pc.make_plain(spec, lay.pidx, s.fy),
                fpxP=pc.make_plain(spec, lay.pidx, s.fpx),
                fpyP=pc.make_plain(spec, lay.pidx, s.fpy),
                volH=pc.make_core(spec, lay.pidx, s.vol),
                b11H=pc.make_core(spec, lay.pidx, s.b11),
                b12H=pc.make_core(spec, lay.pidx, s.b12),
                b21H=pc.make_core(spec, lay.pidx, s.b21),
                b22H=pc.make_core(spec, lay.pidx, s.b22))
            return cores

        # chunked stepping: one kernel call advances up to _SUB whole
        # steps entirely in VMEM (ops/fused_cell._chunk_kernel); the
        # candidate rebuild stays out here, and so does the candidate
        # VALIDITY check: pair_drift_bounds runs once per SUB-CHUNK on
        # the returned position cores (in-kernel per-step variants all
        # measured ~30% of a step — TPU predication executes both
        # paths). Sub-chunks repeat WITHOUT a rebuild until the drift
        # bound crosses the soft line (predictive extrapolation or the
        # 3/4-consumed floor), the rebuild_every cap, or the interval
        # end — the adaptive cadence: transient shifting-dominated drift
        # rebuilds every ~1.5 sub-chunks, developed flow stretches to
        # the cap. A genuine >budget violation rolls the sub-chunk back,
        # halves the sub-chunk length, and re-runs on fresh candidates
        # (see sub_body); only a SINGLE-STEP trip straight out of a
        # rebuild — divergence, not a burst — hard-flags the run
        # (skin_guard).
        rb = max(1, int(cfg.rebuild_every))
        # steps per kernel call: amortizes the ~0.13 ms fixed call cost;
        # the PREDICTIVE stop below keeps one sub-chunk of drift from
        # overshooting the budget. 16 measured best (32 halves call
        # overhead but doubles the drift-check granularity the predictor
        # must cover); config knob cfg.sub_steps, SPH_SUB_STEPS env
        # override for probing.
        _SUB = min(rb, int(os.environ.get("SPH_SUB_STEPS", "")
                           or getattr(cfg, "sub_steps", 16)))
        # probe/testing knob: 0 disables the predictive soft-stop and the
        # consumed-fraction floor so every group runs to a genuine budget
        # crossing — exercises the rollback path deterministically
        _PREDICT = os.environ.get("SPH_DRIFT_PREDICTOR", "1") != "0"
        sxb = jnp.asarray(spec.skin_x, dtype)
        syb = jnp.asarray(spec.skin_y, dtype)

        # The step budget binds at sub-chunk GROUP boundaries only: a
        # group always runs its natural length (drift soft-stop or the
        # rebuild cap), so the group/rebuild schedule — and with it the
        # slot order behind the f32 reduction order — is IDENTICAL to the
        # unsplit run's by construction (cutting a group short would
        # insert a rebuild the unsplit run didn't have, re-ordering
        # reductions in the last ulp). A call may therefore overshoot
        # max_steps by up to rebuild_every - 1 steps; size the budget
        # with that slack (Simulation._dispatch_interval documents it).
        ms = (None if max_steps is None
              else jnp.asarray(max_steps, jnp.int32))

        def body(carry):
            (lay, cores, pidx_e, hidx_e, npairs, t_local, t_comp, n_steps,
             overflow, guard, nroll, sub_len) = carry

            def sub_cond(sc):
                st, t_i, tc_i, done_i, soft, grd, bp, nrb, slen = sc
                return jnp.logical_and(
                    jnp.logical_not(soft),
                    jnp.logical_and(done_i < rb, t_i < interval_len))

            def sub_body(sc):
                st, t_i, tc_i, done_i, soft, grd, bp, nrb, slen = sc
                n_sub = jnp.minimum(slen,
                                    jnp.asarray(rb, jnp.int32) - done_i)
                st2, aux2, steps_done, t2, tc2 = pc.fused_chunk_call(
                    spec, lay, st["xH"], st["yH"], st["vxH"],
                    st["vyH"], st["drP"], t_i, tc_i,
                    interval_len, n_sub, *scalars)
                if spec.skin > 0.0:
                    bx, by = pc.pair_drift_bounds(
                        spec, lay, st2["xP"], st2["yP"])
                    # PREDICTIVE stop: rebuild when one more sub-chunk of
                    # drift (1.5x the increment just measured; drift
                    # rates are physics-smooth, they cannot 1.5x within
                    # 16 steps) would cross the per-axis budget. A
                    # genuine crossing rolls the sub-chunk back (below) —
                    # the predictor only schedules rebuilds to keep
                    # rollbacks rare, it is not the validity check.
                    #
                    # CONSUMED-FRACTION FLOOR: the global-max bound can
                    # PLATEAU just under the budget (one window saturates,
                    # increments ~0, extrapolation stays quiet) while a
                    # second window climbs underneath; when it overtakes,
                    # the first measured increment may already overshoot.
                    # Measured at dp=0.01 (full 20 s lane-packed run):
                    # plateau-then-burst tripped the hard guard at t=7.5 s
                    # (rb=128) / t=3.25 s (rb=32). Stopping whenever 3/4 of
                    # a budget is consumed bounds the worst case: a trip
                    # would need one 16-step sub-chunk to consume >1/4 of
                    # a budget, ~2x the peak shear-rate drift.
                    trip = jnp.logical_or(bx > sxb, by > syb)
                    if _PREDICT:
                        soft2 = jnp.logical_or(
                            jnp.logical_or(
                                bx + 1.5 * (bx - bp[0]) > sxb,
                                by + 1.5 * (by - bp[1]) > syb),
                            jnp.logical_or(bx > 0.75 * sxb,
                                           by > 0.75 * syb))
                    else:
                        # SPH_DRIFT_PREDICTOR=0 (testing): no scheduling —
                        # groups run until a genuine crossing, exercising
                        # the rollback path on every rebuild
                        soft2 = trip
                else:
                    bx = by = jnp.asarray(0.0, dtype)
                    soft2, trip = jnp.asarray(True), jnp.asarray(False)
                st2 = dict(st2, **{k: aux2[k] for k in aux2})
                # OPTIMISTIC EXECUTION + ROLLBACK WITH BACKOFF: a genuine
                # budget crossing means this sub-chunk's trailing steps
                # may have missed pairs — so the chunk is DISCARDED
                # (state, t, and step count roll back to the pre-chunk
                # carry), the sub-chunk length HALVES, the group ends
                # (soft stop -> rebuild), and the next group re-runs the
                # same steps shorter on fresh candidates. Progress is
                # guaranteed: every retry either freshens the budget
                # (rebuild) or halves the chunk, terminating at a
                # single-step chunk from a fresh rebuild — if THAT
                # crosses a budget (>= 0.3dp of pair-relative motion in
                # one dt-stable step: divergence or a mis-sized skin,
                # not a burst), the step is kept and the run is
                # hard-flagged rather than looping forever. Cost: one
                # wasted sub-chunk per burst; the 20 s dp=0.01 run sees a
                # handful (measured: bursts cross a FULL budget within 16
                # steps at developed flow, e.g. t=16 s, while the same
                # interval at 4-step granularity never trips).
                unrecoverable = jnp.logical_and(n_sub == 1, done_i == 0)
                recov = jnp.logical_and(trip,
                                        jnp.logical_not(unrecoverable))
                grd2 = jnp.logical_and(trip, unrecoverable)
                st_out = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(recov, a, b), st, st2)
                t_out = jnp.where(recov, t_i, t2)
                tc_out = jnp.where(recov, tc_i, tc2)
                done_out = jnp.where(recov, done_i, done_i + steps_done)
                slen_out = jnp.where(recov,
                                     jnp.maximum(n_sub // 2, 1), slen)
                return (st_out, t_out, tc_out, done_out,
                        soft2 | recov, grd | grd2, (bx, by),
                        nrb + recov.astype(jnp.int32), slen_out)

            # seed the sub-chunk carry with the incoming cores plus
            # zero-filled aux slots (shapes must match the loop body)
            st0 = dict(
                xH=cores["xH"], yH=cores["yH"], vxH=cores["vxH"],
                vyH=cores["vyH"], drP=cores["drP"],
                xP=cores["xH"][1:-1, :, 1:-1],
                yP=cores["yH"][1:-1, :, 1:-1],
                volH=cores["volH"], b11H=cores["b11H"],
                b12H=cores["b12H"], b21H=cores["b21H"],
                b22H=cores["b22H"], rhoP=cores["rhoP"], pP=cores["pP"],
                fxP=cores["fxP"], fyP=cores["fyP"], fpxP=cores["fpxP"],
                fpyP=cores["fpyP"],
                cnt=jnp.zeros((pc.plan(spec)[2], pc.plan(spec)[1]),
                              dtype))
            zb = jnp.asarray(0.0, dtype)
            (st, t2, tc2, steps_done, _, grd, _, nrb_g, slen_g) = \
                jax.lax.while_loop(
                    sub_cond, sub_body,
                    (st0, t_local, t_comp, jnp.asarray(0, jnp.int32),
                     jnp.asarray(False), jnp.asarray(False), (zb, zb),
                     jnp.asarray(0, jnp.int32), sub_len))
            # backoff recovery: a trip-free group earns the next group a
            # doubled sub-chunk (capped at the configured maximum), so a
            # burst's halving doesn't permanently shrink the chunk size
            sub_len2 = jnp.where(nrb_g == 0,
                                 jnp.minimum(2 * slen_g, _SUB), slen_g)
            aux = st

            def do_rebuild():
                # packed takes (one row-gather per index set) ...
                pk = jnp.stack([st["xP"].reshape(-1),
                                st["yP"].reshape(-1),
                                st["drP"].reshape(-1)], axis=-1)[lay.pidx]
                hk = jnp.stack([st["vxH"].reshape(-1),
                                st["vyH"].reshape(-1)], axis=-1)[lay.hidx]
                # positions leave the chunk UNWRAPPED (translated-halo
                # geometry); wrap exactly at rebuilds, like the
                # reference's per-step mod (SPH_Poiseuille.m:570-577)
                xp = periodic_wrap(spec, pk[:, 0])
                yp, drp = pk[:, 1], pk[:, 2]
                vxp, vyp = hk[:, 0], hk[:, 1]
                # ... and one packed scatter for the whole new layout: the
                # state rides build_fused_layout's scatter; the ref cores
                # ARE the new position cores
                nl, (vxPc, vyPc, drPc) = pc.build_fused_layout(
                    spec, xp, yp, self._mass, self._wall_vx,
                    self._wall_vy, self._wall_y,
                    state_fields=(vxp, vyp, drp))
                return (nl,
                        pc.halo_ify(spec, nl.refx_p, fill=pc._BIG_X,
                                    xshift=spec.DL),
                        pc.halo_ify(spec, nl.refy_p),
                        pc.halo_ify(spec, vxPc),
                        pc.halo_ify(spec, vyPc),
                        drPc)

            # rebuild after every sub-chunk GROUP: drift- and cap-ended
            # groups need it for candidate validity, and the
            # interval-final group needs it so the wrap applied in
            # do_rebuild stays consistent with the translated-halo pair
            # geometry (a wrap under frozen cell membership would
            # teleport seam particles). No lax.cond in the hot loop.
            lay2, xH, yH, vxH, vyH, drP = do_rebuild()

            new_cores = dict(
                xH=xH, yH=yH, vxH=vxH, vyH=vyH, drP=drP,
                rhoP=aux["rhoP"], pP=aux["pP"], fxP=aux["fxP"],
                fyP=aux["fyP"], fpxP=aux["fpxP"], fpyP=aux["fpyP"],
                volH=aux["volH"], b11H=aux["b11H"], b12H=aux["b12H"],
                b21H=aux["b21H"], b22H=aux["b22H"])
            npairs = jnp.round(jnp.sum(aux["cnt"])).astype(jnp.int32)
            return (lay2, new_cores, lay.pidx, lay.hidx, npairs, t2,
                    tc2, n_steps + steps_done, overflow | lay2.overflow,
                    guard | grd, nroll + nrb_g, sub_len2)

        def cond(carry):
            in_time = carry[5] < interval_len
            if ms is None:
                return in_time
            return jnp.logical_and(in_time, carry[7] < ms)

        zero = jnp.asarray(0.0, dtype)
        t0 = zero if t_local0 is None else jnp.asarray(t_local0, dtype)
        tc0 = zero if t_comp0 is None else jnp.asarray(t_comp0, dtype)
        sl0 = (jnp.asarray(_SUB, jnp.int32) if sub_len0 is None
               else jnp.minimum(jnp.asarray(sub_len0, jnp.int32), _SUB))
        cores0 = scatter_all(lay, state)
        # aux fields (rho..b22) are collected with the EXEC-layout indices
        # — the layout in effect when the last chunk produced them (a
        # trailing rebuild changes lay but not the produced cores)
        carry = (lay, cores0, lay.pidx, lay.hidx,
                 jnp.asarray(geom, jnp.int32), t0, tc0,
                 jnp.asarray(0, jnp.int32), lay.overflow,
                 jnp.asarray(False), jnp.asarray(0, jnp.int32), sl0)
        (lay, cores, pidx_e, hidx_e, n_pairs, t_fin, tc_fin, n_steps,
         overflow, guard, n_rollbacks, sub_len_fin) = jax.lax.while_loop(
             cond, body, carry)

        def tk_p(c):
            return c.reshape(-1)[pidx_e]

        def tk_h(c):
            return c.reshape(-1)[hidx_e]

        # NOTE: xH/yH/vxH/vyH/drP in `cores` are in the CURRENT lay (a
        # trailing rebuild re-scattered them); the aux outputs are in the
        # exec layout. Collect each with its own indices.
        state = State(
            # wrap on collection: the last chunk of the interval may end
            # off-rebuild with (microscopically) unwrapped positions
            x=periodic_wrap(spec, cores["xH"].reshape(-1)[lay.hidx]),
            y=cores["yH"].reshape(-1)[lay.hidx],
            vx=cores["vxH"].reshape(-1)[lay.hidx],
            vy=cores["vyH"].reshape(-1)[lay.hidx],
            rho=tk_p(cores["rhoP"]), p=tk_p(cores["pP"]),
            drho_dt=cores["drP"].reshape(-1)[lay.pidx],
            fx=tk_p(cores["fxP"]), fy=tk_p(cores["fyP"]),
            fpx=tk_p(cores["fpxP"]), fpy=tk_p(cores["fpyP"]),
            vol=tk_h(cores["volH"]), b11=tk_h(cores["b11H"]),
            b12=tk_h(cores["b12H"]), b21=tk_h(cores["b21H"]),
            b22=tk_h(cores["b22H"]))

        # interval-final wall shear on the POST-rebuild layout — the
        # reference's ordering (monitor after rebuild,
        # SPH_Poiseuille.m:280-283); value-identical to the final step's
        # in-loop tau (test_cellgrid.py observation-schedule proof)
        tau_b, tau_t = self._final_shear(state, lay, None, mu)

        nf = spec.n_fluid
        v_max = jnp.sqrt(jnp.max(state.vx[:nf] ** 2 + state.vy[:nf] ** 2))
        return IntervalResult(state=state, cands=lay, geom=n_pairs,
                              tau_bottom=tau_b, tau_top=tau_t,
                              n_steps=n_steps, overflow=overflow,
                              skin_guard=guard, v_max=v_max,
                              n_pairs=n_pairs, n_rollbacks=n_rollbacks,
                              t_local=t_fin, t_comp=tc_fin,
                              sub_len=sub_len_fin)


def resolve_engine_name(cfg: SPHConfig, scene: Scene = None) -> str:
    """Resolve cfg.engine, mapping "auto" to the flagship fused Pallas
    engine on TPU and the XLA cellgrid engine elsewhere (off-TPU the
    Pallas kernels run interpreted — correct but slow)."""
    if cfg.engine != "auto":
        return cfg.engine
    if jax.default_backend() != "tpu":
        return "cellgrid"
    if cfg.dtype == "float64":
        # TPU hardware has no f64 vector units; the Mosaic kernels only
        # compile in f32 — f64 runs use the XLA engine (which emulates)
        return "cellgrid"
    # No size cap: Mosaic streams cores through VMEM past the nominal
    # on-chip capacity — measured working up to dp=0.005 (124.8k
    # particles, 1.71e7 psteps/s) on a single v5e.
    return "pallas"


def make_engine(cfg: SPHConfig, scene: Scene):
    """Engine factory honoring cfg.engine
    ("auto" | "pallas" | "cellgrid" | "gather")."""
    if cfg.dtype == "float64" and not jax.config.jax_enable_x64:
        # without x64, float64 requests silently downcast to f32 — enable
        # it (only affects default dtypes of NEW traces; our arrays carry
        # explicit dtypes throughout)
        jax.config.update("jax_enable_x64", True)
    name = resolve_engine_name(cfg, scene)
    if name != cfg.engine:
        cfg = dataclasses.replace(cfg, engine=name)
    if cfg.engine == "cellgrid":
        return CellEngine(cfg, scene)
    if cfg.engine == "pallas":
        return PallasCellEngine(cfg, scene)
    if cfg.engine == "gather":
        return Engine(cfg, scene)
    raise ValueError(f"unknown engine {cfg.engine!r}")
