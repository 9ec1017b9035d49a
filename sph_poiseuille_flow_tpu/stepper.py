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
carried across steps into the next step's half-kick.

The reference's cache-locality sort (SPH_Poiseuille.m:529-568) is
unnecessary on TPU (data layout is fixed; the neighbor engine re-bins every
rebuild) and is intentionally dropped; ``sort_interval`` remains accepted in
the config for compatibility.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SPHConfig
from .models.poiseuille import Scene
from .ops import neighbors as nbr
from .ops.density import density_correction
from .ops.viscosity import viscous_force
from .ops.transport import transport_correction
from .ops.integration import (verlet_dt, verlet_step, periodic_wrap)
from .ops.monitors import wall_shear


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


class IntervalResult(NamedTuple):
    state: State
    idx: jnp.ndarray            # candidate table (carried across intervals)
    cache: nbr.NeighborCache
    tau_bottom: jnp.ndarray
    tau_top: jnp.ndarray
    n_steps: jnp.ndarray        # i32 steps executed this interval
    overflow: jnp.ndarray       # bool: any neighbor-cell overflow
    v_max: jnp.ndarray
    n_pairs: jnp.ndarray        # reference-convention pair count


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
    SPH_Poiseuille.m:165-173), ``run_interval(state, idx, cache,
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
        # time-accumulation epsilon: interval-local time is O(1), so f32
        # resolution is ~1e-7; 1e-6 cleanly terminates the while loop
        self._eps_t = 1e-6
        self.init = jax.jit(self._init)
        self.run_interval = jax.jit(self._run_interval)

    # ---- single step (the reference's inner-loop body) ----
    def _step(self, state: State, idx, cache, step_idx, remain,
              g=None, mu=None):
        """One inner step. ``g``/``mu`` default to the config constants but
        may be traced scalars (parameter sweeps vmap over them)."""
        cfg, spec = self.cfg, self.spec
        g = cfg.gravity_g if g is None else g
        mu = cfg.mu if mu is None else mu
        nu = mu / cfg.rho0
        rho, vol, b11, b12, b21, b22 = density_correction(
            spec, cache, self._mass, cfg.rho0, cfg.inv_sigma0)

        fpx, fpy = viscous_force(
            spec, cache, state.vx, state.vy, vol, b11, b12, b21, b22,
            self._wall_vx, self._wall_vy, mu, cfg.h)
        fpx = fpx.at[: spec.n_fluid].add(self._mass[: spec.n_fluid] * g)

        x, y = transport_correction(
            spec, cache, state.x, state.y, vol, b11, b12, b21, b22,
            cfg.h, cfg.transport_coeff)

        dt = verlet_dt(state.vx[: spec.n_fluid], state.vy[: spec.n_fluid],
                       cfg.c_f, cfg.h, nu, g, remain)

        rho, p, x, y, vx, vy, drho_dt, fx, fy = verlet_step(
            spec, cache, vol, b11, b12, b21, b22, rho, self._mass,
            x, y, state.vx, state.vy, state.drho_dt, fpx, fpy,
            self._wall_vx, self._wall_vy, dt, cfg.rho0, cfg.p0, cfg.c_f)

        x = periodic_wrap(spec, x)

        # neighbor refresh: candidates every `rebuild_every` steps,
        # geometry every step
        if cfg.rebuild_every <= 1:
            idx, overflow = nbr.build_candidates(spec, x, y)
        else:
            idx, overflow = jax.lax.cond(
                step_idx % cfg.rebuild_every == 0,
                lambda: nbr.build_candidates(spec, x, y),
                lambda: (idx, jnp.asarray(False)))
        cache = nbr.compute_geometry(spec, idx, x, y)

        tau_bottom, tau_top = wall_shear(
            spec, cache, y, vx, self._wall_vx, vol, b11, b12, b21, b22,
            cfg.DL, cfg.DH, mu, cfg.h)

        new_state = State(x=x, y=y, vx=vx, vy=vy, rho=rho, p=p,
                          drho_dt=drho_dt, fx=fx, fy=fy, fpx=fpx, fpy=fpy,
                          vol=vol, b11=b11, b12=b12, b21=b21, b22=b22)
        return new_state, idx, cache, dt, overflow, tau_bottom, tau_top

    def step(self, state: State, idx, cache, step_idx=0, remain=jnp.inf):
        """Single-step entry point for tests."""
        remain = jnp.asarray(remain, state.x.dtype)
        return self._step(state, idx, cache,
                          jnp.asarray(step_idx, jnp.int32), remain)

    # ---- initial neighbor + density pass (SPH_Poiseuille.m:165-173) ----
    def _init(self, state: State):
        cfg, spec = self.cfg, self.spec
        idx, cache, overflow = nbr.build_cache(spec, state.x, state.y)
        rho, vol, b11, b12, b21, b22 = density_correction(
            spec, cache, self._mass, cfg.rho0, cfg.inv_sigma0)
        p_f = cfg.p0 * (rho[: spec.n_fluid] / cfg.rho0 - 1.0)
        p = jnp.concatenate(
            [p_f, jnp.zeros((spec.n_total - spec.n_fluid,), p_f.dtype)])
        state = state._replace(rho=rho, p=p, vol=vol, b11=b11, b12=b12,
                               b21=b21, b22=b22)
        return state, idx, cache, overflow

    # ---- full inner loop to the next output point ----
    def _run_interval(self, state: State, idx, cache, interval_len,
                      g=None, mu=None):
        dtype = state.x.dtype
        interval_len = jnp.asarray(interval_len, dtype)

        def cond(carry):
            _, _, _, t_local, *_ = carry
            return t_local < interval_len - self._eps_t

        def body(carry):
            (state, idx, cache, t_local, n_steps, overflow,
             tau_b, tau_t) = carry
            remain = interval_len - t_local
            state, idx, cache, dt, ovf, tau_b, tau_t = self._step(
                state, idx, cache, n_steps, remain, g, mu)
            return (state, idx, cache, t_local + dt, n_steps + 1,
                    overflow | ovf, tau_b, tau_t)

        zero = jnp.asarray(0.0, dtype)
        carry = (state, idx, cache, zero, jnp.asarray(0, jnp.int32),
                 jnp.asarray(False), zero, zero)
        (state, idx, cache, _, n_steps, overflow,
         tau_b, tau_t) = jax.lax.while_loop(cond, body, carry)

        nf = self.spec.n_fluid
        v_max = jnp.sqrt(jnp.max(state.vx[:nf] ** 2 + state.vy[:nf] ** 2))
        n_pairs = nbr.count_pairs(self.spec, cache)
        return IntervalResult(state=state, idx=idx, cache=cache,
                              tau_bottom=tau_b, tau_top=tau_t,
                              n_steps=n_steps, overflow=overflow,
                              v_max=v_max, n_pairs=n_pairs)
