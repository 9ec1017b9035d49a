"""Batched (g, mu) workload sweeps via ``jax.vmap``.

The reference is strictly single-workload; BASELINE.json config 5 calls for
a vmapped sweep over 8 (gravity, viscosity) workloads. Here the ENTIRE
output-interval loop (``Engine._run_interval``) is vmapped over per-workload
(g, mu) scalars: one compiled program advances every workload in lockstep on
one chip, with per-lane adaptive dt (JAX's while_loop batching rule freezes
finished lanes).

Memory scaling: each vmapped lane carries its own (S, K, 9K) pair blocks,
so HBM grows linearly in lane count — at dp=0.01 a single v5e chip fits
~4 lanes. ``lane_chunk`` time-multiplexes the sweep: lanes are processed
in chunks of that size, sequentially, each chunk fully vmapped. Peak HBM
is one chunk's; wall time is (n_lanes / lane_chunk) x the chunked run.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SPHConfig
from ..models.poiseuille import Scene, build_scene
from ..stepper import initial_state, make_engine
from ..utils import postprocess as pp


def make_workloads(cfg: SPHConfig, mus: Sequence[float]):
    """Derive the (g, mu) pairs that keep U_bulk fixed across viscosities:
    g = 12*mu*U_bulk/(rho0*DH^2) (reference: SPH_Poiseuille.m:71)."""
    mus = np.asarray(mus, np.float64)
    gs = 12.0 * mus * cfg.U_bulk / (cfg.rho0 * cfg.DH ** 2)
    return gs, mus


def _run_lanes(cfg: SPHConfig, engine, scene: Scene, state0, cands0, geom0,
               gs, mus, log) -> tuple:
    """Advance ``len(gs)`` vmapped lanes to cfg.end_time. Returns
    (final_states, total_lane_steps, wall_seconds)."""
    n_work = gs.size
    bcast = lambda a: jnp.broadcast_to(a, (n_work,) + a.shape)
    states = jax.tree.map(bcast, state0)
    cands = jax.tree.map(bcast, cands0)
    geom = jax.tree.map(bcast, geom0)
    dtype = jnp.dtype(cfg.dtype)
    g_arr = jnp.asarray(gs, dtype)
    mu_arr = jnp.asarray(mus, dtype)

    run = jax.jit(jax.vmap(engine._run_interval,
                           in_axes=(0, 0, 0, None, 0, 0)))

    t = 0.0
    total_steps = 0
    wall = 0.0
    eps = 1e-9
    while t < cfg.end_time - eps:
        target = min(t + cfg.output_interval, cfg.end_time)
        t0 = time.perf_counter()
        res = run(states, cands, geom,
                  np.dtype(cfg.dtype).type(target - t), g_arr, mu_arr)
        jax.block_until_ready(res.state.x)
        wall += time.perf_counter() - t0
        if bool(jnp.any(res.overflow)):
            raise RuntimeError("neighbor cell capacity exceeded in sweep")
        if bool(jnp.any(res.skin_guard)):
            raise RuntimeError("neighbor skin guard tripped in sweep; "
                               "reduce rebuild_every")
        states, cands, geom = res.state, res.cands, res.geom
        total_steps += int(jnp.sum(res.n_steps))
        t = target
        log(f"sweep output point t={t:.3f}: steps/lane="
            f"{[int(s) for s in np.asarray(res.n_steps)]}, "
            f"vmax={[round(float(v), 4) for v in np.asarray(res.v_max)]}")
    return states, total_steps, wall


def _run_lane_seq(cfg: SPHConfig, engine, state0, cands0, geom0,
                  g_k: float, mu_k: float, log) -> tuple:
    """Advance ONE workload to cfg.end_time on the SHARED engine, passing
    the lane's (g, mu) as traced scalars — the sequential path for the
    fused Pallas engine. The kernels take (g, mu, wall_visc_factor)
    through their SMEM params row (ops/fused_cell.fused_chunk_call), so
    every lane reuses ONE compiled program; sequential execution keeps
    peak HBM at a single lane's footprint. The zero-dt init pass is
    (g, mu)-independent (it only produces rho/p/vol/B), so the shared
    ``state0`` serves every lane."""
    dtype = np.dtype(cfg.dtype)
    ftype = dtype.type
    import jax.numpy as jnp
    g_arr = jnp.asarray(g_k, dtype)
    mu_arr = jnp.asarray(mu_k, dtype)
    state, cands, geom = state0, cands0, geom0
    t = 0.0
    steps = 0
    wall = 0.0
    v_max = float("nan")
    eps = 1e-9
    while t < cfg.end_time - eps:
        target = min(t + cfg.output_interval, cfg.end_time)
        t0 = time.perf_counter()
        res = engine.run_interval(state, cands, geom,
                                  ftype(target - t), g_arr, mu_arr)
        jax.block_until_ready(res.state.x)
        wall += time.perf_counter() - t0
        if bool(res.overflow):
            raise RuntimeError("neighbor cell capacity exceeded in sweep")
        if bool(res.skin_guard):
            raise RuntimeError("neighbor skin guard tripped in sweep; "
                               "reduce rebuild_every")
        state, cands, geom = res.state, res.cands, res.geom
        steps += int(res.n_steps)
        v_max = float(res.v_max)
        t = target
    log(f"  lane done: mu={mu_k:g} steps={steps} "
        f"vmax={v_max:.4f} wall={wall:.1f}s")
    bcast = lambda a: np.asarray(a)[None]
    return jax.tree.map(bcast, jax.device_get(state)), steps, wall


def run_sweep(cfg: SPHConfig, gs, mus, log=print,
              lane_chunk: Optional[int] = None) -> dict:
    """Run ``len(gs)`` workloads to cfg.end_time.

    Engine-dependent strategy: the XLA engines (cellgrid/gather) accept
    traced (g, mu), so lanes run vmapped in chunks of ``lane_chunk``
    (None = all at once); the fused Pallas engine takes static scalars,
    so lanes run sequentially, each on its own compiled program.

    Returns per-workload L2 errors vs each workload's own analytic profile,
    final states, and throughput. All workloads share the scene geometry.
    """
    gs = np.asarray(gs, np.float64)
    mus = np.asarray(mus, np.float64)
    assert gs.shape == mus.shape
    n_work = gs.size
    chunk = n_work if lane_chunk is None else max(1, int(lane_chunk))

    scene = build_scene(cfg)
    chunk_states = []
    total_steps = 0
    wall = 0.0
    from ..stepper import resolve_engine_name
    if resolve_engine_name(cfg) == "pallas":
        if lane_chunk is not None:
            log("note: --sweep-lane-chunk is inapplicable on the pallas "
                "sweep path (lanes already run one at a time); ignoring")
        engine = make_engine(cfg, scene)
        state0, cands0, geom0, overflow = engine.init(
            initial_state(cfg, scene))
        if bool(overflow):
            raise RuntimeError("neighbor cell capacity exceeded at init")
        for k in range(n_work):
            log(f"sweep lane {k}/{n_work} (sequential, one shared "
                f"compile via SMEM (g, mu), engine=pallas)")
            st, steps, w = _run_lane_seq(cfg, engine, state0, cands0,
                                         geom0, gs[k], mus[k], log)
            chunk_states.append(st)
            total_steps += steps
            wall += w
    else:
        engine = make_engine(cfg, scene)
        state0 = initial_state(cfg, scene)
        state0, cands0, geom0, overflow = engine.init(state0)
        if bool(overflow):
            raise RuntimeError("neighbor cell capacity exceeded at init")
        for c0 in range(0, n_work, chunk):
            c1 = min(c0 + chunk, n_work)
            if n_work > chunk:
                log(f"sweep lanes {c0}..{c1 - 1} (chunked: {chunk} of "
                    f"{n_work} lanes resident)")
            st, steps, w = _run_lanes(cfg, engine, scene, state0, cands0,
                                      geom0, gs[c0:c1], mus[c0:c1], log)
            chunk_states.append(jax.device_get(st))
            total_steps += steps
            wall += w
    states = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0),
                          *chunk_states)

    # per-workload L2 vs its own analytic profile
    l2s = []
    nf = scene.n_fluid
    for k in range(n_work):
        xk = np.asarray(states.x[k][:nf], np.float64)
        yk = np.asarray(states.y[k][:nf], np.float64)
        uk = np.asarray(states.vx[k][:nf], np.float64)
        y_mid, u_mean = pp.binned_profile_mean(yk, uk, 0.0, cfg.DH,
                                               cfg.n_bins)
        nu_k = mus[k] / cfg.rho0
        u_exact = gs[k] / (2.0 * nu_k) * y_mid * (cfg.DH - y_mid)
        l2s.append(pp.compute_l2_error(u_mean, u_exact))

    return {
        "l2_errors": np.asarray(l2s),
        "final_states": states,
        "total_lane_steps": total_steps,
        "wall_time": wall,
        "particle_steps_per_sec": total_steps * scene.n_fluid / wall
        if wall > 0 else float("nan"),
    }
