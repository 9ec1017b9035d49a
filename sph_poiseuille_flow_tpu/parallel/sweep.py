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

import dataclasses
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SPHConfig
from ..models.poiseuille import Scene, build_scene
from ..stepper import initial_state, make_engine
from ..utils import checkpoint
from ..utils import postprocess as pp


def make_workloads(cfg: SPHConfig, mus: Sequence[float]):
    """Derive the (g, mu) pairs that keep U_bulk fixed across viscosities:
    g = 12*mu*U_bulk/(rho0*DH^2) (reference: SPH_Poiseuille.m:71)."""
    mus = np.asarray(mus, np.float64)
    gs = 12.0 * mus * cfg.U_bulk / (cfg.rho0 * cfg.DH ** 2)
    return gs, mus


def _lane_path(path: str, k: int) -> str:
    root, ext = os.path.splitext(path)
    return f"{root}_lane{k}{ext}"


def _lane_cfg(cfg: SPHConfig, g_k: float, mu_k: float) -> SPHConfig:
    """The per-lane config: the lane's (g, mu) with consistent nu. Its
    ``signature`` then differs per lane (mu rides the signature), so a
    lane restart can never be resumed into the wrong workload."""
    return dataclasses.replace(cfg, mu=float(mu_k),
                               gravity_g=float(g_k),
                               nu=float(mu_k) / cfg.rho0)


class _LaneMonitor:
    """Per-lane twin of the driver's monitor sampling
    (simulation.Simulation._sample_mid_profile)."""

    def __init__(self, cfg: SPHConfig, n_fluid: int):
        self.cfg, self.nf = cfg, n_fluid
        self.times, self.mid_u, self.full_u = [], [], []

    def sample(self, t: float, state):
        cfg, nf = self.cfg, self.nf
        x = np.asarray(state.x[:nf], np.float64)
        y = np.asarray(state.y[:nf], np.float64)
        u = np.asarray(state.vx[:nf], np.float64)
        _, u_mid = pp.mid_channel_profile(x, y, u, cfg.DL, cfg.DH,
                                          cfg.mid_x, cfg.mid_half_width,
                                          cfg.n_bins)
        _, u_full = pp.binned_profile_mean(y, u, 0.0, cfg.DH, cfg.n_bins)
        self.times.append(t)
        self.mid_u.append(u_mid)
        self.full_u.append(u_full)


def _lane_artifacts(cfg_k: SPHConfig, scene: Scene, state, mon: _LaneMonitor,
                    paths, k: int, log) -> dict:
    """Write lane k's postprocess handoff npz + both figures — the full
    single-run driver surface (simulation.py postprocess handoff), per
    sweep lane."""
    result_png = _lane_path(paths.result_png, k)
    profile_png = _lane_path(paths.profile_evolution_png, k)
    npz = _lane_path(paths.postprocess_npz, k)
    data = pp.make_postprocess_data(
        cfg_k, scene, state, np.asarray(mon.times),
        np.stack(mon.mid_u, axis=1), result_png, profile_png,
        full_profile_u=np.stack(mon.full_u, axis=1))
    pp.save_postprocess_npz(npz, data)
    out = pp.run_postprocess(data, quiet=True)
    log(f"  lane {k} artifacts: {npz} (+ figures)")
    out["postprocess_npz"] = npz
    return out


def _lane_slice(states, k):
    return jax.tree.map(lambda a: a[k], states)


def _run_lanes(cfg: SPHConfig, engine, scene: Scene, state0, cands0, geom0,
               gs, mus, log, paths=None, lane_base=0, monitors=None) -> tuple:
    """Advance ``len(gs)`` vmapped lanes to cfg.end_time. Returns
    (final_states, total_lane_steps, wall_seconds).

    With ``paths``: per-lane signature-guarded restarts at every output
    point, and per-lane monitor series appended to ``monitors``. Lanes
    advance in LOCKSTEP (one vmapped program), so resume happens only
    when every lane in the chunk has a valid restart at the SAME t —
    otherwise the chunk starts clean (logged)."""
    n_work = gs.size
    bcast = lambda a: jnp.broadcast_to(a, (n_work,) + a.shape)
    states = jax.tree.map(bcast, state0)
    cands = jax.tree.map(bcast, cands0)
    geom = jax.tree.map(bcast, geom0)
    dtype = jnp.dtype(cfg.dtype)
    g_arr = jnp.asarray(gs, dtype)
    mu_arr = jnp.asarray(mus, dtype)
    cfg_ks = [_lane_cfg(cfg, gs[k], mus[k]) for k in range(n_work)]
    lane_paths = [_lane_path(paths.restart, lane_base + k)
                  for k in range(n_work)] if paths else None

    t = 0.0
    steps_abs = np.zeros(n_work, np.int64)
    if lane_paths and cfg.restart_from_file:
        loaded = [checkpoint.load_restart(lane_paths[k], cfg_ks[k].signature,
                                          scene.n_total)[0]
                  for k in range(n_work)]
        ts = {None if p is None else round(float(p["t"]), 12)
              for p in loaded}
        if None not in ts and len(ts) == 1:
            per_lane = []
            for k, payload in enumerate(loaded):
                st = state0._replace(**{
                    f: jnp.asarray(payload[f], dtype)
                    for f in ("x", "y", "vx", "vy", "rho", "p", "drho_dt",
                              "fx", "fy", "fpx", "fpy")})
                s_k, c_k, g_k, ovf = engine.init(st)
                if bool(ovf):
                    raise RuntimeError(
                        "cell capacity exceeded on lane resume")
                per_lane.append((s_k, c_k, g_k))
            stack = lambda *xs: jnp.stack(xs, axis=0)
            states = jax.tree.map(stack, *[p[0] for p in per_lane])
            cands = jax.tree.map(stack, *[p[1] for p in per_lane])
            geom = jax.tree.map(stack, *[p[2] for p in per_lane])
            t = float(loaded[0]["t"])
            steps_abs = np.asarray([int(p["step"]) for p in loaded],
                                   np.int64)
            log(f"sweep lanes {lane_base}..{lane_base + n_work - 1}: "
                f"resuming lockstep from t={t:.6f}")
        else:
            log(f"sweep lanes {lane_base}..{lane_base + n_work - 1}: "
                f"restarts absent or not at one t; starting clean")

    if monitors is not None:
        for k in range(n_work):
            mon = _LaneMonitor(cfg_ks[k], scene.n_fluid)
            mon.sample(t, _lane_slice(states, k))
            monitors.append(mon)

    run = jax.jit(jax.vmap(engine._run_interval,
                           in_axes=(0, 0, 0, None, 0, 0)))

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
        steps_abs += np.asarray(res.n_steps, np.int64)
        t = target
        if lane_paths:
            for k in range(n_work):
                checkpoint.save_restart(lane_paths[k], cfg_ks[k].signature,
                                        _lane_slice(states, k), t,
                                        int(steps_abs[k]))
        if monitors is not None:
            for k in range(n_work):
                monitors[lane_base + k].sample(t, _lane_slice(states, k))
        log(f"sweep output point t={t:.3f}: steps/lane="
            f"{[int(s) for s in np.asarray(res.n_steps)]}, "
            f"vmax={[round(float(v), 4) for v in np.asarray(res.v_max)]}")
    return states, total_steps, wall


def _run_lane_seq(cfg: SPHConfig, engine, scene, state0, cands0, geom0,
                  g_k: float, mu_k: float, log, paths=None, lane_k=0):
    """Advance ONE workload to cfg.end_time on the SHARED engine, passing
    the lane's (g, mu) as traced scalars — the sequential path for the
    fused Pallas engine. The kernels take (g, mu, wall_visc_factor)
    through their SMEM params row (ops/fused_cell.fused_chunk_call), so
    every lane reuses ONE compiled program; sequential execution keeps
    peak HBM at a single lane's footprint. The zero-dt init pass is
    (g, mu)-independent (it only produces rho/p/vol/B), so the shared
    ``state0`` serves every lane.

    With ``paths``, the lane gets the full single-run driver surface:
    a signature-guarded restart written every output point (resumed when
    ``cfg.restart_from_file`` — a failed sweep re-runs only unfinished
    work) and the monitor series for the lane's postprocess handoff."""
    dtype = np.dtype(cfg.dtype)
    ftype = dtype.type
    import jax.numpy as jnp
    cfg_k = _lane_cfg(cfg, g_k, mu_k)
    g_arr = jnp.asarray(g_k, dtype)
    mu_arr = jnp.asarray(mu_k, dtype)
    state, cands, geom = state0, cands0, geom0
    t = 0.0
    steps = 0
    restart_path = _lane_path(paths.restart, lane_k) if paths else None
    if restart_path and cfg.restart_from_file:
        payload, reason = checkpoint.load_restart(
            restart_path, cfg_k.signature, scene.n_total)
        if payload is not None:
            jdtype = jnp.dtype(cfg.dtype)
            st = state0._replace(**{
                f: jnp.asarray(payload[f], jdtype)
                for f in ("x", "y", "vx", "vy", "rho", "p", "drho_dt",
                          "fx", "fy", "fpx", "fpy")})
            # re-bin the resumed positions (the lane restart stores
            # particle state, not layout)
            state, cands, geom, ovf = engine.init(st)
            if bool(ovf):
                raise RuntimeError("cell capacity exceeded on lane resume")
            t = float(payload["t"])
            steps = int(payload["step"])
            log(f"  lane {lane_k}: resuming from t={t:.6f}")
        else:
            log(f"  lane {lane_k}: restart unavailable ({reason}); "
                f"starting clean")
    mon = _LaneMonitor(cfg_k, scene.n_fluid)
    mon.sample(t, state)
    wall = 0.0
    steps_run = 0   # steps executed THIS process (throughput denominator)
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
        steps_run += int(res.n_steps)
        v_max = float(res.v_max)
        t = target
        if restart_path:
            checkpoint.save_restart(restart_path, cfg_k.signature, state,
                                    t, steps)
        mon.sample(t, state)
    log(f"  lane done: mu={mu_k:g} steps={steps} "
        f"vmax={v_max:.4f} wall={wall:.1f}s")
    bcast = lambda a: np.asarray(a)[None]
    return (jax.tree.map(bcast, jax.device_get(state)), steps_run, wall,
            state, mon)


def run_sweep(cfg: SPHConfig, gs, mus, log=print,
              lane_chunk: Optional[int] = None, paths=None) -> dict:
    """Run ``len(gs)`` workloads to cfg.end_time.

    Engine-dependent strategy: the XLA engines (cellgrid/gather) accept
    traced (g, mu), so lanes run vmapped in chunks of ``lane_chunk``
    (None = all at once); the fused Pallas engine takes static scalars,
    so lanes run sequentially, each on its own compiled program.

    ``paths`` (a simulation.SimulationPaths) opts into full driver
    parity per lane: signature-guarded restarts every output point
    (``_lane{k}`` suffixed; resumed under ``restart_from_file``), the
    mid-profile monitor series, and a postprocess handoff npz + both
    figures per lane — a failed sweep is diagnosable and resumable
    exactly like a single run (the reference's driver surface,
    SPH_Poiseuille.m:295-310, generalized over workloads).

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
    monitors = [] if paths is not None else None
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
            st, steps, w, _, mon = _run_lane_seq(
                cfg, engine, scene, state0, cands0, geom0, gs[k], mus[k],
                log, paths=paths, lane_k=k)
            chunk_states.append(st)
            if monitors is not None:
                monitors.append(mon)
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
                                      geom0, gs[c0:c1], mus[c0:c1], log,
                                      paths=paths, lane_base=c0,
                                      monitors=monitors)
            chunk_states.append(jax.device_get(st))
            total_steps += steps
            wall += w
    states = jax.tree.map(lambda *xs: np.concatenate(xs, axis=0),
                          *chunk_states)

    # per-workload L2 vs its own analytic profile
    l2s = []
    nf = scene.n_fluid
    for k in range(n_work):
        yk = np.asarray(states.y[k][:nf], np.float64)
        uk = np.asarray(states.vx[k][:nf], np.float64)
        y_mid, u_mean = pp.binned_profile_mean(yk, uk, 0.0, cfg.DH,
                                               cfg.n_bins)
        nu_k = mus[k] / cfg.rho0
        u_exact = gs[k] / (2.0 * nu_k) * y_mid * (cfg.DH - y_mid)
        l2s.append(pp.compute_l2_error(u_mean, u_exact))

    lane_artifacts = None
    if paths is not None:
        lane_artifacts = []
        for k in range(n_work):
            out_k = _lane_artifacts(
                _lane_cfg(cfg, gs[k], mus[k]), scene,
                _lane_slice(states, k), monitors[k], paths, k, log)
            lane_artifacts.append(out_k["postprocess_npz"])

    return {
        "l2_errors": np.asarray(l2s),
        "final_states": states,
        "total_lane_steps": total_steps,
        "wall_time": wall,
        "lane_artifacts": lane_artifacts,
        "particle_steps_per_sec": total_steps * scene.n_fluid / wall
        if wall > 0 else float("nan"),
    }
