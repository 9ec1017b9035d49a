"""Measure the native C++ oracle's full inner-loop throughput — the
grounded denominator for bench.py's ``vs_baseline``.

The oracle (native/sph_oracle.cpp) executes the reference semantics
exactly (store-once pair list rebuilt every step, then density+KGC ->
viscous -> shifting -> verlet, the per-step pipeline of
SPH_Poiseuille.m:254-283) in float64 C++ on the host CPU. Timing its
inner loop at the benchmark scale (dp=0.025, 4800 fluid particles) gives
a *measured* reference-CPU particle-steps/sec on this machine, replacing
the round-1 guess of 2.4e6 (VERDICT.md weak #2).

Usage: python experiments/time_oracle.py [dp] [n_timed_steps]
Prints one JSON line {"dp":..., "psps":..., "ms_per_step":..., "steps":...}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from sph_poiseuille_flow_tpu.config import derive_config  # noqa: E402
from sph_poiseuille_flow_tpu.models.poiseuille import build_scene  # noqa: E402
from sph_poiseuille_flow_tpu.utils import native_oracle as oc  # noqa: E402


def time_oracle(dp: float = 0.025, n_timed: int = 200,
                n_warm: int = 20) -> dict:
    cfg = derive_config(DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1,
                        U_bulk=0.666667, c_f=15.0, end_time=20.0,
                        output_interval=1.0, sort_interval=100,
                        restart_from_file=False)
    scene = build_scene(cfg)
    nf, n = scene.n_fluid, scene.n_total

    x = scene.x.copy()
    y = scene.y.copy()
    vel = np.zeros((n, 2))
    wall_vel = np.zeros((n, 2))
    rho = np.full(n, cfg.rho0)
    p = np.zeros(n)
    drho = np.zeros(n)
    mass = scene.mass.copy()

    pairs = oc.build_pairs(x, y, nf, cfg.DL, cfg.h)
    rho, vol, B = oc.density_correction(pairs, mass, nf, n, cfg.rho0,
                                        cfg.h, cfg.inv_sigma0)
    p[:nf] = cfg.p0 * (rho[:nf] / cfg.rho0 - 1.0)

    def one_step():
        nonlocal pairs, rho, vol, B, p, vel, drho, x, y
        rho, vol, B = oc.density_correction(pairs, mass, nf, n, cfg.rho0,
                                            cfg.h, cfg.inv_sigma0)
        fprior = oc.viscous_force(pairs, vel, vol, B, cfg.mu, cfg.h, nf, n,
                                  wall_vel)
        fprior[:nf, 0] += mass[:nf] * cfg.gravity_g
        fprior[nf:] = 0.0
        pos = np.stack([x, y], axis=1)
        pos = oc.transport_correction(pairs, vol, B, pos, cfg.h, nf, n,
                                      cfg.transport_coeff)
        v_max = np.sqrt((vel[:nf] ** 2).sum(axis=1)).max()
        dt = min(0.25 * cfg.h / max(cfg.c_f + v_max, 1e-12),
                 0.125 * cfg.h ** 2 / cfg.nu,
                 0.25 * np.sqrt(cfg.h / abs(cfg.gravity_g)))
        rho2, p2, pos, vel2, drho2, _ = oc.integration_verlet(
            pairs, vol, B, rho, mass, pos, vel, drho, fprior, dt, nf, n,
            cfg.rho0, cfg.p0, cfg.c_f, wall_vel)
        rho, p, vel, drho = rho2, p2, vel2, drho2
        x = pos[:, 0].copy()
        y = pos[:, 1].copy()
        x[:nf] = np.mod(x[:nf], cfg.DL)
        vel[nf:] = 0.0
        pairs = oc.build_pairs(x, y, nf, cfg.DL, cfg.h)
        oc.wall_shear_monitor(pairs, pos, vel, wall_vel, vol, B, nf,
                              cfg.DL, cfg.DH, cfg.mu, cfg.h)

    for _ in range(n_warm):
        one_step()
    t0 = time.perf_counter()
    for _ in range(n_timed):
        one_step()
    elapsed = time.perf_counter() - t0
    psps = n_timed * nf / elapsed
    out = {"dp": dp, "n_fluid": nf, "steps": n_timed,
           "ms_per_step": round(1e3 * elapsed / n_timed, 3),
           "psps": round(psps, 1)}
    print(json.dumps(out))
    return out


def phase_breakdown(dp: float = 0.025, n_timed: int = 100,
                    n_warm: int = 10) -> dict:
    """Time each oracle phase separately and bound the reference's
    multicore headroom by Amdahl's law.

    The reference parallelizes exactly six pair loops with
    OpenMP-parallel-for + per-element atomics (sph_physics_mex.c:186,
    237, 467, 634, 868, 1074, 1150, 1223 — density/KGC, viscous,
    transport, and the integration sub-phases; the density loop is
    additionally serial on Windows, :185). Its neighbor search
    (sph_neighbor_search_mex.c — no omp pragmas) and wall-shear monitor
    (sph_physics_mex.c:1653-1743 — no pragma) are SERIAL, as is the
    MATLAB-side glue (dt reduction, wrap). Granting the parallel phases
    PERFECT k-core scaling (atomics contention would in practice cap
    them well below that) gives an upper bound on any k-core host:
    T(k) >= T_serial + T_parallel / k."""
    cfg = derive_config(DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1,
                        U_bulk=0.666667, c_f=15.0, end_time=20.0,
                        output_interval=1.0, sort_interval=100,
                        restart_from_file=False)
    scene = build_scene(cfg)
    nf, n = scene.n_fluid, scene.n_total
    x = scene.x.copy()
    y = scene.y.copy()
    vel = np.zeros((n, 2))
    wall_vel = np.zeros((n, 2))
    rho = np.full(n, cfg.rho0)
    p = np.zeros(n)
    drho = np.zeros(n)
    mass = scene.mass.copy()
    pairs = oc.build_pairs(x, y, nf, cfg.DL, cfg.h)
    rho, vol, B = oc.density_correction(pairs, mass, nf, n, cfg.rho0,
                                        cfg.h, cfg.inv_sigma0)
    p[:nf] = cfg.p0 * (rho[:nf] / cfg.rho0 - 1.0)

    acc = {"build_pairs": 0.0, "density_kgc": 0.0, "viscous": 0.0,
           "transport": 0.0, "integration": 0.0, "wall_shear": 0.0,
           "glue": 0.0}

    def timed(key, fn):
        t0 = time.perf_counter()
        out = fn()
        acc[key] += time.perf_counter() - t0
        return out

    def one_step(record: bool):
        nonlocal pairs, rho, vol, B, p, vel, drho, x, y
        if not record:
            for k in acc:
                acc[k] = 0.0
        rho, vol, B = timed("density_kgc", lambda: oc.density_correction(
            pairs, mass, nf, n, cfg.rho0, cfg.h, cfg.inv_sigma0))
        fprior = timed("viscous", lambda: oc.viscous_force(
            pairs, vel, vol, B, cfg.mu, cfg.h, nf, n, wall_vel))
        t0 = time.perf_counter()
        fprior[:nf, 0] += mass[:nf] * cfg.gravity_g
        fprior[nf:] = 0.0
        pos = np.stack([x, y], axis=1)
        acc["glue"] += time.perf_counter() - t0
        pos = timed("transport", lambda: oc.transport_correction(
            pairs, vol, B, pos, cfg.h, nf, n, cfg.transport_coeff))
        t0 = time.perf_counter()
        v_max = np.sqrt((vel[:nf] ** 2).sum(axis=1)).max()
        dt = min(0.25 * cfg.h / max(cfg.c_f + v_max, 1e-12),
                 0.125 * cfg.h ** 2 / cfg.nu,
                 0.25 * np.sqrt(cfg.h / abs(cfg.gravity_g)))
        acc["glue"] += time.perf_counter() - t0
        out = timed("integration", lambda: oc.integration_verlet(
            pairs, vol, B, rho, mass, pos, vel, drho, fprior, dt, nf, n,
            cfg.rho0, cfg.p0, cfg.c_f, wall_vel))
        rho2, p2, pos, vel2, drho2, _ = out
        t0 = time.perf_counter()
        rho, p, vel, drho = rho2, p2, vel2, drho2
        x = pos[:, 0].copy()
        y = pos[:, 1].copy()
        x[:nf] = np.mod(x[:nf], cfg.DL)
        vel[nf:] = 0.0
        acc["glue"] += time.perf_counter() - t0
        pairs = timed("build_pairs", lambda: oc.build_pairs(
            x, y, nf, cfg.DL, cfg.h))
        timed("wall_shear", lambda: oc.wall_shear_monitor(
            pairs, pos, vel, wall_vel, vol, B, nf, cfg.DL, cfg.DH,
            cfg.mu, cfg.h))

    for _ in range(n_warm):
        one_step(record=False)
    for k in acc:
        acc[k] = 0.0
    for _ in range(n_timed):
        one_step(record=True)

    ms = {k: 1e3 * v / n_timed for k, v in acc.items()}
    total = sum(ms.values())
    # serial bucket: phases with no omp pragma in the reference. The
    # Python-side glue is an artifact of this harness, not of the
    # reference (MATLAB's vectorized glue is fast) — count it as
    # parallelizable, which only FLATTERS the reference bound.
    t_serial = ms["build_pairs"] + ms["wall_shear"]
    t_parallel = total - t_serial
    amdahl = {}
    for k in (8, 16, 32, 64, 1_000_000):
        t_k = t_serial + t_parallel / k
        label = "inf" if k >= 1_000_000 else str(k)
        amdahl[label] = {"ms_per_step": round(t_k, 3),
                         "psps": round(n_timed and nf / (t_k * 1e-3), 1)}
    out = {"dp": dp, "n_fluid": nf, "steps": n_timed,
           "phase_ms": {k: round(v, 3) for k, v in ms.items()},
           "total_ms": round(total, 3),
           "serial_ms": round(t_serial, 3),
           "serial_frac": round(t_serial / total, 4),
           "amdahl_bound_psps": amdahl}
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    if a and a[0] == "--phases":
        phase_breakdown(dp=float(a[1]) if len(a) > 1 else 0.025,
                        n_timed=int(a[2]) if len(a) > 2 else 100)
    else:
        time_oracle(dp=float(a[0]) if a else 0.025,
                    n_timed=int(a[1]) if len(a) > 1 else 200)
