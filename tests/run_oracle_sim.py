"""Drive the native C++ oracle as a FULL float64 simulator with the
reference's exact store-once pair semantics (rebuild every step). Used for
accuracy studies: it tells us what the algorithm itself produces,
independent of the JAX engine and of float32.

Not a test — a study tool:
    python tests/run_oracle_sim.py [dp] [end_time] [transport_coeff] [c_f]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")

from sph_poiseuille_flow_tpu.config import derive_config
from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.utils import native_oracle as oc
from sph_poiseuille_flow_tpu.utils import postprocess as pp


def run(dp=0.05, end_time=20.0, transport_coeff=None, c_f=15.0,
        output_interval=1.0, log=print, snapshot=None):
    """``snapshot(t, x, y, vx)`` (fluid-only views), when given, is called
    at every output point — the hook the measurement-procedure scan
    (experiments/procedure_scan.py) uses to re-bin the SAME trajectory
    under every plausible L2 procedure."""
    import dataclasses
    cfg = derive_config(DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1,
                        U_bulk=0.666667, c_f=c_f, end_time=end_time,
                        output_interval=output_interval, sort_interval=100,
                        restart_from_file=False)
    if transport_coeff is not None:
        cfg = dataclasses.replace(cfg, transport_coeff=transport_coeff)
    scene = build_scene(cfg)
    nf, n = scene.n_fluid, scene.n_total

    x = scene.x.copy()
    y = scene.y.copy()
    vel = np.zeros((n, 2))
    wall_vel = np.zeros((n, 2))
    rho = np.full(n, cfg.rho0)
    p = np.zeros(n)
    drho = np.zeros(n)
    fprior = np.zeros((n, 2))
    mass = scene.mass.copy()

    pairs = oc.build_pairs(x, y, nf, cfg.DL, cfg.h)
    rho, vol, B = oc.density_correction(pairs, mass, nf, n, cfg.rho0,
                                        cfg.h, cfg.inv_sigma0)
    p[:nf] = cfg.p0 * (rho[:nf] / cfg.rho0 - 1.0)

    t = 0.0
    step = 0
    profiles = []
    next_out = output_interval
    t0 = time.time()
    while t < cfg.end_time - 1e-12:
        step += 1
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
        remain = min(next_out - t, cfg.end_time - t)
        dt = min(0.25 * cfg.h / max(cfg.c_f + v_max, 1e-12),
                 0.125 * cfg.h ** 2 / cfg.nu,
                 0.25 * np.sqrt(cfg.h / abs(cfg.gravity_g)), remain)
        dt = max(dt, 1e-12)

        rho, p, pos, vel, drho, force = oc.integration_verlet(
            pairs, vol, B, rho, mass, pos, vel, drho, fprior, dt, nf, n,
            cfg.rho0, cfg.p0, cfg.c_f, wall_vel)
        t += dt
        x = pos[:, 0].copy()
        y = pos[:, 1].copy()
        x[:nf] = np.mod(x[:nf], cfg.DL)
        vel[nf:] = 0.0
        pairs = oc.build_pairs(x, y, nf, cfg.DL, cfg.h)

        if t >= next_out - 1e-12:
            if snapshot is not None:
                snapshot(t, x[:nf].copy(), y[:nf].copy(),
                         vel[:nf, 0].copy())
            y_mid, u_mean = pp.binned_profile_mean(y[:nf], vel[:nf, 0],
                                                   0.0, cfg.DH, cfg.n_bins)
            l2 = pp.compute_l2_error(u_mean, cfg.analytic_u(y_mid))
            uy = np.sqrt((vel[:nf, 1] ** 2).mean()) / cfg.U_max
            profiles.append(u_mean)
            log(f"t={t:.2f} step={step} L2={l2*100:.3f}% "
                f"uyRMS/Umax={uy*100:.3f}% vmax={v_max:.4f} "
                f"wall={time.time()-t0:.0f}s")
            next_out = min(next_out + output_interval, cfg.end_time)

    # acoustic-noise diagnostic: the weakly-compressible field carries
    # standing pressure waves, so the INSTANTANEOUS profile L2 fluctuates
    # between output points; the time-averaged profile removes the
    # zero-mean acoustic component and exposes the discretization error
    for navg in (3, 5, 10):
        if len(profiles) >= navg:
            u_avg = np.nanmean(np.stack(profiles[-navg:]), axis=0)
            l2a = pp.compute_l2_error(u_avg, cfg.analytic_u(y_mid))
            log(f"time-averaged L2 (last {navg} outputs): {l2a*100:.3f}%")
    return l2, uy


if __name__ == "__main__":
    args = sys.argv[1:]
    dp = float(args[0]) if len(args) > 0 else 0.05
    end_time = float(args[1]) if len(args) > 1 else 20.0
    tc = float(args[2]) if len(args) > 2 else None
    c_f = float(args[3]) if len(args) > 3 else 15.0
    run(dp=dp, end_time=end_time, transport_coeff=tc, c_f=c_f)
