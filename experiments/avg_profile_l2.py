"""Time-averaged full-profile L2 study: run 20 s, collect the binned
profile at every output point, report instantaneous vs averaged L2."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax

from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                     initial_state, make_engine)
from sph_poiseuille_flow_tpu.utils import postprocess as pp


def main(dp=0.025, wvf=4.35, end_time=20.0, interval=0.5):
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667, c_f=15.0,
        end_time=end_time, output_interval=interval, sort_interval=100,
        restart_from_file=False, neighbor_skin=0.75 * dp, rebuild_every=8,
        cell_capacity=18, wall_visc_factor=wvf)
    scene = build_scene(cfg)
    eng = make_engine(cfg, scene)
    state, cands, geom, ovf = eng.init(initial_state(cfg, scene))
    assert not bool(ovf)
    nf = scene.n_fluid
    profiles = []
    t = 0.0
    while t < cfg.end_time - 1e-9:
        target = min(t + interval, cfg.end_time)
        res = eng.run_interval(state, cands, geom, np.float32(target - t))
        jax.block_until_ready(res.state.x)
        assert not bool(res.overflow) and not bool(res.skin_guard)
        state, cands, geom = res.state, res.cands, res.geom
        y_mid, u_mean = pp.binned_profile_mean(
            np.asarray(state.y[:nf], np.float64),
            np.asarray(state.vx[:nf], np.float64), 0.0, cfg.DH, cfg.n_bins)
        profiles.append(u_mean)
        t = target
    u_ex = cfg.analytic_u(y_mid)
    inst = pp.compute_l2_error(profiles[-1], u_ex)
    print(f"dp={dp} wvf={wvf}: instantaneous L2 = {inst*100:.3f}%")
    for N in (5, 10, 20):
        if len(profiles) >= N:
            avg = np.nanmean(np.stack(profiles[-N:]), axis=0)
            l2 = pp.compute_l2_error(avg, u_ex)
            print(f"  time-averaged over last {N} outputs "
                  f"({N*interval:.1f} s): L2 = {l2*100:.3f}%")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(dp=float(a[0]) if a else 0.025,
         wvf=float(a[1]) if len(a) > 1 else 4.35)
