"""Pre-refactor probe: compile + time the fused kernels at the proposed
lane-packed asymmetric grid shape (dp=0.025: nx=32 -> L=128 exact,
cell_y < 3dp -> K=14) BEFORE restructuring make_grid_spec. Checks the
K=20/22-style Mosaic compile pathology doesn't strike at K=14/nx=32 and
measures the per-step speedup of the smaller candidate slab.

Usage: python experiments/probe_lanepack.py [nx] [K] [cell_y_dp]
"""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(nx=32, K=14, cell_y_dp=2.875):
    import jax
    import jax.numpy as jnp
    from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                         initial_state)
    from sph_poiseuille_flow_tpu.ops import fused_cell as fc
    from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

    dp = 0.025
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667, c_f=15.0,
        end_time=20.0, output_interval=0.5, sort_interval=100,
        restart_from_file=False, neighbor_skin=0.75 * dp, rebuild_every=8,
        cell_capacity=18, neighbor_capacity=56)
    scene = build_scene(cfg)
    eng = PallasCellEngine(cfg, scene)
    spec0 = eng.spec
    # proposed asymmetric spec: lane-exact nx, short y cells
    cell_x = cfg.DL / nx
    cell_y = cell_y_dp * dp
    y_lo = -cfg.wall_thickness
    y_hi = cfg.DH + cfg.wall_thickness
    import math
    ny = int(math.ceil((y_hi - y_lo) / cell_y)) + 2
    spec = dataclasses.replace(
        spec0, nx=nx, ny=ny, cell_x=cell_x, cell_y=cell_y,
        y0=y_lo - cell_y, K=K,
        skin=float(a_skin) if 'a_skin' in dir() else spec0.skin)
    import os
    if os.environ.get('PROBE_SKIN0'):
        spec = dataclasses.replace(spec, skin=0.0)
    R, L, n_groups, nyp = fc.plan(spec)
    print(f"spec: nx={nx} ny={ny} K={K} cell_x={cell_x/dp:.3f}dp "
          f"cell_y={cell_y_dp}dp; plan R={R} L={L} n_groups={n_groups} "
          f"9K={9*K} (sublane tiles {-(-9*K//8)}, lane fill {L}/128)",
          flush=True)

    state = initial_state(cfg, scene)
    lay = fc.build_fused_layout(spec, state.x, state.y, eng._mass,
                                eng._wall_vx, eng._wall_vy, eng._wall_y)
    occ = np.asarray(lay.occ)
    print(f"occ per group: {occ.ravel().tolist()}, overflow="
          f"{bool(lay.overflow)}", flush=True)
    assert not bool(lay.overflow), "K too small at init"

    scal = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, cfg.transport_coeff,
            cfg.gravity_g, cfg.mu, cfg.wall_visc_factor)
    xH = fc.make_core(spec, lay.pidx, state.x, fill=fc._BIG_X,
                      xshift=spec.DL)
    yH = fc.make_core(spec, lay.pidx, state.y)
    vxH = fc.make_core(spec, lay.pidx, state.vx)
    vyH = fc.make_core(spec, lay.pidx, state.vy)
    drP = fc.make_plain(spec, lay.pidx, state.drho_dt)

    N_CH = 60

    @jax.jit
    def loop(xH, yH, vxH, vyH, drP):
        def body(i, c):
            xh, yh, vxh, vyh, drp, ns = c
            st, aux, steps, t2, tc2 = fc.fused_chunk_call(
                spec, lay, xh, yh, vxh, vyh, drp, 0.0, 0.0, 1e9, 32, *scal)
            return (st["xH"], st["yH"], st["vxH"], st["vyH"], st["drP"],
                    ns + steps)
        return jax.lax.fori_loop(
            0, N_CH, body, (xH, yH, vxH, vyH, drP, jnp.int32(0)))

    t0 = time.perf_counter()
    out = loop(xH, yH, vxH, vyH, drP)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = loop(xH, yH, vxH, vyH, drP)
    jax.block_until_ready(out)
    el = time.perf_counter() - t0
    nsteps = int(out[5])
    print(f"chunk: {el/N_CH*1e3:.4f} ms/call, {nsteps/N_CH:.1f} steps/call"
          f" => {el/max(nsteps,1)*1e3:.4f} ms/step", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 32, int(a[1]) if len(a) > 1 else 14,
         float(a[2]) if len(a) > 2 else 2.875)
