"""Ablation timing of the cellgrid step phases at the bench config.

Times each phase in a fori_loop (100 iters) with value-carried deps so XLA
cannot elide work. Run in a fresh process (TPU client poisoning note in
memory/axon-tpu-environment.md).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                     initial_state, make_engine)
from sph_poiseuille_flow_tpu.ops import cellgrid as cg


def timeit(name, fn, *args, iters=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.4f} ms/iter")
    return dt


def main(dp=0.025):
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667, c_f=15.0,
        end_time=20.0, output_interval=0.5, sort_interval=100,
        restart_from_file=False, neighbor_skin=0.75 * dp, rebuild_every=8,
        cell_capacity=24, neighbor_capacity=56)
    scene = build_scene(cfg)
    eng = make_engine(cfg, scene)
    spec = eng.spec
    print(f"spec: ny={spec.ny} nx={spec.nx} K={spec.K} "
          f"S={spec.ny*spec.nx} 9K={9*spec.K} n={spec.n_total}")
    state = initial_state(cfg, scene)
    state, lay, geom, _ = eng.init(state)

    mass = eng._mass

    @jax.jit
    def loop_geom(x, y):
        def body(i, c):
            x2, y2 = c
            g = cg.compute_geometry(spec, lay, x2, y2)
            return (x2 + 1e-12 * g.w[0, 0, 0], y2)
        return jax.lax.fori_loop(0, 100, body, (x, y))

    @jax.jit
    def loop_step(x, y):
        def body(i, c):
            x2, y2 = c
            out = cg.cell_step(spec, lay, geom, mass, x2, y2, state.vx,
                               state.vy, state.drho_dt,
                               jnp.asarray(1e-4, x2.dtype), cfg.rho0,
                               cfg.p0, cfg.c_f, cfg.inv_sigma0,
                               cfg.transport_coeff, cfg.gravity_g, cfg.mu,
                               cfg.wall_visc_factor)
            return (x2 + 1e-12 * out["rho"][0], y2)
        return jax.lax.fori_loop(0, 100, body, (x, y))

    @jax.jit
    def loop_shear(x, y):
        def body(i, c):
            x2, y2 = c
            tb, tt = cg.cell_wall_shear(spec, lay, geom, state.vx,
                                        state.vol, state.b11, state.b12,
                                        state.b21, state.b22, cfg.mu,
                                        cfg.wall_visc_factor)
            return (x2 + 1e-12 * tb, y2)
        return jax.lax.fori_loop(0, 100, body, (x, y))

    @jax.jit
    def loop_rebuild(x, y):
        def body(i, c):
            x2, y2 = c
            l = cg.build_layout(spec, x2, y2, mass, eng._wall_vx,
                                eng._wall_vy, eng._wall_y)
            return (x2 + 1e-12 * l.valid_v[0, 0], y2)
        return jax.lax.fori_loop(0, 100, body, (x, y))

    @jax.jit
    def loop_full(x, y):
        def body(i, c):
            st, lay2, geom2 = c
            st2, lay3, geom3, dt, flag, tb, tt = eng._step(
                st, lay2, geom2, i, jnp.asarray(1.0, x.dtype))
            return (st2, lay3, geom3)
        return jax.lax.fori_loop(0, 100, body, (state, lay, geom))

    timeit("compute_geometry", loop_geom, state.x, state.y)
    timeit("cell_step", loop_step, state.x, state.y)
    timeit("cell_wall_shear", loop_shear, state.x, state.y)
    timeit("build_layout", loop_rebuild, state.x, state.y)
    timeit("full engine step", loop_full, state.x, state.y)


if __name__ == "__main__":
    import sys
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.025)
