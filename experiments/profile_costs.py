"""Round-3 cost structure: e2e step vs chunk kernel vs rebuild vs glue.

All timings inside on-device fori_loops threading data deps (tunnel rules).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_poiseuille_flow_tpu import build_scene, derive_config, initial_state
from sph_poiseuille_flow_tpu.ops import fused_cell as fc
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

dp = float(sys.argv[1]) if len(sys.argv) > 1 else 0.025

cfg = derive_config(
    DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667, c_f=15.0,
    end_time=20.0, output_interval=0.5, sort_interval=100,
    restart_from_file=False, neighbor_skin=0.75 * dp, rebuild_every=8,
    cell_capacity=18, neighbor_capacity=56)
scene = build_scene(cfg)
eng = PallasCellEngine(cfg, scene)
spec = eng.spec
state = initial_state(cfg, scene)
state, lay, geom, _ = eng.init(state)

# warm 1s of flow
for _ in range(2):
    res = eng.run_interval(state, lay, geom, np.float32(0.5))
    state, lay, geom = res.state, res.cands, res.geom
print("warmed", flush=True)

scalars = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, cfg.transport_coeff,
           cfg.gravity_g, cfg.mu, cfg.wall_visc_factor)
xH = fc.make_core(spec, lay.pidx, state.x, fill=fc._BIG_X, xshift=spec.DL)
yH = fc.make_core(spec, lay.pidx, state.y)
vxH = fc.make_core(spec, lay.pidx, state.vx)
vyH = fc.make_core(spec, lay.pidx, state.vy)
drP = fc.make_plain(spec, lay.pidx, state.drho_dt)

# 1. e2e: full run_interval
t0 = time.perf_counter()
res = eng.run_interval(state, lay, geom, np.float32(0.5))
jax.block_until_ready(res.state.x)
e2e = (time.perf_counter() - t0) / int(res.n_steps) * 1e3
print(f"e2e per-step:        {e2e:.4f} ms  ({int(res.n_steps)} steps)",
      flush=True)
state2, lay2 = res.state, res.cands

# 2. chunk-call-only loops: count REAL steps (the relative-displacement
# guard can soft-stop chained chunks), and also time a skin=0 spec
# (guard compiled out, chunks always run n_sub steps).
import dataclasses
N_CH = 60


def time_chunk(spec_t, n_sub, label):
    @jax.jit
    def loop(xH, yH, vxH, vyH, drP):
        def body(i, c):
            xh, yh, vxh, vyh, drp, ns = c
            st, aux, steps, t2, tc2 = fc.fused_chunk_call(
                spec_t, lay, xh, yh, vxh, vyh, drp, 0.0, 0.0, 1e9, n_sub,
                *scalars)
            return (st["xH"], st["yH"], st["vxH"], st["vyH"], st["drP"],
                    ns + steps)
        return jax.lax.fori_loop(
            0, N_CH, body, (xH, yH, vxH, vyH, drP, jnp.int32(0)))
    out = loop(xH, yH, vxH, vyH, drP)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(xH, yH, vxH, vyH, drP)
    jax.block_until_ready(out)
    el = time.perf_counter() - t0
    nsteps = int(out[5])
    per_call = el / N_CH * 1e3
    print(f"{label}: {per_call:.4f} ms/call, {nsteps/N_CH:.1f} steps/call"
          f" => {el/max(nsteps,1)*1e3:.4f} ms/step", flush=True)
    return per_call, nsteps / N_CH


spec0 = dataclasses.replace(spec, skin=0.0)
c8, _ = time_chunk(spec0, 8, "chunk(skin0,n_sub=8)")
c32, _ = time_chunk(spec0, 32, "chunk(skin0,n_sub=32)")
c1, _ = time_chunk(spec0, 1, "chunk(skin0,n_sub=1)")
step_k = (c32 - c8) / 24
print(f"  => in-kernel step: {step_k:.4f} ms, fixed/call:"
      f" {c1 - step_k:.4f} ms", flush=True)
time_chunk(spec, 32, "chunk(guard,n_sub=32)")

# 3. rebuild-only loop
N_RB = 100


@jax.jit
def rebuild_loop(x, y):
    def body(i, c):
        x2, y2 = c
        nl, (vxPc,) = fc.build_fused_layout(
            spec, x2, y2, eng._mass, eng._wall_vx, eng._wall_vy,
            eng._wall_y, state_fields=(x2,))
        return (x2 + 0.0 * nl.refx_p.reshape(-1)[0], y2)
    return jax.lax.fori_loop(0, N_RB, body, (x, y))


out = rebuild_loop(state.x, state.y)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = rebuild_loop(state.x, state.y)
jax.block_until_ready(out)
rb = (time.perf_counter() - t0) / N_RB * 1e3
print(f"rebuild/call:        {rb:.4f} ms (/8 = {rb/8:.4f} per step)",
      flush=True)

# 3b. argsort alone
@jax.jit
def sort_loop(x, y):
    def body(i, c):
        x2, y2 = c
        from sph_poiseuille_flow_tpu.ops.cellgrid import assign_slots
        slot, ovf = assign_slots(spec, x2, y2)
        return (x2 + 0.0 * slot[0], y2)
    return jax.lax.fori_loop(0, N_RB, body, (x, y))


out = sort_loop(state.x, state.y)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = sort_loop(state.x, state.y)
jax.block_until_ready(out)
print(f"assign_slots/call:   {(time.perf_counter() - t0) / N_RB * 1e3:.4f} "
      f"ms", flush=True)

glue = e2e - c32 / 24  # approx: guard adds a bit; rebuild counted via /cadence
print(f"e2e minus kernel(32)/step: {glue:.4f} ms (rebuild+glue+fixed)",
      flush=True)
