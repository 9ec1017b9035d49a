"""Split the bench-config end-to-end ms/step into kernel / guard / glue.

Times, at the SHIPPING bench config (lane-packed nx=40, K=14, skin=0.3dp,
rebuild_every=128) and a developed-flow state (t>=2.5 s):
  A. pure chunk kernel: fori_loop of 16-step fused_chunk_call
  B. kernel + pair_drift_bounds per sub-chunk (the guard)
  C. full engine.run_interval (adds rebuilds, rollback glue, interval loop)
All loops thread data deps on-device (tunnel timing rules). Each timed
region repeats REPEATS times and reports the MIN — this VM shows steal
time, so a single aggregate sample per variant is unreliable (the same
best-of-N methodology as bench.py).
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from sph_poiseuille_flow_tpu import build_scene, derive_config, initial_state
from sph_poiseuille_flow_tpu.ops import fused_cell as fc
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

dp = 0.025
nx3 = round(3.0 / (3.0 * dp))
cfg = derive_config(
    DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667, c_f=15.0,
    end_time=20.0, output_interval=0.5, sort_interval=100,
    restart_from_file=False, engine="pallas", neighbor_skin=0.3 * dp,
    rebuild_every=128, cell_capacity=14, lane_pack_nx=nx3,
    neighbor_capacity=56)
scene = build_scene(cfg)
eng = PallasCellEngine(cfg, scene)
spec = eng.spec
state = initial_state(cfg, scene)
state, lay, geom, _ = eng.init(state)
for _ in range(5):
    res = eng.run_interval(state, lay, geom, np.float32(0.5))
    state, lay, geom = res.state, res.cands, res.geom
print("warmed to t=2.5", flush=True)

# rebuild a fresh layout at this state so candidates are valid
lay2, (vxPc, vyPc, drPc) = fc.build_fused_layout(
    spec, np.asarray(state.x), np.asarray(state.y), eng._mass,
    eng._wall_vx, eng._wall_vy, eng._wall_y,
    state_fields=(np.asarray(state.vx), np.asarray(state.vy),
                  np.zeros_like(np.asarray(state.x))))
xH = fc.halo_ify(spec, lay2.refx_p, fill=fc._BIG_X, xshift=spec.DL)
yH = fc.halo_ify(spec, lay2.refy_p)
vxH = fc.halo_ify(spec, vxPc)
vyH = fc.halo_ify(spec, vyPc)
dtype = xH.dtype

N_CHUNKS = 32
SUB = 16
REPEATS = 5


def run_kernel_loop(with_guard: bool):
    def body(i, carry):
        xh, yh, vxh, vyh, drp, t, tc, g0, g1 = carry
        st2, aux2, done, t2, tc2 = fc.fused_chunk_call(
            spec, lay2, xh, yh, vxh, vyh, drp, t, tc,
            jnp.asarray(1e9, dtype), jnp.asarray(SUB, jnp.int32),
            cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0,
            cfg.transport_coeff, cfg.gravity_g, cfg.mu,
            cfg.wall_visc_factor)
        if with_guard:
            bx, by = fc.pair_drift_bounds(spec, lay2, st2["xP"], st2["yP"])
            g0, g1 = g0 + bx, g1 + by
        return (st2["xH"], st2["yH"], st2["vxH"], st2["vyH"], st2["drP"],
                t2, tc2, g0, g1)

    z = jnp.asarray(0.0, dtype)
    f = jax.jit(lambda c: jax.lax.fori_loop(0, N_CHUNKS, body, c))
    carry = (xH, yH, vxH, vyH, drPc, z, z, z, z)
    out = f(carry)
    jax.block_until_ready(out)
    samples = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = f(carry)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0)
                       / (N_CHUNKS * SUB) * 1e3)
    print(f"   samples: {['%.4f' % s for s in samples]}", flush=True)
    return min(samples)


a = run_kernel_loop(False)
print(f"A kernel-only        {a:7.4f} ms/step", flush=True)
b = run_kernel_loop(True)
print(f"B kernel+guard       {b:7.4f} ms/step  (guard {b - a:+.4f})",
      flush=True)

# C: full engine interval at the same state (min of REPEATS, like A/B)
res = eng.run_interval(state, lay, geom, np.float32(0.5))
jax.block_until_ready(res.state.x)
samples = []
for _ in range(REPEATS):
    t0 = time.perf_counter()
    res = eng.run_interval(state, lay, geom, np.float32(0.5))
    jax.block_until_ready(res.state.x)
    samples.append((time.perf_counter() - t0) / int(res.n_steps) * 1e3)
print(f"   samples: {['%.4f' % s for s in samples]}", flush=True)
c = min(samples)
print(f"C full run_interval  {c:7.4f} ms/step  over {int(res.n_steps)} "
      f"steps (glue+rebuild {c - b:+.4f})", flush=True)
