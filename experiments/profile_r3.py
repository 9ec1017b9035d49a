"""Round-3 perf recon: per-sweep cost + developed-flow occupancy stats.

Times the fused single-step call with grid restricted to ONE sweep
(sweep_offset) to decompose the step cost, and reports per-row-group
occupancy of a developed-flow state (the k-loop bound the kernels pay).
Run on the real TPU: timings use an on-device fori_loop threading a data
dependency (tunnel benching rules).
"""
import functools
import sys
sys.path.insert(0, ".")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_poiseuille_flow_tpu import build_scene, derive_config, initial_state
from sph_poiseuille_flow_tpu.ops import fused_cell as fc
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

dp = float(sys.argv[1]) if len(sys.argv) > 1 else 0.025
warm_t = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
K_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 18
skin_mul = float(sys.argv[4]) if len(sys.argv) > 4 else 0.75

cfg = derive_config(
    DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667, c_f=15.0,
    end_time=20.0, output_interval=0.5, sort_interval=100,
    restart_from_file=False, neighbor_skin=skin_mul * dp, rebuild_every=32,
    cell_capacity=K_cap, neighbor_capacity=56)
scene = build_scene(cfg)
eng = PallasCellEngine(cfg, scene)
spec = eng.spec
R, L, n_groups, nyp = fc.plan(spec)
print(f"spec: nx={spec.nx} ny={spec.ny} K={spec.K} n={spec.n_total} "
      f"n_fluid={spec.n_fluid}; plan R={R} L={L} n_groups={n_groups} "
      f"nyp={nyp} 9K={9*spec.K}", flush=True)

state = initial_state(cfg, scene)
state, lay, geom, _ = eng.init(state)

# develop the flow so occupancy reflects real compression
t = 0.0
while t < warm_t:
    res = eng.run_interval(state, lay, geom, np.float32(0.5))
    state, lay, geom = res.state, res.cands, res.geom
    t += 0.5
    assert not bool(res.overflow)
print(f"developed to t={t:.1f}s", flush=True)

# occupancy stats
from sph_poiseuille_flow_tpu.ops.cellgrid import assign_slots
slot, _ = assign_slots(spec, state.x, state.y)
cell = np.asarray(slot) // spec.K
counts = np.bincount(np.minimum(cell, spec.n_cells - 1),
                     minlength=spec.n_cells).reshape(spec.ny, spec.nx)
occ_rows = np.zeros((nyp, spec.nx), np.int64)
occ_rows[:spec.ny] = counts
print("per-row max occ:", occ_rows.max(axis=1).tolist(), flush=True)
occ_grp = occ_rows.reshape(n_groups, R * spec.nx).max(axis=1)
print("per-group max occ (kmax):", occ_grp.tolist(), flush=True)
print(f"mean cell occ (occupied cells): "
      f"{counts[counts>0].mean():.2f}; max {counts.max()}", flush=True)
# which rows are pure wall / mixed / fluid
ylo = np.full(spec.ny, np.inf)
yhi = np.full(spec.ny, -np.inf)
y = np.asarray(state.y)
cy = np.clip(((y - spec.y0) / spec.cell_y).astype(int), 0, spec.ny - 1)
for r in range(spec.ny):
    sel = cy == r
    if sel.any():
        idx = np.nonzero(sel)[0]
        ylo[r], yhi[r] = y[idx].min(), y[idx].max()
        kinds = ("F" if (idx < spec.n_fluid).any() else "") + (
            "W" if (idx >= spec.n_fluid).any() else "")
    else:
        kinds = "-"
    print(f"  row {r:2d}: occ_max={counts[r].max():2d} kind={kinds}")

scalars = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, cfg.transport_coeff,
           cfg.gravity_g, cfg.mu, cfg.wall_visc_factor)
xH = fc.make_core(spec, lay.pidx, state.x, fill=fc._BIG_X, xshift=spec.DL)
yH = fc.make_core(spec, lay.pidx, state.y)
vxH = fc.make_core(spec, lay.pidx, state.vx)
vyH = fc.make_core(spec, lay.pidx, state.vy)
drP = fc.make_plain(spec, lay.pidx, state.drho_dt)
cores9 = [xH, yH, vxH, vyH, drP, lay.isf_c, lay.mass_c, lay.wvx_c,
          lay.wvy_c]
dtv = jnp.asarray(1e-4, state.x.dtype)
params = jnp.stack([dtv, jnp.asarray(cfg.gravity_g, dtype=state.x.dtype),
                    jnp.asarray(cfg.mu, dtype=state.x.dtype),
                    jnp.asarray(cfg.wall_visc_factor,
                                dtype=state.x.dtype)]).reshape(1, 4)

nx, K = spec.nx, spec.K
dtype = xH.dtype
halo_shape = (nyp + 2, K, nx + 2)
plain_shape = (nyp, K, nx)
out_shape = ([jax.ShapeDtypeStruct(halo_shape, dtype)] * fc._HALO_OUT
             + [jax.ShapeDtypeStruct(plain_shape, dtype)] * fc._PLAIN_OUT
             + [jax.ShapeDtypeStruct((n_groups, L), dtype)])
scratch = ([pltpu.VMEM((9 * K, L), dtype) for _ in range(fc._N_SCR_FULL)]
           + [pltpu.VMEM((K, L), dtype) for _ in range(fc._N_ACC)]
           + [pltpu.VMEM((K, L), dtype) for _ in range(fc._N_ASIDE)]
           + [pltpu.VMEM(halo_shape, dtype),
              pltpu.VMEM(halo_shape, dtype),
              pltpu.VMEM(plain_shape, dtype),
              pltpu.VMEM(plain_shape, dtype)])


def call_sweeps(n_sweeps, sweep_offset):
    kernel = functools.partial(
        fc._step_kernel, spec=spec, R=R, L=L, n_groups=n_groups, nyp=nyp,
        scalars=scalars, sweep_offset=sweep_offset)
    return pl.pallas_call(
        kernel, grid=(n_sweeps, n_groups),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * fc._N_OUT,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))


def time_loop(fn, n=200):
    @jax.jit
    def run(xh):
        def body(i, xh):
            outs = fn(xh)
            return xh + 0.0 * outs[0].reshape(-1)[0]
        return jax.lax.fori_loop(0, n, body, xh)
    out = run(xH)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(xH)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def one_sweep(s):
    c = call_sweeps(1, s)
    def fn(xh):
        cs = [xh] + cores9[1:]
        return c(*cs, lay.occ, params)
    return fn


def all_sweeps(xh):
    c = call_sweeps(4, 0)
    cs = [xh] + cores9[1:]
    return c(*cs, lay.occ, params)


t_all = time_loop(all_sweeps)
print(f"full 4-sweep step call: {t_all:.4f} ms", flush=True)
ts = []
for s in range(4):
    ti = time_loop(one_sweep(s))
    ts.append(ti)
    print(f"sweep {s} only:          {ti:.4f} ms", flush=True)
print(f"sum of single sweeps: {sum(ts):.4f} ms "
      f"(fixed-cost overcount ~3x per-call cost)", flush=True)

# no-op kernel with identical buffers = fixed per-call cost
def noop_kernel(*refs):
    refs[fc._N_IN][0, 0, :] = refs[0][0, 0, :]


def noop(xh):
    cs = [xh] + cores9[1:]
    return pl.pallas_call(
        noop_kernel, grid=(),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * fc._N_OUT,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))(
        *cs, lay.occ, params)


print(f"no-op call (fixed cost): {time_loop(noop):.4f} ms", flush=True)
