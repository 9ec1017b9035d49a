"""Confirm: does no-op cost scale with program count (per-program DMA)?"""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_poiseuille_flow_tpu import build_scene, derive_config, initial_state
from sph_poiseuille_flow_tpu.ops import fused_cell as fc
from sph_poiseuille_flow_tpu.ops.neighbors import make_grid_spec
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

cfg = derive_config(DL=3.0, DH=1.0, dp=0.025, rho0=1.0, mu=0.1, U_bulk=0.666667,
    c_f=15.0, end_time=20.0, output_interval=0.5, sort_interval=100,
    restart_from_file=False, engine="pallas", neighbor_skin=0.75*0.025,
    rebuild_every=8, cell_capacity=18, neighbor_capacity=56)
scene = build_scene(cfg)
spec = make_grid_spec(cfg, scene)
R, L, n_groups, nyp = fc.plan(spec)
eng = PallasCellEngine(cfg, scene)
state, lay, geom, _ = eng.init(initial_state(cfg, scene))
xH = fc.make_core(spec, lay.pidx, state.x)
cores = [xH]*4 + [fc.make_plain(spec, lay.pidx, state.drho_dt),
         lay.pid_c, lay.mass_c, lay.wvx_c, lay.wvy_c]
dtv = jnp.asarray(1e-4, state.x.dtype)

def noop_call(grid, cores):
    nx, K = spec.nx, spec.K
    dtype = cores[0].dtype
    halo_shape = (nyp + 2, K, nx + 2)
    plain_shape = (nyp, K, nx)
    def kernel(*refs):
        refs[fc._N_IN][0, :, :] = jnp.zeros((K, nx + 2), dtype)
    out_shape = ([jax.ShapeDtypeStruct(halo_shape, dtype)] * fc._HALO_OUT
                 + [jax.ShapeDtypeStruct(plain_shape, dtype)] * fc._PLAIN_OUT
                 + [jax.ShapeDtypeStruct((n_groups, L), dtype)])
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * fc._N_OUT,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((9 * K, L), dtype) for _ in range(fc._N_SCR_FULL)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(fc._N_ACC)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(fc._N_ASIDE)]
            + [pltpu.VMEM(halo_shape, dtype), pltpu.VMEM(halo_shape, dtype),
               pltpu.VMEM(plain_shape, dtype), pltpu.VMEM(plain_shape, dtype)]),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(*cores, lay.occ, jnp.asarray(dtv, dtype).reshape(1, 1))

N = 300
def timed(grid):
    @jax.jit
    def run(cores):
        def body(i, cores):
            outs = noop_call(grid, cores)
            return (cores[0] + 0.0 * outs[0][0, 0, 0], *cores[1:])
        return jax.lax.fori_loop(0, N, body, tuple(cores))
    out = run(tuple(cores)); jax.block_until_ready(out[0])
    t0 = time.perf_counter(); out = run(tuple(cores)); jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / N * 1e3

for grid in ((), (1,), (2,), (6,), (12,), (24,)):
    print(f"grid={grid}: {timed(grid):.4f} ms")
