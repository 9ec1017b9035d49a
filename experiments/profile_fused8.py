"""Fixed cost with carried cores + individual sweep costs via offset."""
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
scalars = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, cfg.transport_coeff,
           cfg.gravity_g, cfg.mu, cfg.wall_visc_factor)
cores = [fc.make_core(spec, lay.pidx, v) for v in
         (state.x, state.y, state.vx, state.vy)]
cores.append(fc.make_plain(spec, lay.pidx, state.drho_dt))
cores += [lay.pid_c, lay.mass_c, lay.wvx_c, lay.wvy_c]
occ = lay.occ
dtv = jnp.asarray(1e-4, state.x.dtype).reshape(1, 1)

def call(mode, cores, occ, dts):
    nx, K = spec.nx, spec.K
    dtype = cores[0].dtype
    halo_shape = (nyp + 2, K, nx + 2)
    plain_shape = (nyp, K, nx)
    if mode == "noop":
        def kernel(*refs):
            refs[fc._N_IN][0, :, :] = jnp.zeros((K, nx + 2), dtype)
        grid = (1, n_groups)
    elif isinstance(mode, int):
        base = fc._step_kernel
        def kernel(*refs):
            # shift program_id: run only sweep `mode`
            return base(*refs, spec=spec, R=R, L=L, n_groups=n_groups,
                        nyp=nyp, scalars=scalars, sweep_offset=mode)
        grid = (1, n_groups)
    else:
        kernel = functools.partial(fc._step_kernel, spec=spec, R=R, L=L,
                                   n_groups=n_groups, nyp=nyp,
                                   scalars=scalars)
        grid = (4, n_groups)
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
    )(*cores, occ, dts)

N = 300
def timed(mode):
    @jax.jit
    def run(carry):
        def body(i, carry):
            cores, occ, dts = carry
            outs = call(mode, cores, occ, dts)
            c0 = cores[0] + 0.0 * outs[0][0, 0, 0]
            return ((c0, *cores[1:]), occ, dts)
        return jax.lax.fori_loop(0, N, body, carry)
    carry0 = (tuple(cores), occ, dtv)
    out = run(carry0); jax.block_until_ready(out[0][0])
    t0 = time.perf_counter(); out = run(carry0); jax.block_until_ready(out[0][0])
    return (time.perf_counter() - t0) / N * 1e3

print(f"noop (carried): {timed('noop'):.3f} ms")
for s in (0, 1, 2, 3):
    print(f"only sweep {s}: {timed(s):.3f} ms")
print(f"full 4 sweeps: {timed('full'):.3f} ms")
