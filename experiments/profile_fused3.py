"""Post-occ kernel decomposition: fixed call cost vs per-sweep cost."""
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
print(f"nx={spec.nx} ny={spec.ny} K={spec.K} R={R} L={L} G={n_groups}")

eng = PallasCellEngine(cfg, scene)
state, lay, geom, _ = eng.init(initial_state(cfg, scene))
scalars = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, cfg.transport_coeff,
           cfg.gravity_g, cfg.mu, cfg.wall_visc_factor)
xH = fc.make_core(spec, lay.pidx, state.x)
yH = fc.make_core(spec, lay.pidx, state.y)
vxH = fc.make_core(spec, lay.pidx, state.vx)
vyH = fc.make_core(spec, lay.pidx, state.vy)
drP = fc.make_plain(spec, lay.pidx, state.drho_dt)
cores = [xH, yH, vxH, vyH, drP, lay.pid_c, lay.mass_c, lay.wvx_c, lay.wvy_c]
dtv = jnp.asarray(1e-4, state.x.dtype)

def call_n_sweeps(n_sweeps, cores, noop=False):
    nx, K = spec.nx, spec.K
    dtype = cores[0].dtype
    halo_shape = (nyp + 2, K, nx + 2)
    plain_shape = (nyp, K, nx)
    if noop:
        def kernel(*refs):
            refs[fc._N_IN][0, :, :] = jnp.zeros((K, nx + 2), dtype)
    else:
        kernel = functools.partial(fc._step_kernel, spec=spec, R=R, L=L,
                                   n_groups=n_groups, nyp=nyp, scalars=scalars)
    out_shape = ([jax.ShapeDtypeStruct(halo_shape, dtype)] * fc._HALO_OUT
                 + [jax.ShapeDtypeStruct(plain_shape, dtype)] * fc._PLAIN_OUT
                 + [jax.ShapeDtypeStruct((n_groups, L), dtype)])
    return pl.pallas_call(
        kernel, grid=(n_sweeps, n_groups),
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
def timed(n_sweeps, noop=False):
    @jax.jit
    def run(cores):
        def body(i, cores):
            outs = call_n_sweeps(n_sweeps, cores, noop)
            return (cores[0] + 0.0 * outs[0][0, 0, 0], *cores[1:])
        return jax.lax.fori_loop(0, N, body, tuple(cores))
    out = run(tuple(cores)); jax.block_until_ready(out[0])
    t0 = time.perf_counter(); out = run(tuple(cores)); jax.block_until_ready(out[0])
    return (time.perf_counter() - t0) / N * 1e3

print(f"noop kernel (grid 1xG): {timed(1, noop=True):.3f} ms")
prev = 0.0
for ns in (1, 2, 3, 4):
    t = timed(ns)
    print(f"sweeps 0..{ns-1}: {t:.3f} ms (marginal: {t-prev:.3f})")
    prev = t
