"""Throwaway: decompose fused-kernel step time by sweep / staging / k-loop."""
import functools, math, time, sys
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sph_poiseuille_flow_tpu import build_scene, derive_config, initial_state
from sph_poiseuille_flow_tpu.ops import fused_cell as fc
from sph_poiseuille_flow_tpu.ops.neighbors import make_grid_spec
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

cfg = derive_config(DL=3.0, DH=1.0, dp=0.025, rho0=1.0, mu=0.1, U_bulk=0.666667,
    c_f=15.0, end_time=20.0, output_interval=0.5, sort_interval=100,
    restart_from_file=False, neighbor_skin=0.75*0.025, rebuild_every=8,
    cell_capacity=18, neighbor_capacity=56)
scene = build_scene(cfg)
spec = make_grid_spec(cfg, scene)
R, L, n_groups, nyp = fc.plan(spec)
print(f"spec: nx={spec.nx} ny={spec.ny} K={spec.K} S={spec.n_cells} "
      f"n_total={spec.n_total}; plan R={R} L={L} n_groups={n_groups}", flush=True)

eng = PallasCellEngine(cfg, scene)
state = initial_state(cfg, scene)
state, lay, geom, _ = eng.init(state)

scalars = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, cfg.transport_coeff,
           cfg.gravity_g, cfg.mu, cfg.wall_visc_factor)
cores = [fc.make_core(spec, lay.pidx, v) for v in
         (state.x, state.y, state.vx, state.vy, state.drho_dt)]
cores += [lay.isf_c, lay.mass_c, lay.wvx_c, lay.wvy_c]
dt = jnp.asarray(1e-4, state.x.dtype)

def timeit(fn, *args, n=50):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

# full fused call baseline (single dispatch, not in a loop)
full = jax.jit(lambda *c: fc._fused_call(spec, c, dt, scalars))
print(f"full fused call: {timeit(full, *cores):.3f} ms", flush=True)

# variant: sweeps subset via masking program_id
def make_variant(sweeps, kmax=None):
    kern_orig = fc._step_kernel
    def kernel(*refs, **kw):
        return kern_orig(*refs, **kw)
    # monkeypatch approach: re-call _fused_call but with grid over len(sweeps)
    # simpler: copy _fused_call with custom grid mapping
    nx, K = spec.nx, spec.K
    dtype = cores[0].dtype
    halo_shape = (nyp + 2, K, nx + 2)
    plain_shape = (nyp, K, nx)
    def wrapped(*refs):
        # map program_id(0) in [0,len(sweeps)) -> actual sweep id by when-guards
        kern = functools.partial(fc._step_kernel, spec=spec, R=R, L=L,
                                 n_groups=n_groups, nyp=nyp, scalars=scalars)
        return kern(*refs)
    out_shape = ([jax.ShapeDtypeStruct(halo_shape, dtype)] * fc._HALO_OUT
                 + [jax.ShapeDtypeStruct(plain_shape, dtype)] * fc._PLAIN_OUT
                 + [jax.ShapeDtypeStruct((n_groups, L), dtype)])
    # grid dimension 0 indexes into `sweeps` tuple... we can't remap ids easily;
    # instead run grid=(4, n_groups) but patch kernel to skip non-listed sweeps.
    def kernel2(*refs, **kw):
        pass
    return None

# Instead: time single-sweep cost by running grid=(1..4, n_groups) prefixes.
def prefix_call(n_sweeps):
    nx, K = spec.nx, spec.K
    dtype = cores[0].dtype
    halo_shape = (nyp + 2, K, nx + 2)
    plain_shape = (nyp, K, nx)
    kernel = functools.partial(fc._step_kernel, spec=spec, R=R, L=L,
                               n_groups=n_groups, nyp=nyp, scalars=scalars)
    out_shape = ([jax.ShapeDtypeStruct(halo_shape, dtype)] * fc._HALO_OUT
                 + [jax.ShapeDtypeStruct(plain_shape, dtype)] * fc._PLAIN_OUT
                 + [jax.ShapeDtypeStruct((n_groups, L), dtype)])
    return pl.pallas_call(
        kernel, grid=(n_sweeps, n_groups),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * fc._N_OUT,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((9 * K, L), dtype) for _ in range(fc._N_SCR_FULL)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(fc._N_ACC)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(fc._N_ASIDE)]
            + [pltpu.VMEM(halo_shape, dtype), pltpu.VMEM(halo_shape, dtype),
               pltpu.VMEM(plain_shape, dtype), pltpu.VMEM(plain_shape, dtype)]),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(*cores, jnp.asarray(dt, dtype).reshape(1, 1))

prev = 0.0
for ns in (1, 2, 3, 4):
    f = jax.jit(lambda *c, ns=ns: prefix_call(ns))
    t = timeit(f, n=50)
    print(f"sweeps 0..{ns-1}: {t:.3f} ms (marginal sweep {ns-1}: {t-prev:.3f})", flush=True)
    prev = t
