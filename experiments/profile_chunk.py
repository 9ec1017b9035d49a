"""Time the chunk kernel (n_sub steps in one call) on-device."""
import time
import jax, jax.numpy as jnp
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
eng = PallasCellEngine(cfg, scene)
state, lay, geom, _ = eng.init(initial_state(cfg, scene))
scal = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0, cfg.transport_coeff,
        cfg.gravity_g, cfg.mu, cfg.wall_visc_factor)
xH = fc.make_core(spec, lay.pidx, state.x, fill=fc._BIG_X, xshift=spec.DL)
yH = fc.make_core(spec, lay.pidx, state.y)
vxH = fc.make_core(spec, lay.pidx, state.vx)
vyH = fc.make_core(spec, lay.pidx, state.vy)
drP = fc.make_plain(spec, lay.pidx, state.drho_dt)

N = 100
for nsub in (1, 2, 4, 8):
    @jax.jit
    def run(carry):
        def body(i, carry):
            xH, yH, vxH, vyH, drP = carry
            st, aux, steps, t, tc = fc.fused_chunk_call(
                spec, lay, xH, yH, vxH, vyH, drP,
                jnp.asarray(0.0, xH.dtype), jnp.asarray(0.0, xH.dtype),
                jnp.asarray(1.0, xH.dtype), nsub, *scal)
            return (st["xH"], st["yH"], st["vxH"], st["vyH"], st["drP"])
        return jax.lax.fori_loop(0, N, body, carry)
    c0 = (xH, yH, vxH, vyH, drP)
    out = run(c0); jax.block_until_ready(out[0])
    t0 = time.perf_counter(); out = run(c0); jax.block_until_ready(out[0])
    t = (time.perf_counter() - t0) / N * 1e3
    print(f"n_sub={nsub}: {t:.3f} ms/call = {t/nsub:.3f} ms/step")
