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
mass = eng._mass; wvx = eng._wall_vx; wvy = eng._wall_vy; wy = eng._wall_y

N = 200
@jax.jit
def run(x, y):
    def body(i, c):
        x, y = c
        l = fc.build_fused_layout(spec, x, y, mass, wvx, wvy, wy)
        # mimic the engine's rebuild: 5 takes + 5 scatters
        xp = fc.make_plain(spec, l.pidx, x)
        x2 = xp.reshape(-1)[l.pidx]
        return (x2, y + 0.0 * l.occ[0, 0])
    return jax.lax.fori_loop(0, N, body, (x, y))
out = run(state.x, state.y); jax.block_until_ready(out[0])
t0 = time.perf_counter(); out = run(state.x, state.y); jax.block_until_ready(out[0])
print(f"build_fused_layout (+1 scatter +1 take): {(time.perf_counter()-t0)/N*1e3:.3f} ms")

# isolate argsort
@jax.jit
def run2(cid):
    def body(i, c):
        o = jnp.argsort(c, stable=True).astype(jnp.int32)
        return c + 0 * o[0]
    return jax.lax.fori_loop(0, N, body, cid)
cid = jnp.arange(spec.n_total, dtype=jnp.int32) % spec.n_cells
out = run2(cid); jax.block_until_ready(out)
t0 = time.perf_counter(); out = run2(cid); jax.block_until_ready(out)
print(f"argsort({spec.n_total}) alone: {(time.perf_counter()-t0)/N*1e3:.3f} ms")
