"""A/B the row-group plan: R=3 (current) vs R=6 at dp=0.025."""
import sys, time
sys.path.insert(0, ".")
import numpy as np, jax
from sph_poiseuille_flow_tpu.ops import fused_cell as fc

R_FORCE = int(sys.argv[1]) if len(sys.argv) > 1 else None
if R_FORCE:
    _orig = fc.plan
    def plan(spec):
        nx, ny = spec.nx, spec.ny
        R = R_FORCE
        n_groups = -(-ny // R)
        return R, R * nx, n_groups, R * n_groups
    fc.plan = plan

from sph_poiseuille_flow_tpu import build_scene, derive_config, initial_state
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

cfg = derive_config(DL=3.0, DH=1.0, dp=0.025, rho0=1.0, mu=0.1, U_bulk=0.666667,
    c_f=15.0, end_time=20.0, output_interval=0.5, sort_interval=100,
    restart_from_file=False, engine="pallas", neighbor_skin=0.75*0.025,
    rebuild_every=8, cell_capacity=18)
scene = build_scene(cfg)
eng = PallasCellEngine(cfg, scene)
state, lay, geom, _ = eng.init(initial_state(cfg, scene))
res = eng.run_interval(state, lay, geom, np.float32(0.5))
jax.block_until_ready(res.state.x)
state, lay, geom = res.state, res.cands, res.geom
steps = 0; t0 = time.perf_counter()
for _ in range(2):
    res = eng.run_interval(state, lay, geom, np.float32(0.5))
    jax.block_until_ready(res.state.x)
    state, lay, geom = res.state, res.cands, res.geom
    steps += int(res.n_steps)
el = time.perf_counter() - t0
R, L, G, nyp = fc.plan(eng.spec)
print(f"R={R} L={L} G={G}: {el/steps*1e3:.3f} ms/step, "
      f"{steps*scene.n_fluid/el:.3e} psps v_max={float(res.v_max):.4f} "
      f"ovf={bool(res.overflow)}")
