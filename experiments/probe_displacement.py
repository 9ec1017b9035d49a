"""Measure absolute vs row-relative displacement over N steps of developed
flow: sizes the rebuild-cadence win of a relative-displacement skin guard."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from sph_poiseuille_flow_tpu import build_scene, derive_config, initial_state
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

dp = float(sys.argv[1]) if len(sys.argv) > 1 else 0.025
warm_t = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0

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
t = 0.0
while t < warm_t:
    res = eng.run_interval(state, lay, geom, np.float32(0.5))
    state, lay, geom = res.state, res.cands, res.geom
    t += 0.5
print(f"developed to t={t}", flush=True)

nf = spec.n_fluid
x0 = np.asarray(state.x)[:nf].copy()
y0 = np.asarray(state.y)[:nf].copy()

# step forward N steps via tiny intervals (run_interval rebuilds internally,
# but displacement vs x0 is what we measure)
dt_est = 0.25 * cfg.h / (cfg.c_f + 1.1)
for n_steps in (8, 16, 24, 32, 48):
    res = eng.run_interval(state, lay, geom, np.float32(0.0) + 0.0)
    # advance exactly n_steps' worth of time from the base state
    st, la, ge = state, lay, geom
    target = dt_est * n_steps
    res = eng.run_interval(st, la, ge, np.float32(target))
    xs = np.asarray(res.state.x)[:nf]
    ys = np.asarray(res.state.y)[:nf]
    dx = xs - x0
    dx -= cfg.DL * np.round(dx / cfg.DL)
    dy = ys - y0
    disp = np.sqrt(dx ** 2 + dy ** 2)
    # row-relative: subtract per-cell-row mean x-drift
    cy = np.clip(((y0 - spec.y0) / spec.cell_y).astype(int), 0, spec.ny - 1)
    mean_dx = np.zeros(spec.ny)
    for r in range(spec.ny):
        sel = cy == r
        if sel.any():
            mean_dx[r] = dx[sel].mean()
    rel_dx = dx - mean_dx[cy]
    rel_disp = np.sqrt(rel_dx ** 2 + dy ** 2)
    # adjacent-row drift difference (the bound's cross-row term)
    adj = np.max(np.abs(np.diff(mean_dx[np.unique(cy)])))
    n_act = int(res.n_steps)
    print(f"steps={n_act:3d}: abs_max={disp.max()/dp:6.3f}dp "
          f"rel_max={rel_disp.max()/dp:6.3f}dp "
          f"adj_row_drift={adj/dp:6.3f}dp "
          f"(guard budget skin/2 = {spec.skin/2/dp:.3f}dp)", flush=True)
