"""Measure ACTUAL max per-cell occupancy over a full 20 s dp=0.025 run.

The lane-packed fused grid overflows when any cell's particle count
exceeds cell_capacity K. The pristine-lattice bound (floor(cell_x/dp)+1
columns x floor(cell_y/dp)+1 rows) underestimates developed-flow
occupancy: advection drifts columns across cell edges and transport
shifting + weak compressibility cluster particles. This runs with a
GENEROUS K so nothing overflows, and rebins positions host-side at every
output point to record the true max count — the evidence for choosing
the shipping K.

Usage: python experiments/probe_occupancy.py [dp] [skin_mul] [K]
"""
import dataclasses
import os
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    # honor an explicit JAX_PLATFORMS even under interpreters whose
    # sitecustomize pins jax_platforms at startup (same pattern as
    # run.py:104-112) — otherwise a CPU-trajectory run hangs trying to
    # init a dead tunneled device
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def dataclasses_replace_skin(cfg, skin):
    return dataclasses.replace(cfg, neighbor_skin=skin)


def main(dp=0.025, skin_mul=0.3, K=18, nx_force=32, rebuild_every=64,
         end_time=20.0, interval=1.0, engine_name="pallas"):
    import os
    os.environ.setdefault("SPH_LANEPACK_NX", str(nx_force))
    import jax
    from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                         initial_state, make_engine)
    from sph_poiseuille_flow_tpu.ops import neighbors as nbr
    # trajectories are engine-independent (the engines are validated
    # bit-identical at matched settings), so off-TPU the cellgrid engine
    # (SPH_OCC_ENGINE=cellgrid) produces the same positions the fused
    # engine would — the occupancy verdict transfers
    engine_name = os.environ.get("SPH_OCC_ENGINE", engine_name)
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667,
        c_f=15.0, end_time=end_time, output_interval=interval,
        sort_interval=100, restart_from_file=False, engine=engine_name,
        neighbor_skin=skin_mul * dp, rebuild_every=rebuild_every,
        cell_capacity=K, neighbor_capacity=56)
    scene = build_scene(cfg)
    engine = make_engine(cfg, scene)
    # bin with the LANE-PACKED spec geometry of the TARGET fused config
    # regardless of the engine/knobs driving the trajectory (the
    # question is fused-layout occupancy; trajectories don't depend on
    # the skin/rebuild knobs while flags stay clean). SPH_OCC_BIN_SKIN
    # sets the target skin multiple (default 0.3).
    bin_cfg = dataclasses_replace_skin(
        cfg, float(os.environ.get("SPH_OCC_BIN_SKIN", "0.3")) * dp)
    spec = nbr.make_grid_spec(bin_cfg, scene, lane_pack=True)
    print(f"spec: nx={spec.nx} cell_x={spec.cell_x / dp:.3f}dp "
          f"cell_y={spec.cell_y / dp:.3f}dp K={spec.K} "
          f"skin_x={spec.skin_x / dp:.3f}dp skin_y={spec.skin_y / dp:.3f}dp",
          flush=True)
    state = initial_state(cfg, scene)
    state, cands, geom, overflow = engine.init(state)
    assert not bool(overflow), "overflow at init"

    def occupancy(x, y):
        ix = np.minimum((np.mod(np.asarray(x), spec.DL)
                         / spec.cell_x).astype(int), spec.nx - 1)
        iy = np.clip(((np.asarray(y) - spec.y0) / spec.cell_y).astype(int),
                     0, spec.ny - 1)
        counts = np.zeros((spec.ny, spec.nx), np.int64)
        np.add.at(counts, (iy, ix), 1)
        return counts

    t = 0.0
    counts0 = occupancy(state.x, state.y)
    occ_max = counts0.max()
    print(f"t=0: occ_max={occ_max} per-row={counts0.max(axis=1)}",
          flush=True)
    hard_max = int(occ_max)
    hard_rows = counts0.max(axis=1)
    while t < end_time - 1e-9:
        res = engine.run_interval(state, cands, geom, np.float32(interval))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom
        t += interval
        counts = occupancy(state.x, state.y)
        om = int(counts.max())
        hard_max = max(hard_max, om)
        hard_rows = np.maximum(hard_rows, counts.max(axis=1))
        print(f"t={t:.1f}: occ_max={om} overflow={bool(res.overflow)} "
              f"guard={bool(res.skin_guard)}", flush=True)
    # per-row maxima separate wall-adjacent compression from bulk flow:
    # the evidence for (or against) a row-tiered K
    print(f"RUN MAX OCCUPANCY: {hard_max} (K={K})", flush=True)
    print(f"PER-ROW RUN MAXIMA: {hard_rows}", flush=True)


if __name__ == "__main__":
    main(*(float(a) if "." in a else int(a) for a in sys.argv[1:]))
