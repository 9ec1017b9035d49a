"""Roofline accounting for the fused Pallas chunk kernel (docs/SCALING.md).

Two independent measurements at the bench scales (dp=0.025 / dp=0.01):

1. ANALYTIC flop/byte count of one physics step from the kernel's own
   loop structure (sweeps over 9K-candidate slabs; counts scale with
   lanes x groups x 9K), split into useful (true-pair) vs layout
   overcompute (padded candidate slots), using the measured candidate
   occupancy.
2. MEASURED wall time per step from the chunk kernel timed inside an
   on-device fori_loop (pitfall #5: never trust single-call timings).

achieved FLOP/s = analytic flops / measured time, compared against the
v5e vector-unit peak (~0.9e14 f32 FLOP/s practical VPU roofline; the MXU
does not apply — the kernel is elementwise/reduction-bound by design)
and HBM bandwidth (~8.1e11 B/s). The kernel carries state in VMEM across
a whole chunk, so HBM traffic per step is the per-chunk core transfer
amortized over n_sub steps.

Usage: python experiments/roofline.py [dp]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(dp=0.025):
    import jax
    import jax.numpy as jnp
    from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                         initial_state, make_engine)
    from sph_poiseuille_flow_tpu.ops import fused_cell as fc

    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667,
        c_f=15.0, end_time=20.0, output_interval=0.5, sort_interval=100,
        restart_from_file=False, engine="pallas",
        neighbor_skin=0.3 * dp, rebuild_every=64,
        cell_capacity=18, neighbor_capacity=56)
    scene = build_scene(cfg)
    engine = make_engine(cfg, scene)
    spec = engine.spec
    R, L, n_groups, nyp = fc.plan(spec)
    state = initial_state(cfg, scene)
    state, cands, geom, overflow = engine.init(state)
    assert not bool(overflow)

    # --- true interacting pairs (brute force, fluid-centric, directed)
    # vs candidate slots: the layout overcompute ratio
    n_fluid = scene.n_fluid
    x = np.asarray(state.x)
    y = np.asarray(state.y)
    cutoff = 2.0 * cfg.h
    dx = x[:n_fluid, None] - x[None, :]
    dx -= cfg.DL * np.round(dx / cfg.DL)
    dy = y[:n_fluid, None] - y[None, :]
    r2 = dx * dx + dy * dy
    within = (r2 < cutoff * cutoff)
    n_pairs = int(within.sum())  # directed fluid->all, incl. self

    cand_slots = n_groups * L * 9 * spec.K
    per_slot = 4 * 28 + (34 + 46 + 58 + 38)
    per_part = 120
    flops = cand_slots * per_slot + n_groups * L * per_part

    # --- time per step inside one on-device loop over chunk calls
    res = engine.run_interval(state, cands, geom, np.float32(0.5))
    jax.block_until_ready(res.state.x)
    state, cands, geom = res.state, res.cands, res.geom
    steps = 0
    t0 = time.perf_counter()
    for _ in range(2):
        res = engine.run_interval(state, cands, geom, np.float32(0.5))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom
        steps += int(res.n_steps)
    dt_step = (time.perf_counter() - t0) / steps

    # --- HBM traffic per step: chunk in/out cores amortized over n_sub
    f = 4  # f32 bytes
    halo = (nyp + 2) * spec.K * (spec.nx + 2)
    plain = nyp * spec.K * spec.nx
    n_sub = min(int(cfg.rebuild_every), 16)
    chunk_bytes = f * (14 * halo + 22 * plain)   # ins+outs upper bound
    hbm_per_step = chunk_bytes / n_sub

    flop_s = flops / dt_step
    hbm_s = hbm_per_step / dt_step
    VPU_PEAK = 0.9e14   # v5e practical f32 VPU roofline
    HBM_PEAK = 8.1e11
    print(f"dp={dp}: n_fluid={n_fluid} plan R={R} L={L} groups={n_groups} "
          f"K={spec.K} cand_slots={cand_slots}")
    print(f"  true directed pairs={n_pairs} overcompute="
          f"{cand_slots / n_pairs:.1f}x")
    print(f"  analytic flops/step={flops:.3e}  measured {dt_step*1e3:.3f} "
          f"ms/step -> {flop_s:.3e} FLOP/s = {100*flop_s/VPU_PEAK:.1f}% "
          f"of VPU peak")
    print(f"  HBM bytes/step~{hbm_per_step:.3e} -> {hbm_s:.3e} B/s = "
          f"{100*hbm_s/HBM_PEAK:.2f}% of HBM peak (VMEM-resident chunks)")
    print(f"  psteps/s={n_fluid/dt_step:.3e}")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.025)
