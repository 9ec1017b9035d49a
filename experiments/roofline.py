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

    # shipping fused-grid config (matches bench.py): cell_x = 3dp exactly
    # where DL divides -> K=14; else the cost-model pick with K=18
    nx3 = round(3.0 / (3.0 * dp))
    exact = abs(nx3 * 3.0 * dp - 3.0) < 1e-9
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667,
        c_f=15.0, end_time=20.0, output_interval=0.5, sort_interval=100,
        restart_from_file=False, engine="pallas",
        neighbor_skin=0.3 * dp, rebuild_every=128,
        cell_capacity=14 if exact else 18,
        lane_pack_nx=nx3 if exact else 0, neighbor_capacity=56)
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

    # --- time per step inside one on-device loop over chunk calls
    # (warm past the startup transient into developed flow, like bench.py)
    for _ in range(5):
        res = engine.run_interval(state, cands, geom, np.float32(0.5))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom

    # per (sweep, group): kmax anchor-rank iterations, each doing
    # vector work over the full (9K, L) candidate slab — geometry
    # (dx/dy/r/ex/ey/W/dW ~28 flops/slot) plus the sweep body
    # (~8/18/30/10 flops/slot for density/KGC/forces/int2, read from
    # the kbody arithmetic) — so kmax multiplies EVERYTHING. Measured
    # AFTER warmup: developed-flow compression raises occupancy over
    # the pristine lattice (9 -> ~12 at the nx=40 shipping grid).
    # With the geometry cache active (fused_cell.use_geom_cache), sweeps
    # 1-3 replace the 28-flop geometry with 5 slab loads.
    from sph_poiseuille_flow_tpu.ops.fused_cell import use_geom_cache
    import jax.numpy as jnp
    cached = use_geom_cache(spec, jnp.float32)
    kmax = np.asarray(cands.occ).reshape(-1)
    slab = 9 * spec.K * L
    if cached:
        per_slot_sweeps = (28 + 8) + 18 + 30 + 10   # + 15 cache ld/st
    else:
        per_slot_sweeps = (28 + 8) + (28 + 18) + (28 + 30) + (28 + 10)
    flops = int(np.sum(kmax)) * slab * per_slot_sweeps
    cand_slots = n_groups * L * 9 * spec.K

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

    # --- XLA's own flop count for one n_sub-step chunk call (the
    # compiler's cost model over the lowered HLO; Pallas kernel
    # interiors are opaque to it, so this reports the XLA-glue share —
    # the hand count above covers the kernel interior)
    try:
        import jax.numpy as jnp
        from sph_poiseuille_flow_tpu.ops import fused_cell as fc
        lay = cands
        scal = (cfg.rho0, cfg.p0, cfg.c_f, cfg.inv_sigma0,
                cfg.transport_coeff, cfg.gravity_g, cfg.mu,
                cfg.wall_visc_factor)

        def one_chunk(xH, yH, vxH, vyH, drP):
            return fc.fused_chunk_call(
                spec, lay, xH, yH, vxH, vyH, drP,
                jnp.asarray(0.0, xH.dtype), jnp.asarray(0.0, xH.dtype),
                jnp.asarray(1e9, xH.dtype), n_sub, *scal)

        cores = [fc.make_core(spec, lay.pidx, state.x, fill=fc._BIG_X,
                              xshift=spec.DL)]
        cores += [fc.make_core(spec, lay.pidx, getattr(state, f))
                  for f in ("y", "vx", "vy")]
        drP = fc.make_plain(spec, lay.pidx, state.drho_dt)
        ca = jax.jit(one_chunk).lower(*cores, drP).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(f"  XLA cost_analysis (glue, per {n_sub}-step chunk): "
              f"flops={ca.get('flops', 0):.3e} "
              f"bytes={ca.get('bytes accessed', 0):.3e}")
    except Exception as e:  # cost analysis is best-effort diagnostics
        print(f"  (cost_analysis unavailable: {e})")

    flop_s = flops / dt_step
    hbm_s = hbm_per_step / dt_step
    # v5e per-chip VPU: (8,128) vector unit, ~4 f32 ops/cycle lane at
    # ~0.94 GHz => ~3.9e12 FLOP/s (the MXU's 197 bf16 TFLOPs do not
    # apply: the pair phase is elementwise/reduction work)
    VPU_PEAK = 3.9e12
    HBM_PEAK = 8.1e11
    # round-3 finding (docs/SCALING.md): the kernel is VPU ISSUE-bound —
    # the sustainable rate for this op mix (selects, compares, non-FMA
    # mul/add) is ~1-1.3 ops/lane/cycle, not the 4-flops/lane/cycle
    # glossy peak. Report both normalizations.
    ISSUE_PEAK = 1024 * 0.94e9   # 1 vector op/lane/cycle, (8,128) VPU
    print(f"dp={dp}: n_fluid={n_fluid} plan R={R} L={L} groups={n_groups} "
          f"K={spec.K} cand_slots={cand_slots} geom_cache={cached}")
    visits = int(np.sum(kmax)) * slab   # candidate-slot visits per sweep
    print(f"  true directed pairs={n_pairs} slot-visit overcompute="
          f"{visits / n_pairs:.1f}x")
    print(f"  analytic flops/step={flops:.3e}  measured {dt_step*1e3:.3f} "
          f"ms/step -> {flop_s:.3e} FLOP/s = {100*flop_s/VPU_PEAK:.1f}% "
          f"of 4-ops/lane VPU peak = {flop_s/ISSUE_PEAK:.2f} "
          f"ops/lane/cycle vs ~1.3 sustained issue bound")
    print(f"  HBM bytes/step~{hbm_per_step:.3e} -> {hbm_s:.3e} B/s = "
          f"{100*hbm_s/HBM_PEAK:.2f}% of HBM peak (VMEM-resident chunks)")
    print(f"  psteps/s={n_fluid/dt_step:.3e}")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 0.025)
