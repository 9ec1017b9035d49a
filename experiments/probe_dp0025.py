"""Single-chip scale-ceiling probe: dp=0.0025 (480,000 fluid, ~4x the
largest validated scale) on one TPU chip (round 5, VERDICT item 3).

One 0.5 s output interval at this scale is a ~260 s device call — far
past the tunnel's ~60 s dispatch deadline — so this is the first real
consumer of the trajectory-preserving step-bounded dispatch
(max_steps + carried Kahan clock, stepper.py): the interval runs as a
sequence of ~2000-step calls that are bit-identical to the single call
(tests/test_split_dispatch.py).

Measures sustained psteps/s over a few split dispatches past the
startup transient and reports the resolved cache plan + grid shape.
A full 20 s validation at this scale is ~12 h of wall-clock on one chip
and is out of the probe's scope; the throughput + clean guard flags are
the scale-ceiling data point (docs/SCALING.md).

The fused (pallas) engine hits its measured VMEM wall at this scale —
the whole-grid carry-resident kernels need a ~110 MB scoped stack at
ny=141 against the 100 MB grant, and Mosaic's requirement chases any
larger grant (124 MB @ 116; same pathology as the dp=0.005 forced-ring
case, docs/SCALING.md) — so the probe also takes an engine name to
record the streaming XLA engine's throughput at the same scale
(`cellgrid` keeps state in HBM and has no whole-grid VMEM residency).

Usage: python experiments/probe_dp0025.py [max_steps_per_call] [engine]
"""

import json
import sys
import time

sys.path.insert(0, ".")

DP = 0.0025
INTERVAL = 0.5


def main(msd: int = 2000, engine: str = "pallas") -> dict:
    import numpy as np

    import jax
    from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                         initial_state, make_engine)
    from sph_poiseuille_flow_tpu.ops import fused_cell as fc

    nx3 = round(3.0 / (3.0 * DP))
    # engine-matched knobs: the fused engine's shipping config
    # (skin 0.3dp / rebuild 128) relies on its pair-RELATIVE drift guard
    # + rollback; the per-step engines guard ABSOLUTE displacement, and
    # the init acoustic transient's transport shifts cross 0.15dp in one
    # step at this resolution — their validated legacy knobs
    # (skin 0.75dp / rebuild 8 / K=18) carry the 2.5x larger budget.
    knobs = (dict(neighbor_skin=0.3 * DP, rebuild_every=128,
                  cell_capacity=14, lane_pack_nx=nx3)
             if engine == "pallas" else
             dict(neighbor_skin=0.75 * DP, rebuild_every=8,
                  cell_capacity=18))
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=DP, rho0=1.0, mu=0.1, U_bulk=0.666667,
        c_f=15.0, end_time=20.0, output_interval=INTERVAL,
        sort_interval=100, restart_from_file=False, engine=engine,
        neighbor_capacity=56, **knobs)
    scene = build_scene(cfg)
    eng_name = engine
    engine = make_engine(cfg, scene)
    spec = engine.spec
    info = dict(dp=DP, engine=eng_name, n_fluid=scene.n_fluid,
                n_total=scene.n_total, nx=spec.nx, ny=spec.ny,
                K=spec.K, max_steps_per_call=msd)
    if eng_name == "pallas":
        R, L, n_groups, nyp = fc.plan(spec)
        cm, kc = fc.cache_plan(spec, "float32")
        info.update(R=R, L=L, n_groups=n_groups, cache_mode=cm, k_cut=kc)
    print(f"# {info}", file=sys.stderr)

    state = initial_state(cfg, scene)
    t0 = time.perf_counter()
    state, cands, geom, overflow = engine.init(state)
    jax.block_until_ready(state.x)
    assert not bool(overflow), "cell overflow at init"
    print(f"# init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def split_calls(state, cands, geom, n_calls, timed):
        t_loc = np.float32(0.0)
        t_cmp = np.float32(0.0)
        sub_len = None
        total = 0
        rates = []
        for i in range(n_calls):
            kw = {} if sub_len is None else {"sub_len0": sub_len}
            t0 = time.perf_counter()
            r = engine.run_interval(
                state, cands, geom, np.float32(INTERVAL),
                max_steps=np.int32(msd), t_local0=t_loc, t_comp0=t_cmp,
                steps_done0=np.int32(total), **kw)
            jax.block_until_ready(r.state.x)
            el = time.perf_counter() - t0
            k = int(r.n_steps)
            total += k
            state, cands, geom = r.state, r.cands, r.geom
            t_loc, t_cmp = r.t_local, r.t_comp
            sub_len = r.sub_len
            assert not bool(r.overflow), "cell overflow"
            assert not bool(r.skin_guard), "skin guard"
            rate = k * scene.n_fluid / el
            if timed:
                rates.append(rate)
            print(f"# call {i}: {k} steps in {el:.1f}s = {rate:.3e} "
                  f"psteps/s (t_local={float(t_loc):.4f})",
                  file=sys.stderr)
            if float(t_loc) >= INTERVAL:
                break
        return state, cands, geom, rates

    # warm: compile + ~3 calls into the transient
    state, cands, geom, _ = split_calls(state, cands, geom, 3, False)
    # timed: 4 calls (~8000 steps) of sustained work
    state, cands, geom, rates = split_calls(state, cands, geom, 4, True)
    info["psps_per_call"] = [round(r, -3) for r in rates]
    info["best_psps"] = round(max(rates), 1)
    info["mean_psps"] = round(float(np.mean(rates)), 1)
    return info


if __name__ == "__main__":
    msd = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    eng = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    print(json.dumps(main(msd, eng)))
