"""dp=0.005 ring-cache shape probe (round 5): can the FULL-K depth-4
wavefront ring cache fit VMEM at a smaller lane width L?

At dp=0.005 (nx=200) the cost-model row-group pick is R=5 -> L=1000
(padded 1024), where the full-K ring needs ~147 MB — the measured OOM
(docs/SCALING.md). The cache footprint is LINEAR in the padded L, so
forcing R=3 (L=600 -> 640, +4% lane work) shrinks the ring to ~92 MB and
R=2 (L=400 -> 512, +23% lane work) to ~73 MB. This probe measures both
against the shipping partial-ring auto pick (k_cut=6, 4.04e7 psteps/s)
at the bench protocol. One configuration per process (the plan/cache
knobs are read at trace time).

Round-5 finding: the lever generalizes — R=1 at dp=0.005 runs 6.2e7
psteps/s (+54% over the shipping partial), driven not by the cache but
by PER-ROW occupancy bounds: occl is a max over the R rows of a group,
so small R lets the k-loop skip empty anchor ranks per row instead of
paying the worst row of the group. The probe therefore takes dp too.

Usage: python experiments/probe_ring_l.py [R cache_mode [dp]]
  no args: print the orchestration plan
  R=0 means the cost-model pick.
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

DP = 0.005
INTERVAL = 0.25          # ~4,700 steps, ~14 s/dispatch at 4e7 psteps/s
N_WARM = 4               # past the startup transient at this cadence
N_TIMED = 3


def run(R: int, cache: str) -> dict:
    if R > 0:
        os.environ["SPH_PLAN_R"] = str(R)
    os.environ["SPH_GEOM_CACHE"] = cache
    import numpy as np

    import jax
    from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                         initial_state, make_engine)
    from sph_poiseuille_flow_tpu.ops import fused_cell as fc

    nx3 = round(3.0 / (3.0 * DP))
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=DP, rho0=1.0, mu=0.1, U_bulk=0.666667,
        c_f=15.0, end_time=20.0, output_interval=INTERVAL,
        sort_interval=100, restart_from_file=False, engine="pallas",
        neighbor_skin=0.3 * DP, rebuild_every=128,
        cell_capacity=14, lane_pack_nx=nx3, neighbor_capacity=56)
    scene = build_scene(cfg)
    engine = make_engine(cfg, scene)
    spec = engine.spec
    Rp, L, n_groups, nyp = fc.plan(spec)
    cm, kc = fc.cache_plan(spec, "float32")
    n_slots = fc._RING_DEPTH if cm in ("ring", "partial") else n_groups
    cache_mb = (fc._cache_bytes(spec, "float32", n_slots,
                                kc if cm == "partial" else None)
                / 2**20 if cm != "none" else 0.0)
    info = dict(R=Rp, L=L, padded_L=-(-L // 128) * 128,
                n_groups=n_groups, cache_mode=cm, k_cut=kc,
                cache_mb=round(cache_mb, 1))
    print(f"# plan: {info}", file=sys.stderr)

    state = initial_state(cfg, scene)
    state, cands, geom, overflow = engine.init(state)
    assert not bool(overflow)
    t0 = time.perf_counter()
    for _ in range(N_WARM):
        res = engine.run_interval(state, cands, geom, np.float32(INTERVAL))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom
    info["compile_plus_warm_s"] = round(time.perf_counter() - t0, 1)
    per = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        res = engine.run_interval(state, cands, geom, np.float32(INTERVAL))
        jax.block_until_ready(res.state.x)
        el = time.perf_counter() - t0
        state, cands, geom = res.state, res.cands, res.geom
        assert not bool(res.overflow) and not bool(res.skin_guard)
        per.append(int(res.n_steps) * scene.n_fluid / el)
    info["psps"] = [round(p, -3) for p in per]
    info["best_psps"] = round(max(per), 1)
    info["dp"] = DP
    return info


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        if len(sys.argv) >= 4:
            DP = float(sys.argv[3])
            if DP >= 0.02:       # keep timed windows >= ~2000 steps
                INTERVAL = 1.0
        out = run(int(sys.argv[1]), sys.argv[2])
        print(json.dumps(out))
    else:
        print("run me per-config:  python experiments/probe_ring_l.py "
              "0 auto | 3 ring | 2 ring | 1 ring 0.01")
