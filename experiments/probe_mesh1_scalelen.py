"""Is the mesh-1 sharded overhead per-DISPATCH or per-GROUP?

MESH1_TPU_r05.json records ~25-30% wall overhead for the 1-device
sharded chunked loop vs the unsharded engine, while the xplane trace
(experiments/profile_mesh1.py) attributes LESS device-busy time to the
sharded program than to the unsharded one — pointing at host/dispatch
or unattributed device idle, not kernel work.

Decisive split: time BOTH engines at several interval lengths in one
process (interval_len is a traced argument — one executable each). A
per-dispatch overhead shows as a CONSTANT absolute gap per call; a
per-group/per-step overhead scales linearly with the interval length.

Usage: python experiments/probe_mesh1_scalelen.py [--dp 0.025]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "experiments")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=float, default=0.025)
    ap.add_argument("--lens", type=float, nargs="+",
                    default=[0.5, 0.25, 0.125, 0.0625])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    assert jax.default_backend() == "tpu"

    from mesh1_tpu import build
    from sph_poiseuille_flow_tpu import initial_state
    from sph_poiseuille_flow_tpu.parallel import (ShardedPallasEngine,
                                                  make_mesh)
    from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

    cfg, scene = build(args.dp, max(args.lens))
    state0 = initial_state(cfg, scene)

    out = {"probe": "experiments/probe_mesh1_scalelen.py",
           "dp": args.dp, "rows": []}
    engines = {}
    for tag, make in (
            ("single", lambda: PallasCellEngine(cfg, scene)),
            ("mesh1_g0", lambda: ShardedPallasEngine(
                cfg, scene, make_mesh(1), ghost=0))):
        eng = make()
        state, cands, geom, ovf = eng.init(state0)
        assert not bool(ovf)
        # warm to a common flow state (2 x the longest interval), then
        # FREEZE: every timed call below re-runs from this same state so
        # step counts are engine-identical per length
        for _ in range(2):
            res = eng.run_interval(state, cands, geom,
                                   np.float32(max(args.lens)))
            jax.block_until_ready(res.state.x)
            state, cands, geom = res.state, res.cands, res.geom
        engines[tag] = (eng, state, cands, geom)

    for L in args.lens:
        for tag, (eng, state, cands, geom) in engines.items():
            il = np.float32(L)
            res = eng.run_interval(state, cands, geom, il)   # warm len
            jax.block_until_ready(res.state.x)
            times, steps = [], int(res.n_steps)
            for _ in range(args.reps):
                t0 = time.perf_counter()
                res = eng.run_interval(state, cands, geom, il)
                jax.block_until_ready(res.state.x)
                times.append(time.perf_counter() - t0)
            row = {"len": L, "engine": tag, "steps": steps,
                   "t_best": round(min(times), 5),
                   "t_all": [round(t, 5) for t in times]}
            out["rows"].append(row)
            print(row, file=sys.stderr)

    # pair up: gap per call at each length
    by = {}
    for r in out["rows"]:
        by.setdefault(r["len"], {})[r["engine"]] = r
    for L, d in sorted(by.items(), reverse=True):
        if len(d) == 2:
            gap = d["mesh1_g0"]["t_best"] - d["single"]["t_best"]
            print(f"len={L}: steps={d['single']['steps']} "
                  f"single={d['single']['t_best']:.4f}s "
                  f"mesh1={d['mesh1_g0']['t_best']:.4f}s "
                  f"gap={gap*1e3:.1f}ms "
                  f"({100*gap/d['single']['t_best']:.1f}%)",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
