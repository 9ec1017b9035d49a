"""Locate the mesh-1 sharded overhead (MESH1_TPU_r05.json: ~25-29% over
the unsharded engine at the bench config, ghost=0 AND ghost=4 alike —
so the extended slab is not the cost; something common to the
shard_map-wrapped loop is).

Captures a jax.profiler device trace of ONE warmed interval for (a) the
unsharded PallasCellEngine and (b) ShardedPallasEngine on a 1-device
mesh (ghost=0), then sums device op time by op name from the xplane
protos, printing the top ops side by side. The difference names the
overhead.

Usage: python experiments/profile_mesh1.py [--dp 0.025]
"""

import argparse
import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "experiments")


def trace_one(tag, engine, state, cands, geom, interval, outdir):
    import jax
    res = engine.run_interval(state, cands, geom, np.float32(interval))
    jax.block_until_ready(res.state.x)     # warm/compile
    with jax.profiler.trace(outdir):
        res = engine.run_interval(state, cands, geom, np.float32(interval))
        jax.block_until_ready(res.state.x)
    return res


def xplane_op_times(outdir):
    """Sum device-plane event durations by event name via
    jax.profiler.ProfileData (no external proto deps)."""
    from jax.profiler import ProfileData
    paths = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    agg = {}
    for p in paths:
        xs = ProfileData.from_file(p)
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            for line in plane.lines:
                for ev in line.events:
                    agg[ev.name] = (agg.get(ev.name, 0.0)
                                    + ev.duration_ns / 1e6)
    return agg    # name -> total ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=float, default=0.025)
    ap.add_argument("--interval", type=float, default=0.5)
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    assert jax.default_backend() == "tpu"

    from mesh1_tpu import build   # same bench config
    from sph_poiseuille_flow_tpu import initial_state
    from sph_poiseuille_flow_tpu.parallel import (ShardedPallasEngine,
                                                  make_mesh)
    from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

    cfg, scene = build(args.dp, args.interval)
    state0 = initial_state(cfg, scene)

    reports = {}
    for tag, make in (
            ("single", lambda: PallasCellEngine(cfg, scene)),
            ("mesh1_g0", lambda: ShardedPallasEngine(
                cfg, scene, make_mesh(1), ghost=0))):
        eng = make()
        state, cands, geom, ovf = eng.init(state0)
        assert not bool(ovf)
        for _ in range(args.warm):
            res = eng.run_interval(state, cands, geom,
                                   np.float32(args.interval))
            jax.block_until_ready(res.state.x)
            state, cands, geom = res.state, res.cands, res.geom
        outdir = f"/tmp/mesh1_trace_{tag}"
        t0 = time.perf_counter()
        trace_one(tag, eng, state, cands, geom, args.interval, outdir)
        wall = time.perf_counter() - t0
        ops = xplane_op_times(outdir)
        reports[tag] = (wall, ops)
        print(f"# {tag}: wall {wall:.3f}s, {len(ops)} distinct ops, "
              f"device total {sum(ops.values()):.1f} ms", file=sys.stderr)

    for tag, (wall, ops) in reports.items():
        print(f"\n== {tag} (interval wall {wall:.3f}s) ==")
        for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[
                :args.top]:
            print(f"  {ms:9.2f} ms  {name[:110]}")

    if len(reports) == 2:
        (w0, a), (w1, b) = reports["single"], reports["mesh1_g0"]
        keys = set(a) | set(b)
        diff = sorted(((b.get(k, 0.0) - a.get(k, 0.0), k) for k in keys),
                      key=lambda kv: -abs(kv[0]))
        print("\n== top |mesh1 - single| op-time deltas ==")
        for d, k in diff[:args.top]:
            print(f"  {d:+9.2f} ms  {k[:110]}")
        print(json.dumps({
            "wall_single_s": round(w0, 3),
            "wall_mesh1_g0_s": round(w1, 3),
            "device_ms_single": round(sum(a.values()), 1),
            "device_ms_mesh1_g0": round(sum(b.values()), 1)}))


if __name__ == "__main__":
    sys.exit(main())
