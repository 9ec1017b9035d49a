"""Hardware validation of the sharded flagship: Mosaic-compile the
slab-local chunked interval loop (parallel/sharding.py::_chunked_interval)
on ONE real TPU chip via a 1-device ``shard_map`` mesh, prove the
trajectory bit-identical to the unsharded engine, and measure the sharded
loop's per-device overhead.

Until round 5 every multi-chip artifact ran on the virtual CPU mesh, where
``fused_cell._interpret()`` puts all Pallas kernels in interpret mode —
the kernel had never been compiled by Mosaic on the extended-slab spec
(``ls``, ghost-extended row count), and interpret mode is known to hide
layout/VMEM errors (the dp=0.005 ring-cache OOM precedent,
docs/SCALING.md). This probe closes that hole.

Usage:  python experiments/mesh1_tpu.py [--dp 0.025] [--intervals 3]
Prints one JSON line with the equivalence verdict and both throughputs.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def build(dp: float, interval: float):
    from sph_poiseuille_flow_tpu import build_scene, derive_config

    # the bench configuration (bench.py) so the overhead number is
    # directly comparable to the recorded metric
    nx3 = round(3.0 / (3.0 * dp))
    lane_nx = nx3 if abs(nx3 * 3.0 * dp - 3.0) < 1e-9 else 0
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667,
        c_f=15.0, end_time=20.0, output_interval=interval,
        sort_interval=100, restart_from_file=False, engine="pallas",
        neighbor_skin=0.3 * dp, rebuild_every=128,
        cell_capacity=14 if lane_nx else 18,
        lane_pack_nx=lane_nx, neighbor_capacity=56)
    scene = build_scene(cfg)
    return cfg, scene


def run_engine(engine, scene, state0, interval, n_intervals, warm):
    import jax
    state, cands, geom, overflow = engine.init(state0)
    assert not bool(overflow)
    # advance past the startup transient (same protocol as bench.py)
    for _ in range(warm):
        res = engine.run_interval(state, cands, geom, np.float32(interval))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom
    traj, times = [], []
    for _ in range(n_intervals):
        t0 = time.perf_counter()
        res = engine.run_interval(state, cands, geom, np.float32(interval))
        jax.block_until_ready(res.state.x)
        times.append(time.perf_counter() - t0)
        state, cands, geom = res.state, res.cands, res.geom
        assert not bool(res.overflow) and not bool(res.skin_guard)
        traj.append((res.state, int(res.n_steps), float(res.tau_bottom),
                     float(res.tau_top), int(res.n_rollbacks)))
    return traj, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp", type=float, default=0.025)
    ap.add_argument("--intervals", type=int, default=3)
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--interval", type=float, default=0.5)
    args = ap.parse_args()

    import jax
    assert jax.default_backend() == "tpu", \
        "this probe validates Mosaic compilation — run it on the TPU host"

    from sph_poiseuille_flow_tpu import initial_state
    from sph_poiseuille_flow_tpu.parallel import (ShardedPallasEngine,
                                                  make_mesh)
    from sph_poiseuille_flow_tpu.stepper import PallasCellEngine

    cfg, scene = build(args.dp, args.interval)
    state0 = initial_state(cfg, scene)

    single = PallasCellEngine(cfg, scene)
    t_ref, times_ref = run_engine(single, scene, state0, args.interval,
                                  args.intervals, args.warm)

    mesh = make_mesh(1)
    steps = sum(n for _, n, _, _, _ in t_ref)
    psps_ref = steps * scene.n_fluid / sum(times_ref)
    out = {
        "dp": args.dp,
        "n_intervals": args.intervals,
        "steps": steps,
        "rollbacks": [r for _, _, _, _, r in t_ref],
        "single_psps": round(psps_ref, 1),
        "times_single": [round(t, 4) for t in times_ref],
    }
    ok = True
    # ghost=4: Mosaic-compile the EXTENDED-slab spec (the multi-chip
    # geometry) on hardware; ghost=0: the shipping --mesh 1 default
    # (1-device slabs have no neighbors — both bands are domain edges)
    for tag, ghost in (("ghost4", 4), ("ghost0", 0)):
        sharded = ShardedPallasEngine(cfg, scene, mesh, ghost=ghost)
        t_sh, times_sh = run_engine(sharded, scene, state0, args.interval,
                                    args.intervals, args.warm)
        bitexact = True
        for i, ((s_a, n_a, tb_a, tt_a, r_a),
                (s_b, n_b, tb_b, tt_b, r_b)) in \
                enumerate(zip(t_ref, t_sh)):
            for f in s_a._fields:
                a = np.asarray(getattr(s_a, f))
                b = np.asarray(getattr(s_b, f))
                if not np.array_equal(a, b):
                    nbad = int((a != b).sum())
                    print(f"# [{tag}] interval {i}: field {f} differs in "
                          f"{nbad} entries, max "
                          f"|d|={np.max(np.abs(a - b)):.3e}",
                          file=sys.stderr)
                    bitexact = False
            if (n_a, tb_a, tt_a, r_a) != (n_b, tb_b, tt_b, r_b):
                print(f"# [{tag}] interval {i}: scalars differ "
                      f"{(n_a, tb_a, tt_a, r_a)} vs "
                      f"{(n_b, tb_b, tt_b, r_b)}", file=sys.stderr)
                bitexact = False
        psps_sh = steps * scene.n_fluid / sum(times_sh)
        out[tag] = {
            "bitexact": bitexact,
            "sharded_mesh1_psps": round(psps_sh, 1),
            "overhead_pct": round(100.0 * (psps_ref / psps_sh - 1.0), 2),
            "times_sharded": [round(t, 4) for t in times_sh],
        }
        ok = ok and bitexact
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
