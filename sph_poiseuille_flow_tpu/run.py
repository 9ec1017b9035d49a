"""CLI driver (maps the reference's top-level script entry,
``matlab -batch "run('SPH_Poiseuille.m')"``, README.md:99-101).

Usage:
    python -m sph_poiseuille_flow_tpu.run [--config config.ini] [options]

Path overrides honor the same environment variables as the reference
(SPH_Poiseuille.m:19-26): SPH_CONFIG_OVERRIDE, SPH_RESTART_PATH_OVERRIDE,
SPH_RESULT_PNG_OVERRIDE, SPH_PROFILE_PNG_OVERRIDE,
SPH_POSTPROCESS_MAT_OVERRIDE.
"""

from __future__ import annotations

import argparse
import os
import sys

from .config import ConfigError, env_override, load_config
from .simulation import Simulation, SimulationPaths


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="sph_poiseuille_flow_tpu",
        description="TPU-native 2D weakly-compressible SPH Poiseuille solver")
    parser.add_argument("--config", default=None,
                        help="path to config.ini (default ./config.ini, "
                             "overridable via SPH_CONFIG_OVERRIDE)")
    parser.add_argument("--base-dir", default=".",
                        help="base directory for outputs")
    parser.add_argument("--engine", default="auto",
                        choices=["auto", "cellgrid", "pallas", "gather"],
                        help="hot-path implementation (auto: pallas on TPU, "
                             "cellgrid elsewhere; cellgrid: gather-free "
                             "padded cell layout; pallas: cellgrid with "
                             "fused Pallas pair kernels; gather: "
                             "packed-gather dense candidates)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "float64"],
                        help="device state dtype")
    parser.add_argument("--cell-capacity", type=int, default=16,
                        help="neighbor-grid per-cell capacity")
    parser.add_argument("--neighbor-skin", type=float, default=0.0,
                        help="extra candidate radius enabling candidate "
                             "reuse across steps")
    parser.add_argument("--rebuild-every", type=int, default=1,
                        help="candidate-list rebuild cadence in steps "
                             "(requires a neighbor skin covering the "
                             "displacement between rebuilds)")
    parser.add_argument("--lane-pack-nx", type=int, default=0,
                        help="fused-engine grid column count (0 = cost-"
                             "model pick; integer cell_x/dp ratios drop a "
                             "full lattice column of pristine occupancy, "
                             "admitting a smaller --cell-capacity)")
    parser.add_argument("--geom-cache", default="auto",
                        choices=["auto", "full", "ring", "partial", "none"],
                        help="fused-engine geometry-cache layout (auto = "
                             "VMEM cost model picks; SPH_GEOM_CACHE env "
                             "still overrides for probing)")
    parser.add_argument("--geom-kcut", type=int, default=0,
                        help="cached anchor ranks for --geom-cache partial "
                             "(0 = auto-fit to the scoped VMEM budget)")
    parser.add_argument("--sub-steps", type=int, default=16,
                        help="steps per fused chunk kernel call (amortizes "
                             "the fixed call cost; capped by "
                             "--rebuild-every)")
    parser.add_argument("--fused-rows", default="auto",
                        choices=["auto", "0", "1"],
                        help="fused k-loop order: 1 = candidate-row-outer, "
                             "0 = anchor-rank-outer, auto = measured "
                             "default")
    parser.add_argument("--plan-r", type=int, default=0,
                        help="fused row-group width R (0 = auto: R=1 when "
                             "one cell row fills the vector lanes, "
                             "nx >= 100; else the padded-lane cost model. "
                             "SPH_PLAN_R still overrides for probing)")
    parser.add_argument("--celly-margin", type=float, default=0.06,
                        help="lane-pack cell_y lattice-aliasing margin in "
                             "dp units (the occupancy bound's compression "
                             "tolerance)")
    parser.add_argument("--max-steps-per-dispatch", type=int, default=0,
                        help="split each output interval into device "
                             "calls of at most N steps (0 = one call per "
                             "interval). Trajectory-preserving: bit-"
                             "identical to the unsplit run — use when one "
                             "interval would exceed the device dispatch "
                             "deadline (tunneled TPUs kill calls past "
                             "~60 s)")
    parser.add_argument("--step-log-every", type=int, default=0,
                        help="emit the reference's per-step log line every "
                             "N steps from inside the device loop "
                             "(0 = off; costs host syncs)")
    parser.add_argument("--wall-visc-factor", type=float, default=4.0,
                        help="one-sided wall viscous factor (4.0 = the "
                             "reference's hard-coded calibration; ~4.3 "
                             "cancels the bulk wall-slip bias)")
    parser.add_argument("--calibrated", action="store_true",
                        help="shorthand for --wall-visc-factor 4.35, the "
                             "measured optimum of the one-sided wall "
                             "factor (docs/VALIDATION.md): cancels the "
                             "near-wall slip bias the reference's "
                             "hard-coded 4.0 leaves (L2 0.61%% at "
                             "dp=0.025, 0.50%% at dp=0.01 over the 20 s "
                             "validation); default remains "
                             "reference-exact")
    parser.add_argument("--postprocess-only", metavar="NPZ", default=None,
                        help="run only the postprocess stage on an existing "
                             "handoff file")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="capture a JAX/XLA profiler trace of the run "
                             "into DIR (view with TensorBoard/xprof)")
    parser.add_argument("--set", metavar="SECTION.KEY=VALUE", default=[],
                        action="append", dest="overrides",
                        help="override a config.ini value, e.g. "
                             "--set physical.dp=0.025 "
                             "--set simulation.end_time=1.5 (repeatable)")
    parser.add_argument("--sweep-mus", metavar="MU1,MU2,...", default=None,
                        help="run a vmapped multi-workload sweep over these "
                             "viscosities (g derived per workload to keep "
                             "U_bulk fixed) instead of a single run")
    parser.add_argument("--sweep-lane-chunk", type=int, default=None,
                        help="max sweep lanes resident in HBM at once; "
                             "chunks run sequentially (memory/time "
                             "trade-off for large-dp sweeps on one chip)")
    parser.add_argument("--mesh", type=int, default=None, metavar="N",
                        help="run the whole pipeline over an N-device mesh "
                             "(y-slab shard_map of the resolved engine; "
                             "when fewer than N real chips are present, an "
                             "N-device virtual CPU mesh is provisioned "
                             "unless SPH_DRYRUN_REAL_DEVICES is set)")
    args = parser.parse_args(argv)

    if args.mesh is not None and args.mesh > 1:
        # must run before any jax backend initializes
        from .parallel.virtual import ensure_devices
        ensure_devices(args.mesh)
    elif os.environ.get("JAX_PLATFORMS"):
        # Honor an explicit JAX_PLATFORMS even under interpreters whose
        # sitecustomize eagerly pins a TPU plugin platform (which makes
        # jax ignore the env var): re-pin via jax.config before any
        # backend initializes, exactly like tests/conftest.py. Without
        # this, `JAX_PLATFORMS=cpu python -m sph_poiseuille_flow_tpu.run`
        # still dials the TPU tunnel (and hangs if it is down).
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if args.postprocess_only:
        from .utils.postprocess import postprocess_file
        result = postprocess_file(args.postprocess_only)
        return 0 if result["passed"] else 1

    config_path = args.config or env_override(
        "SPH_CONFIG_OVERRIDE", os.path.join(args.base_dir, "config.ini"))
    ini_overrides = {}
    for item in args.overrides:
        try:
            key, value = item.split("=", 1)
            section, name = key.split(".", 1)
        except ValueError:
            parser.error(f"--set expects SECTION.KEY=VALUE, got {item!r}")
        ini_overrides.setdefault(section, {})[name] = float(value)
    wall_visc_factor = 4.35 if args.calibrated else args.wall_visc_factor
    try:
        cfg = load_config(
            config_path, engine=args.engine, dtype=args.dtype,
            cell_capacity=args.cell_capacity, lane_pack_nx=args.lane_pack_nx,
            neighbor_skin=args.neighbor_skin, rebuild_every=args.rebuild_every,
            wall_visc_factor=wall_visc_factor,
            step_log_every=args.step_log_every,
            geom_cache=args.geom_cache, geom_kcut=args.geom_kcut,
            sub_steps=args.sub_steps, fused_rows=args.fused_rows,
            plan_r=args.plan_r,
            celly_margin=args.celly_margin,
            max_steps_per_dispatch=args.max_steps_per_dispatch,
            ini_overrides=ini_overrides)
    except ConfigError as e:
        parser.error(str(e))
    if args.sweep_mus:
        from .parallel import make_workloads, run_sweep
        mus = [float(v) for v in args.sweep_mus.split(",") if v.strip()]
        gs, mus = make_workloads(cfg, mus)
        sweep_paths = SimulationPaths.from_env(args.base_dir)
        out = run_sweep(cfg, gs, mus, lane_chunk=args.sweep_lane_chunk,
                        paths=sweep_paths)
        for k, (mu_k, l2_k) in enumerate(zip(mus, out["l2_errors"])):
            print(f"workload {k}: mu={mu_k:g} L2={100 * l2_k:.3f}%"
                  f" {'PASS' if l2_k < 0.05 else 'FAIL'}")
        print(f"throughput: {out['particle_steps_per_sec']:.3e} "
              f"particle-steps/sec (sum over lanes)")
        return 0 if bool((out["l2_errors"] < 0.05).all()) else 1

    paths = SimulationPaths.from_env(args.base_dir)
    if args.profile:
        import contextlib
        import jax
        profile_cm = jax.profiler.trace(args.profile)
    else:
        import contextlib
        profile_cm = contextlib.nullcontext()
    with profile_cm:
        result = Simulation(cfg, paths, mesh_devices=args.mesh).run()
    print(f"throughput: {result['particle_steps_per_sec']:.3e} "
          f"particle-steps/sec over {result['step']} steps")
    return 0 if result["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
