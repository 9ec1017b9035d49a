"""Sweep (neighbor_skin, rebuild_every) for the fused engine on TPU.

The chunk kernel's step bound n_sub is a runtime SMEM value and the
pair-relative displacement guard soft-stops chunks when drift eats the
skin budget, so long rebuild_every values are safe: the engine runs
variable-length chunks capped at rebuild_every. This probes where the
rebuild-amortization sweet spot is. Short windows — confirm winners on
the full 20 s run.

Usage: python experiments/sweep_chunklen.py [dp]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def probe(dp, skin_mul, rebuild_every, K=18, n_timed=2, interval=0.5,
          nx_force=None, n_warm=1):
    import os
    if nx_force is not None:
        os.environ["SPH_LANEPACK_NX"] = str(nx_force)
    else:
        os.environ.pop("SPH_LANEPACK_NX", None)
    import jax
    from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                         initial_state, make_engine)
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667,
        c_f=15.0, end_time=20.0, output_interval=interval,
        sort_interval=100, restart_from_file=False, engine="pallas",
        neighbor_skin=skin_mul * dp, rebuild_every=rebuild_every,
        cell_capacity=K, neighbor_capacity=56)
    scene = build_scene(cfg)
    engine = make_engine(cfg, scene)
    state = initial_state(cfg, scene)
    state, cands, geom, overflow = engine.init(state)
    assert not bool(overflow)
    for _ in range(n_warm):
        res = engine.run_interval(state, cands, geom, np.float32(interval))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom
    steps = 0
    t0 = time.perf_counter()
    for _ in range(n_timed):
        res = engine.run_interval(state, cands, geom, np.float32(interval))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom
        steps += int(res.n_steps)
    el = time.perf_counter() - t0
    guard = bool(res.skin_guard)
    ovf = bool(res.overflow)
    psps = steps * scene.n_fluid / el
    print(f"skin={skin_mul:.2f}dp rb={rebuild_every:3d} K={K}: "
          f"{psps:.3e} psps ({1e3 * el / steps:.4f} ms/step)"
          f" nx={engine.spec.nx}"
          f"{'  GUARD-TRIPPED' if guard else ''}"
          f"{'  OVERFLOW' if ovf else ''}", flush=True)
    return psps


if __name__ == "__main__":
    dp = float(sys.argv[1]) if len(sys.argv) > 1 else 0.025
    import os
    n_warm = int(os.environ.get("SPH_SWEEP_WARM", "1"))
    for skin_mul, K, nx in ((0.3, 15, 32),):
        for rb in (64, 128):
            probe(dp, skin_mul, rb, K, nx_force=nx, n_warm=n_warm)
