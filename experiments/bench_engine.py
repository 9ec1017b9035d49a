"""Quick engine throughput probe (any engine, any dp) on the default
JAX device. Short windows — for A/B kernel work only; gate real numbers
on the full 20 s validation run (short benches lie about capacity limits,
see bench.py).

Usage: python experiments/bench_engine.py [engine] [dp] [n_intervals]
Prints one line: engine, dp, steps, seconds, psteps/s, ms/step.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main(engine_name: str = "cellgrid", dp: float = 0.025,
         n_timed: int = 2, interval: float = 0.5) -> float:
    from sph_poiseuille_flow_tpu import (build_scene, derive_config,
                                         initial_state, make_engine)
    cfg = derive_config(
        DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667, c_f=15.0,
        end_time=20.0, output_interval=interval, sort_interval=100,
        restart_from_file=False, engine=engine_name,
        neighbor_skin=0.75 * dp, rebuild_every=8,
        cell_capacity=18, neighbor_capacity=56)
    scene = build_scene(cfg)
    engine = make_engine(cfg, scene)
    state = initial_state(cfg, scene)
    t0 = time.perf_counter()
    state, cands, geom, overflow = engine.init(state)
    assert not bool(overflow), "cell overflow at init"
    import jax
    res = engine.run_interval(state, cands, geom, np.float32(interval))
    jax.block_until_ready(res.state.x)
    print(f"# compile+warm: {time.perf_counter() - t0:.1f}s", flush=True)
    state, cands, geom = res.state, res.cands, res.geom
    steps = 0
    t0 = time.perf_counter()
    for _ in range(n_timed):
        res = engine.run_interval(state, cands, geom, np.float32(interval))
        jax.block_until_ready(res.state.x)
        state, cands, geom = res.state, res.cands, res.geom
        steps += int(res.n_steps)
    el = time.perf_counter() - t0
    assert not bool(res.overflow), "cell overflow"
    assert not bool(res.skin_guard), "skin guard tripped"
    psps = steps * scene.n_fluid / el
    print(f"{engine_name} dp={dp:g}: {steps} steps in {el:.3f}s -> "
          f"{psps:.3e} psps ({1e3 * el / steps:.3f} ms/step)")
    return psps


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "cellgrid",
         float(a[1]) if len(a) > 1 else 0.025,
         int(a[2]) if len(a) > 2 else 2)
