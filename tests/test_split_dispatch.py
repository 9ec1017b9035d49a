"""Trajectory-preserving step-bounded dispatch (round 5): splitting one
output interval across device calls via ``max_steps`` + the carried
Kahan clock must reproduce the single-call trajectory BIT-FOR-BIT — the
dt remainder clamp (the reference's SPH_Poiseuille.m:250,259,267
semantics) fires only at the true output point, so unlike shrinking
``output_interval`` (which lands a clamped dt on every sub-target) the
split changes nothing. This is the scale lever for intervals whose
single dispatch would exceed the tunneled TPU's ~60 s deadline."""

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.stepper import (CellEngine, Engine,
                                             PallasCellEngine, State,
                                             initial_state)

pytestmark = pytest.mark.heavy  # full-interval equivalence runs

from test_config import default_cfg


def _chunking_cfg(**kw):
    # legacy validated reuse knobs (skin 0.75dp, rebuild_every 8) so the
    # fused engine runs REAL multi-step sub-chunk groups. cell_capacity
    # 32: the tiny DL=1 domain lane-packs to 5-6dp-wide cells whose
    # developed-flow occupancy overflows the default 16 (both split and
    # unsplit runs equally — an artifact of the small test box, not of
    # the dispatch mode under test)
    base = dict(DL=1.0, DH=0.5, dp=0.05, end_time=0.5,
                output_interval=0.25, neighbor_skin=0.75 * 0.05,
                rebuild_every=8, cell_capacity=32)
    base.update(kw)
    return default_cfg(**base)


def _run_split(eng, state, cands, geom, interval, max_steps,
               rebuild_every=8):
    exact = not isinstance(eng, PallasCellEngine)
    t_loc = np.float32(0.0)
    t_cmp = np.float32(0.0)
    sub_len = None
    total = 0
    calls = 0
    while True:
        kw = {} if sub_len is None else {"sub_len0": sub_len}
        r = eng.run_interval(state, cands, geom, np.float32(interval),
                             max_steps=np.int32(max_steps),
                             t_local0=t_loc, t_comp0=t_cmp,
                             steps_done0=np.int32(total), **kw)
        k = int(r.n_steps)
        # per-step engines bound exactly; the fused engine binds at
        # sub-chunk group boundaries (overshoot < rebuild_every)
        assert k <= max_steps + (0 if exact else rebuild_every - 1)
        total += k
        calls += 1
        state, cands, geom = r.state, r.cands, r.geom
        t_loc, t_cmp = r.t_local, r.t_comp
        if r.sub_len is not None:
            sub_len = r.sub_len
        if float(t_loc) >= interval or k == 0:
            break
    return r, total, calls


@pytest.mark.parametrize("engine_cls", [Engine, CellEngine,
                                        PallasCellEngine])
def test_split_vs_unsplit_bit_equal(engine_cls):
    cfg = _chunking_cfg()
    scene = build_scene(cfg)
    eng = engine_cls(cfg, scene)
    st0 = initial_state(cfg, scene)

    s1, c1, g1, _ = eng.init(st0)
    once = eng.run_interval(s1, c1, g1, np.float32(cfg.output_interval))

    s2, c2, g2, _ = eng.init(st0)
    split, total, calls = _run_split(eng, s2, c2, g2,
                                     cfg.output_interval, max_steps=7)
    assert calls >= 3, "max_steps never bound — the test lost its teeth"
    assert total == int(once.n_steps)
    for name in State._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(split.state, name)),
            np.asarray(getattr(once.state, name)), err_msg=name)
    assert float(split.tau_bottom) == float(once.tau_bottom)
    assert float(split.tau_top) == float(once.tau_top)
    # the clamped remainder landed the clock on the output point
    assert float(split.t_local) >= cfg.output_interval


def test_split_resumes_across_intervals():
    """Two consecutive intervals, each split — matches two unsplit
    intervals (the clock resets per interval, state carries)."""
    cfg = _chunking_cfg()
    scene = build_scene(cfg)
    eng = PallasCellEngine(cfg, scene)
    st0 = initial_state(cfg, scene)

    s1, c1, g1, _ = eng.init(st0)
    s2, c2, g2, _ = eng.init(st0)
    for _ in range(2):
        once = eng.run_interval(s1, c1, g1, np.float32(0.2))
        s1, c1, g1 = once.state, once.cands, once.geom
        split, total, _ = _run_split(eng, s2, c2, g2, 0.2, max_steps=11)
        s2, c2, g2 = split.state, split.cands, split.geom
        assert total == int(once.n_steps)
        for name in State._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(split.state, name)),
                np.asarray(getattr(once.state, name)), err_msg=name)


def test_simulation_dispatch_split_matches(tmp_path):
    """The driver-level knob (cfg.max_steps_per_dispatch) produces the
    same end-to-end result as the default single-dispatch run."""
    from sph_poiseuille_flow_tpu.simulation import (Simulation,
                                                    SimulationPaths)

    results = {}
    for msd in (0, 9):
        d = tmp_path / f"msd{msd}"
        (d / "results").mkdir(parents=True)
        cfg = _chunking_cfg(end_time=0.4, output_interval=0.2,
                            engine="pallas", max_steps_per_dispatch=msd)
        paths = SimulationPaths(
            restart=str(d / "restart.npz"),
            result_png=str(d / "results" / "r.png"),
            profile_evolution_png=str(d / "results" / "p.png"),
            postprocess_npz=str(d / "results" / "post.npz"))
        results[msd] = Simulation(cfg, paths,
                                  log=lambda *_: None).run()
    a, b = results[0], results[9]
    assert a["step"] == b["step"]
    assert a["L2_error"] == b["L2_error"]
    np.testing.assert_array_equal(np.asarray(a["final_state"].x),
                                  np.asarray(b["final_state"].x))
    np.testing.assert_array_equal(np.asarray(a["final_state"].vx),
                                  np.asarray(b["final_state"].vx))
    assert a["tau_bottom"] == b["tau_bottom"]
