"""Unit tests for the XLA-side candidate-validity guard of the fused
engine (ops/fused_cell.pair_drift_bounds / pair_drift_exceeded): the
frozen 3x3 stencil stays valid while the PAIR-RELATIVE displacement since
rebuild is under (skin_x, skin_y) per axis. Pure jnp — runs on CPU."""

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.ops import fused_cell as fc
from sph_poiseuille_flow_tpu.stepper import PallasCellEngine, initial_state

from test_config import default_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, neighbor_skin=0.02,
                      cell_capacity=18)
    scene = build_scene(cfg)
    eng = PallasCellEngine(cfg, scene)
    state = initial_state(cfg, scene)
    lay = eng._rebuild(state.x, state.y)
    return cfg, scene, eng.spec, lay, state


def _cores(spec, lay, x, y):
    xP = fc.make_plain(spec, lay.pidx, x, fill=fc._BIG_X)
    yP = fc.make_plain(spec, lay.pidx, y)
    return xP, yP


def test_no_motion_zero_bounds(setup):
    cfg, scene, spec, lay, state = setup
    bx, by = fc.pair_drift_bounds(spec, lay, lay.refx_p, lay.refy_p)
    assert float(bx) == 0.0 and float(by) == 0.0
    assert not bool(fc.pair_drift_exceeded(spec, lay,
                                           lay.refx_p, lay.refy_p))


def test_uniform_translation_anchored_by_walls(setup):
    """All fluid advected by +d in x: fluid-fluid pairs cancel, but
    fluid-WALL pairs see the full relative displacement d (walls anchor
    the window range at 0), so the bound equals d, not 0."""
    cfg, scene, spec, lay, state = setup
    d = 0.4 * cfg.dp
    x = np.asarray(state.x).copy()
    x[:scene.n_fluid] += d  # unwrapped between rebuilds, like the engine
    bx, by = fc.pair_drift_bounds(spec, lay,
                                  *_cores(spec, lay, x, state.y))
    assert abs(float(bx) - d) < 1e-6
    assert float(by) == 0.0


def test_single_particle_drift_bounds_pairwise(setup):
    """One fluid particle moved by (dx, dy): the bound must cover the
    pair-relative displacement (= the full move, since its neighbors
    stayed put) in each axis."""
    cfg, scene, spec, lay, state = setup
    dx, dy = 0.3 * cfg.dp, -0.25 * cfg.dp
    i = scene.n_fluid // 2
    x = np.asarray(state.x).copy()
    y = np.asarray(state.y).copy()
    x[i] += dx
    y[i] += dy
    bx, by = fc.pair_drift_bounds(spec, lay, *_cores(spec, lay, x, y))
    assert abs(float(bx) - dx) < 1e-6
    assert abs(float(by) - abs(dy)) < 1e-6


def test_exceeded_flag_thresholds(setup):
    cfg, scene, spec, lay, state = setup
    i = scene.n_fluid // 3

    def flag(dy):
        y = np.asarray(state.y).copy()
        y[i] += dy
        return bool(fc.pair_drift_exceeded(
            spec, lay, *_cores(spec, lay, np.asarray(state.x), y)))

    assert not flag(0.9 * spec.skin_y)
    assert flag(1.1 * spec.skin_y)


@pytest.mark.heavy
def test_trip_rolls_back_and_recovers(monkeypatch):
    """A genuine drift-budget crossing must DISCARD the offending
    sub-chunk and re-run it on fresh candidates instead of failing the
    run (stepper.PallasCellEngine sub_body rollback). With the
    predictive scheduler disabled (SPH_DRIFT_PREDICTOR=0) every
    sub-chunk group runs until a genuine crossing, so an interval
    needing several rebuilds exercises the rollback repeatedly. The
    recovered run must report rollbacks, must NOT hard-flag, and must
    land where a predictor-scheduled run of the same interval lands
    (candidate membership covers all true pairs in both, so only f32
    reduction-order noise from different rebuild points separates
    them)."""
    import jax.numpy as jnp

    # tiny skin makes cand_cutoff ~ cutoff, so the lane-pack pick lands
    # nx=7 and the x drift budget is a bare cell_x - cutoff = 0.26dp —
    # the seeded velocity jitter crosses it within a few 4-step
    # sub-chunks before viscosity damps it (measured: 3 rollbacks)
    cfg = default_cfg(DL=1.0, DH=0.55, dp=0.05, neighbor_skin=0.001,
                      cell_capacity=18, rebuild_every=64)
    scene = build_scene(cfg)
    state0 = initial_state(cfg, scene)
    rng = np.random.default_rng(3)
    nf = scene.n_fluid
    vx = np.zeros(scene.n_total, np.float32)
    vy = np.zeros(scene.n_total, np.float32)
    vx[:nf] = rng.normal(0, 0.8, nf)
    vy[:nf] = rng.normal(0, 0.4, nf)
    state0 = state0._replace(vx=jnp.asarray(vx), vy=jnp.asarray(vy))

    monkeypatch.setenv("SPH_SUB_STEPS", "4")

    def run(predictor: str):
        monkeypatch.setenv("SPH_DRIFT_PREDICTOR", predictor)
        eng = PallasCellEngine(cfg, scene)
        s, lay, geom, ov = eng.init(state0)
        assert not bool(ov)
        return eng.run_interval(s, lay, geom, np.float32(0.08))

    r_trip = run("0")
    r_sched = run("1")
    assert int(r_trip.n_rollbacks) > 0, \
        "predictor off + interval spanning several budgets must trip"
    assert not bool(r_trip.skin_guard), \
        "recoverable trips must not hard-flag the run"
    assert int(r_sched.n_rollbacks) == 0
    assert int(r_trip.n_steps) == int(r_sched.n_steps)
    for name in ("x", "y", "vx", "vy", "rho"):
        np.testing.assert_allclose(
            np.asarray(getattr(r_trip.state, name)),
            np.asarray(getattr(r_sched.state, name)),
            rtol=2e-3, atol=5e-4, err_msg=name)


def test_empty_slots_do_not_anchor():
    """Empty slots ride at _BIG_X in the ref core and must be EXCLUDED
    from the window range, not anchored at 0: uniform advection of an
    all-fluid domain (partially-filled cells included) must cancel
    pairwise and report ~0 drift. An anchored empty slot would break the
    cancellation and report the full advection distance. Walls would
    also anchor (legitimately), so this uses a wall-free layout."""
    import types

    from sph_poiseuille_flow_tpu.ops import neighbors as nbr

    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, neighbor_skin=0.02,
                      cell_capacity=18)
    scene = build_scene(cfg)
    state = initial_state(cfg, scene)
    nf = scene.n_fluid
    fake = types.SimpleNamespace(n_fluid=nf, n_total=nf)
    spec = nbr.make_grid_spec(cfg, fake, lane_pack=True)
    x = np.asarray(state.x)[:nf]
    y = np.asarray(state.y)[:nf]
    zeros = np.zeros(nf, np.float32)
    mass = np.full(nf, cfg.rho0 * cfg.dp * cfg.dp, np.float32)
    lay = fc.build_fused_layout(spec, x, y, mass, zeros, zeros, y)
    d = 0.45 * cfg.dp
    bx, by = fc.pair_drift_bounds(
        spec, lay, *_cores(spec, lay, x + d, y))
    assert float(bx) <= 1e-6, "anchored empty slot broke cancellation"
    assert float(by) == 0.0
