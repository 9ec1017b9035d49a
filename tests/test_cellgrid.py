"""Cell-layout engine equivalence: CellEngine must reproduce the gather
engine (which is itself validated against both oracles) step-for-step to
float32 reordering tolerance, and over a full interval statistically."""

import dataclasses

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.stepper import (CellEngine, Engine,
                                             initial_state, make_engine)
from sph_poiseuille_flow_tpu.utils import postprocess as pp

from test_config import default_cfg


@pytest.fixture(scope="module")
def engines():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=0.5,
                      output_interval=0.25)
    scene = build_scene(cfg)
    ga = Engine(cfg, scene)
    cg = CellEngine(cfg, scene)
    state0 = initial_state(cfg, scene)
    return cfg, scene, ga, cg, state0


def test_make_engine_dispatch():
    cfg = default_cfg(engine="cellgrid")
    scene = build_scene(cfg)
    assert isinstance(make_engine(cfg, scene), CellEngine)
    cfg2 = default_cfg(engine="gather")
    assert isinstance(make_engine(cfg2, scene), Engine)
    with pytest.raises(ValueError):
        make_engine(default_cfg(engine="bogus"), scene)


def test_init_equivalence(engines):
    cfg, scene, ga, cg, state0 = engines
    sa, _, _, ova = ga.init(state0)
    sc, _, _, ovc = cg.init(state0)
    assert not bool(ova) and not bool(ovc)
    # p = p0*(rho/rho0 - 1) amplifies f32 summation-order noise in rho by
    # p0 = 225, hence the looser absolute tolerance there
    tols = {"p": dict(rtol=5e-3, atol=2e-4)}
    for name in ("rho", "p", "vol", "b11", "b12", "b21", "b22"):
        tol = tols.get(name, dict(rtol=5e-5, atol=1e-5))
        np.testing.assert_allclose(
            np.asarray(getattr(sc, name)), np.asarray(getattr(sa, name)),
            err_msg=name, **tol)


def test_single_step_equivalence(engines):
    cfg, scene, ga, cg, state0 = engines
    sa, ca, gma, _ = ga.init(state0)
    sc, cc, gmc, _ = cg.init(state0)

    out_a = ga.step(sa, ca, gma, remain=1.0)
    out_c = cg.step(sc, cc, gmc, remain=1.0)
    st_a, st_c = out_a[0], out_c[0]
    dt_a, dt_c = float(out_a[3]), float(out_c[3])
    assert dt_c == pytest.approx(dt_a, rel=1e-6)
    tols = {"p": dict(rtol=5e-3, atol=5e-4)}
    for name in st_a._fields:
        a = np.asarray(getattr(st_a, name))
        c = np.asarray(getattr(st_c, name))
        tol = tols.get(name, dict(rtol=2e-4, atol=2e-5))
        np.testing.assert_allclose(c, a, err_msg=name, **tol)
    # wall-shear monitor parity (post-rebuild convention)
    assert float(out_c[6]) == pytest.approx(float(out_a[6]), rel=1e-3,
                                            abs=1e-6)
    assert float(out_c[7]) == pytest.approx(float(out_a[7]), rel=1e-3,
                                            abs=1e-6)


def test_single_step_equivalence_jittered(engines):
    """Same as above but from a jittered, velocity-loaded state — terms
    that vanish on the pristine lattice (e.g. the identity-blend weight w2
    in the KGC, velocity-coupled wall terms) are only exercised here."""
    cfg, scene, ga, cg, state0 = engines
    rng = np.random.default_rng(123)
    nf, n = scene.n_fluid, scene.n_total
    import jax.numpy as jnp
    f32 = np.float32

    x = np.asarray(state0.x).copy()
    y = np.asarray(state0.y).copy()
    x[:nf] = np.mod(x[:nf] + rng.uniform(-0.35, 0.35, nf) * cfg.dp, cfg.DL)
    y[:nf] += rng.uniform(-0.35, 0.35, nf) * cfg.dp
    vx = np.zeros(n, f32)
    vy = np.zeros(n, f32)
    vx[:nf] = rng.normal(0, 0.4, nf)
    vy[:nf] = rng.normal(0, 0.1, nf)
    drho = np.zeros(n, f32)
    drho[:nf] = rng.normal(0, 0.05, nf)
    st = state0._replace(x=jnp.asarray(x, jnp.float32),
                         y=jnp.asarray(y, jnp.float32),
                         vx=jnp.asarray(vx), vy=jnp.asarray(vy),
                         drho_dt=jnp.asarray(drho))

    sa, ca, gma, _ = ga.init(st)
    sc, cc, gmc, _ = cg.init(st)
    # init must agree including near-wall B components
    tols = {"p": dict(rtol=5e-3, atol=5e-4)}
    for name in ("rho", "vol", "b11", "b12", "b21", "b22", "p"):
        tol = tols.get(name, dict(rtol=2e-4, atol=2e-5))
        np.testing.assert_allclose(np.asarray(getattr(sc, name)),
                                   np.asarray(getattr(sa, name)),
                                   err_msg=f"init {name}", **tol)

    out_a = ga.step(sa, ca, gma, remain=1.0)
    out_c = cg.step(sc, cc, gmc, remain=1.0)
    st_a, st_c = out_a[0], out_c[0]
    # p = p0*(rho/rho0-1) multiplies rho's f32 reordering noise by p0=225
    tols = {"p": dict(rtol=1e-2, atol=2.5e-2),
            "drho_dt": dict(rtol=5e-3, atol=5e-3)}
    for name in st_a._fields:
        tol = tols.get(name, dict(rtol=2e-3, atol=5e-4))
        np.testing.assert_allclose(np.asarray(getattr(st_c, name)),
                                   np.asarray(getattr(st_a, name)),
                                   err_msg=name, **tol)


@pytest.mark.heavy
def test_interval_equivalence(engines):
    """After ~250 steps the two engines agree on the physics observables
    (trajectories decorrelate at f32 reordering level, so compare binned
    profiles and monitors, not per-particle state)."""
    cfg, scene, ga, cg, state0 = engines
    sa, ca, gma, _ = ga.init(state0)
    sc, cc, gmc, _ = cg.init(state0)
    ra = ga.run_interval(sa, ca, gma, np.float32(0.25))
    rc = cg.run_interval(sc, cc, gmc, np.float32(0.25))
    assert int(ra.n_steps) == int(rc.n_steps)
    assert not bool(rc.overflow)
    assert int(ra.n_pairs) == int(rc.n_pairs)
    assert float(rc.v_max) == pytest.approx(float(ra.v_max), rel=1e-3)
    assert float(rc.tau_bottom) == pytest.approx(float(ra.tau_bottom),
                                                 rel=2e-3, abs=1e-5)
    nf = scene.n_fluid
    for res in (ra, rc):
        pass
    y_a = np.asarray(ra.state.y[:nf], float)
    y_c = np.asarray(rc.state.y[:nf], float)
    u_a = np.asarray(ra.state.vx[:nf], float)
    u_c = np.asarray(rc.state.vx[:nf], float)
    _, prof_a = pp.binned_profile_mean(y_a, u_a, 0.0, cfg.DH, cfg.n_bins)
    _, prof_c = pp.binned_profile_mean(y_c, u_c, 0.0, cfg.DH, cfg.n_bins)
    np.testing.assert_allclose(prof_c, prof_a, rtol=5e-3, atol=1e-4)


@pytest.mark.heavy
def test_cellgrid_skin_mode(engines):
    """Skin + rebuild_every must agree with strict rebuild."""
    cfg0, scene, ga, cg, state0 = engines
    cfg = dataclasses.replace(cfg0, neighbor_skin=0.5 * cfg0.dp,
                              rebuild_every=4, cell_capacity=24)
    cg2 = CellEngine(cfg, scene)
    s2, l2_, g2, ov = cg2.init(state0)
    assert not bool(ov)
    r2 = cg2.run_interval(s2, l2_, g2, np.float32(0.25))
    sc, cc, gmc, _ = cg.init(state0)
    rc = cg.run_interval(sc, cc, gmc, np.float32(0.25))
    assert not bool(r2.overflow)
    assert int(r2.n_steps) == int(rc.n_steps)
    assert float(r2.v_max) == pytest.approx(float(rc.v_max), rel=2e-3)


def test_cellgrid_overflow_flag():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=0.5,
                      cell_capacity=2)
    scene = build_scene(cfg)
    cg = CellEngine(cfg, scene)
    _, lay, _, overflow = cg.init(initial_state(cfg, scene))
    assert bool(overflow)


def test_wall_visc_factor_knob():
    """A larger one-sided wall factor must strengthen the wall viscous drag
    (default 4.0 is reference-exact and covered by the oracle tests)."""
    import jax.numpy as jnp
    cfg4 = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=0.5)
    cfg5 = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=0.5,
                       wall_visc_factor=5.0)
    scene = build_scene(cfg4)
    state0 = initial_state(cfg4, scene)
    nf = scene.n_fluid
    # give the fluid a uniform +x velocity so the wall term is active
    vx = np.zeros(scene.n_total, np.float32)
    vx[:nf] = 0.5
    state0 = state0._replace(vx=jnp.asarray(vx))

    outs = {}
    for name, cfg in (("f4", cfg4), ("f5", cfg5)):
        eng = CellEngine(cfg, scene)
        s, l, g, _ = eng.init(state0)
        out = eng.step(s, l, g, remain=1.0)
        outs[name] = out
    # stronger factor -> more negative viscous force on near-wall fluid
    fpx4 = np.asarray(outs["f4"][0].fpx[:nf])
    fpx5 = np.asarray(outs["f5"][0].fpx[:nf])
    yf = scene.y[:nf]
    near_wall = (yf < 2 * cfg4.h) | (yf > cfg4.DH - 2 * cfg4.h)
    assert fpx5[near_wall].sum() < fpx4[near_wall].sum()
    # and the wall-shear monitor scales with it
    assert float(outs["f5"][6]) > float(outs["f4"][6])


@pytest.mark.heavy
def test_interval_tail_tau_matches_inloop_monitor(engines):
    """The interval-final tau computed AFTER the while loop (monitor
    statically dropped from the body when step_log_every == 0) must equal
    the tau of a run whose body computes the monitor every step
    (step_log_every > 0) — i.e. the tail recompute is value-identical to
    the reference's final in-loop wall_shear_monitor."""
    cfg0, scene, _, _, state0 = engines
    cfg_tail = dataclasses.replace(cfg0, step_log_every=0)
    cfg_loop = dataclasses.replace(cfg0, step_log_every=10 ** 9)
    taus = {}
    for name, cfg in (("tail", cfg_tail), ("loop", cfg_loop)):
        eng = CellEngine(cfg, scene)
        s, l, g, ov = eng.init(state0)
        assert not bool(ov)
        r = eng.run_interval(s, l, g, np.float32(0.25))
        taus[name] = (float(r.tau_bottom), float(r.tau_top),
                      int(r.n_steps))
    assert taus["tail"][2] == taus["loop"][2]
    assert taus["tail"][0] == pytest.approx(taus["loop"][0], rel=1e-6,
                                            abs=1e-9)
    assert taus["tail"][1] == pytest.approx(taus["loop"][1], rel=1e-6,
                                            abs=1e-9)


def test_tiny_domain_seam_dedup():
    """nx < 3 grids: the cell layout's wrapped halo must not revisit a cell
    the interior window already covers (each cross-seam pair would be
    double-counted; the reference dedups via its seen_neighbor stamp,
    sph_neighbor_search_mex.c:298-303). Guarded by equivalence with the
    gather engine, whose x_offsets dedup statically."""
    cfg = default_cfg(DL=0.3, DH=0.5, dp=0.05, end_time=0.5,
                      output_interval=0.25)
    scene = build_scene(cfg)
    ga = Engine(cfg, scene)
    cg = CellEngine(cfg, scene)
    assert cg.spec.nx < 3, "config no longer exercises the tiny-nx path"
    state0 = initial_state(cfg, scene)
    sa, _, _, ova = ga.init(state0)
    sc, _, _, ovc = cg.init(state0)
    assert not bool(ova) and not bool(ovc)
    np.testing.assert_allclose(np.asarray(sc.rho), np.asarray(sa.rho),
                               rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc.vol), np.asarray(sa.vol),
                               rtol=5e-5, atol=1e-5)


def test_init_preserves_restored_drho_dt(engines):
    """Restart parity: the post-restart init pass must carry the restored
    drho_dt into the first step's density half-kick (the reference's S5
    init does not touch drho_dt, SPH_Poiseuille.m:147-173)."""
    cfg, scene, ga, cg, state0 = engines
    rng = np.random.default_rng(11)
    drho = np.zeros(scene.n_total, np.float32)
    drho[:scene.n_fluid] = rng.normal(0, 0.01, scene.n_fluid)
    state = state0._replace(drho_dt=drho)
    for eng in (ga, cg):
        s_out, _, _, _ = eng.init(state)
        np.testing.assert_array_equal(np.asarray(s_out.drho_dt), drho)


def test_interval_clock_kahan():
    """The compensated interval clock stays exact to ~1 ulp over thousands
    of f32 accumulations (bare f32 drifts the step count by +-1)."""
    import jax
    import jax.numpy as jnp

    from sph_poiseuille_flow_tpu.stepper import _t_add

    dt = np.float32(2.37e-4)
    n = 4219

    def body(carry, _):
        t, c = carry
        t, c = _t_add(t, c, jnp.asarray(dt))
        return (t, c), None

    (t_end, _), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.float32(0.0)), None, length=n)
    exact = float(np.float64(dt) * n)
    assert abs(float(t_end) - exact) < 4 * np.finfo(np.float32).eps * exact
    # bare f32 accumulation for contrast: visibly worse
    t_bare = np.float32(0.0)
    for _ in range(n):
        t_bare = np.float32(t_bare + dt)
    assert abs(float(t_bare) - exact) > abs(float(t_end) - exact)
