"""Three-way cross-check: native C++ oracle vs NumPy oracle vs JAX ops.

The native library (native/sph_oracle.cpp, built via CMake on first use)
must agree with the pure-NumPy oracle to float64 round-off, and with the
float32 JAX operators to float32 tolerances.
"""

import numpy as np
import pytest

import oracle_numpy
from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.utils import native_oracle

from test_config import default_cfg


@pytest.fixture(scope="module")
def setup():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    scene = build_scene(cfg)
    rng = np.random.default_rng(11)
    nf, n = scene.n_fluid, scene.n_total
    x = scene.x.copy()
    y = scene.y.copy()
    x[:nf] = np.mod(x[:nf] + rng.uniform(-0.3, 0.3, nf) * cfg.dp, cfg.DL)
    y[:nf] += rng.uniform(-0.3, 0.3, nf) * cfg.dp
    vel = np.zeros((n, 2))
    vel[:nf] = rng.normal(0, 0.3, (nf, 2))
    drho = np.zeros(n)
    drho[:nf] = rng.normal(0, 0.05, nf)
    fprior = np.zeros((n, 2))
    fprior[:nf] = rng.normal(0, 0.01, (nf, 2))
    wall_vel = np.zeros((n, 2))
    return dict(cfg=cfg, scene=scene, x=x, y=y, vel=vel, drho=drho,
                fprior=fprior, wall_vel=wall_vel)


def _sorted_pairs(pairs):
    pi, pj = pairs[0], pairs[1]
    order = np.lexsort((pj, pi))
    return tuple(np.asarray(a)[order] for a in pairs)


def test_pairs_match_numpy(setup):
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    pairs_c = _sorted_pairs(native_oracle.build_pairs(
        s["x"], s["y"], scene.n_fluid, cfg.DL, cfg.h))
    pairs_np = _sorted_pairs(oracle_numpy.build_pairs(
        s["x"], s["y"], scene.n_fluid, cfg.DL, cfg.h))
    assert pairs_c[0].size == pairs_np[0].size
    np.testing.assert_array_equal(pairs_c[0], pairs_np[0])
    np.testing.assert_array_equal(pairs_c[1], pairs_np[1])
    for a, b in zip(pairs_c[2:], pairs_np[2:]):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-14)


def test_full_step_matches_numpy(setup):
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    nf, n = scene.n_fluid, scene.n_total
    pairs = native_oracle.build_pairs(s["x"], s["y"], nf, cfg.DL, cfg.h)

    rho_c, vol_c, b_c = native_oracle.density_correction(
        pairs, scene.mass, nf, n, cfg.rho0, cfg.h, cfg.inv_sigma0)
    rho_n, vol_n, b_n = oracle_numpy.density_correction(
        pairs, scene.mass, nf, n, cfg.rho0, cfg.h, cfg.inv_sigma0)
    np.testing.assert_allclose(rho_c, rho_n, rtol=1e-12)
    np.testing.assert_allclose(b_c, b_n, rtol=1e-9, atol=1e-12)

    f_c = native_oracle.viscous_force(pairs, s["vel"], vol_c, b_c, cfg.mu,
                                      cfg.h, nf, n, s["wall_vel"])
    f_n = oracle_numpy.viscous_force(pairs, s["vel"], vol_n, b_n, cfg.mu,
                                     cfg.h, nf, n, s["wall_vel"])
    np.testing.assert_allclose(f_c, f_n, rtol=1e-9, atol=1e-12)

    pos = np.stack([s["x"], s["y"]], axis=1)
    p_c = native_oracle.transport_correction(pairs, vol_c, b_c, pos, cfg.h,
                                             nf, n, cfg.transport_coeff)
    p_n = oracle_numpy.transport_correction(pairs, vol_n, b_n, pos, cfg.h,
                                            nf, n, cfg.transport_coeff)
    np.testing.assert_allclose(p_c, p_n, rtol=1e-12, atol=1e-14)

    dt = 1e-3
    out_c = native_oracle.integration_verlet(
        pairs, vol_c, b_c, rho_c, scene.mass, pos, s["vel"], s["drho"],
        s["fprior"], dt, nf, n, cfg.rho0, cfg.p0, cfg.c_f, s["wall_vel"])
    out_n = oracle_numpy.integration_verlet(
        pairs, vol_n, b_n, rho_n, scene.mass, pos, s["vel"], s["drho"],
        s["fprior"], dt, nf, n, cfg.rho0, cfg.p0, cfg.c_f, s["wall_vel"])
    for a, b in zip(out_c, out_n):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)

    tb_c, tt_c = native_oracle.wall_shear_monitor(
        pairs, pos, s["vel"], s["wall_vel"], vol_c, b_c, nf, cfg.DL, cfg.DH,
        cfg.mu, cfg.h)
    tb_n, tt_n = oracle_numpy.wall_shear_monitor(
        pairs, pos, s["vel"], s["wall_vel"], vol_n, b_n, nf, cfg.DL, cfg.DH,
        cfg.mu, cfg.h)
    assert tb_c == pytest.approx(tb_n, rel=1e-10)
    assert tt_c == pytest.approx(tt_n, rel=1e-10)


def test_native_vs_jax_engine_step(setup):
    """Native full-step vs the JAX engine's verlet_step on identical
    inputs (f32 tolerances)."""
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    nf, n = scene.n_fluid, scene.n_total
    f32 = np.float32
    x32 = s["x"].astype(f32).astype(np.float64)
    y32 = s["y"].astype(f32).astype(np.float64)

    from sph_poiseuille_flow_tpu.ops.integration import verlet_step
    from jax_ops_helpers import build_cands_geom

    pairs = native_oracle.build_pairs(x32, y32, nf, cfg.DL, cfg.h)
    rho_c, vol_c, b_c = native_oracle.density_correction(
        pairs, scene.mass, nf, n, cfg.rho0, cfg.h, cfg.inv_sigma0)
    dt = 1e-3
    pos = np.stack([x32, y32], axis=1)
    out_c = native_oracle.integration_verlet(
        pairs, vol_c, b_c, rho_c, scene.mass, pos, s["vel"], s["drho"],
        s["fprior"], dt, nf, n, cfg.rho0, cfg.p0, cfg.c_f, s["wall_vel"])

    spec, cands, geom = build_cands_geom(cfg, scene, x32.astype(f32),
                                         y32.astype(f32))
    assert not bool(cands.overflow)
    out_j = verlet_step(
        spec, geom, cands, vol_c.astype(f32),
        b_c[:, 0].astype(f32), b_c[:, 1].astype(f32),
        b_c[:, 2].astype(f32), b_c[:, 3].astype(f32),
        rho_c.astype(f32), scene.mass.astype(f32),
        x32.astype(f32), y32.astype(f32),
        s["vel"][:, 0].astype(f32), s["vel"][:, 1].astype(f32),
        s["drho"].astype(f32), s["fprior"][:, 0].astype(f32),
        s["fprior"][:, 1].astype(f32),
        np.float32(dt), cfg.rho0, cfg.p0, cfg.c_f)

    rho_j, p_j, x_j, y_j, vx_j, vy_j, drho_j, fx_j, fy_j = out_j
    rho_cc, p_cc, pos_cc, vel_cc, drho_cc, force_cc = out_c
    np.testing.assert_allclose(np.asarray(rho_j), rho_cc, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x_j), pos_cc[:, 0], atol=2e-6)
    np.testing.assert_allclose(np.asarray(vx_j), vel_cc[:, 0], rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fx_j), force_cc[:, 0], rtol=1e-3,
                               atol=1e-5)


def test_oracle_full_simulation_smoke():
    """The C++ oracle as a full simulator (tests/run_oracle_sim.py) must
    run a short case and produce finite, developing flow."""
    import run_oracle_sim
    l2, uy = run_oracle_sim.run(dp=0.05, end_time=0.3, output_interval=0.3,
                                log=lambda s: None)
    assert np.isfinite(l2) and np.isfinite(uy)
    assert 0 < l2 < 1.0          # undeveloped flow: large but finite L2
    assert uy < 0.2
