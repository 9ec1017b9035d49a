"""Operator validation against the independent float64 NumPy oracle.

Each JAX operator (dense-matrix row-sum formulation with caller-gathered
neighbor values) is compared against ``oracle_numpy`` (store-once pair list
+ two-sided scatter, the reference's exact semantics) on a jittered
configuration with active walls, nonzero velocities, pressures and prior
forces — so every term in every operator is exercised. Also includes
physics property tests (mass-normalization, KGC identity, momentum
conservation, symmetry).
"""

import numpy as np
import pytest

import oracle_numpy as oracle
from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.ops.viscosity import viscous_force
from sph_poiseuille_flow_tpu.ops.transport import transport_correction
from sph_poiseuille_flow_tpu.ops.integration import verlet_dt, verlet_step
from sph_poiseuille_flow_tpu.ops.monitors import wall_shear

from jax_ops_helpers import build_cands_geom, full_density, take_j
from test_config import default_cfg

F32 = np.float32


@pytest.fixture(scope="module")
def setup():
    """Small jittered scene with walls, random velocities and state."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    scene = build_scene(cfg)
    rng = np.random.default_rng(42)
    nf, n = scene.n_fluid, scene.n_total

    x = scene.x.copy()
    y = scene.y.copy()
    x[:nf] += rng.uniform(-0.3, 0.3, nf) * cfg.dp
    y[:nf] += rng.uniform(-0.3, 0.3, nf) * cfg.dp
    x[:nf] = np.mod(x[:nf], cfg.DL)
    # float32-exact inputs so oracle and JAX see identical bits
    x = np.asarray(x, F32).astype(np.float64)
    y = np.asarray(y, F32).astype(np.float64)

    vel = np.zeros((n, 2))
    vel[:nf] = rng.normal(0, 0.3, (nf, 2))
    vel = np.asarray(vel, F32).astype(np.float64)
    drho = np.zeros(n)
    drho[:nf] = rng.normal(0, 0.05, nf)
    drho = np.asarray(drho, F32).astype(np.float64)
    fprior = np.zeros((n, 2))
    fprior[:nf] = rng.normal(0, 0.01, (nf, 2))
    fprior = np.asarray(fprior, F32).astype(np.float64)
    wall_vel = np.zeros((n, 2))

    pairs = oracle.build_pairs(x, y, nf, cfg.DL, cfg.h)
    spec, cands, geom = build_cands_geom(cfg, scene, x.astype(F32),
                                         y.astype(F32))
    assert not bool(cands.overflow)

    rho_o, vol_o, B_o = oracle.density_correction(
        pairs, scene.mass, nf, n, cfg.rho0, cfg.h, cfg.inv_sigma0)
    return dict(cfg=cfg, scene=scene, spec=spec, cands=cands, geom=geom,
                x=x, y=y, vel=vel, drho=drho, fprior=fprior,
                wall_vel=wall_vel, pairs=pairs,
                rho_o=rho_o, vol_o=vol_o, B_o=B_o)


def _jax_density(s):
    return full_density(s["spec"], s["geom"], s["cands"],
                        np.asarray(s["scene"].mass, F32),
                        s["cfg"].rho0, s["cfg"].inv_sigma0)


def _b_cols(B_o):
    return tuple(B_o[:, k].astype(F32) for k in range(4))


def test_density_correction_vs_oracle(setup):
    s = setup
    rho, vol, b11, b12, b21, b22 = _jax_density(s)
    np.testing.assert_allclose(np.asarray(rho), s["rho_o"], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(vol), s["vol_o"], rtol=2e-5)
    B = np.stack([np.asarray(b) for b in (b11, b12, b21, b22)], axis=1)
    np.testing.assert_allclose(B, s["B_o"], rtol=5e-3, atol=2e-4)


def test_density_uniform_lattice_normalization():
    """On the unjittered lattice, kernel-summation density ~ rho0 and
    KGC ~ identity for interior particles."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    scene = build_scene(cfg)
    spec, cands, geom = build_cands_geom(
        cfg, scene, np.asarray(scene.x, F32), np.asarray(scene.y, F32))
    rho, vol, b11, b12, b21, b22 = full_density(
        spec, geom, cands, np.asarray(scene.mass, F32), cfg.rho0,
        cfg.inv_sigma0)
    yf = scene.y[:scene.n_fluid]
    interior = (yf > 3 * cfg.dp) & (yf < cfg.DH - 3 * cfg.dp)
    rho_f = np.asarray(rho)[:scene.n_fluid]
    assert np.allclose(rho_f[interior], cfg.rho0, rtol=2e-2)
    assert np.allclose(np.asarray(b11)[:scene.n_fluid][interior], 1.0,
                       atol=5e-2)
    assert np.allclose(np.asarray(b12)[:scene.n_fluid][interior], 0.0,
                       atol=5e-2)


def _viscous_jax(s, geom=None):
    cfg = s["cfg"]
    B_o, vol_o = s["B_o"], s["vol_o"]
    b11, b12, b21, b22 = _b_cols(B_o)
    vol_j, b11_j, b12_j, b21_j, b22_j, vx_j, vy_j = take_j(
        s["cands"], vol_o.astype(F32), b11, b12, b21, b22,
        s["vel"][:, 0].astype(F32), s["vel"][:, 1].astype(F32))
    return viscous_force(
        s["spec"], geom or s["geom"], s["cands"],
        s["vel"][:, 0].astype(F32), s["vel"][:, 1].astype(F32),
        vol_o.astype(F32), b11, b12, b21, b22,
        vol_j, b11_j, b12_j, b21_j, b22_j, vx_j, vy_j, cfg.mu, cfg.h)


def test_viscous_force_vs_oracle(setup):
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    f_o = oracle.viscous_force(s["pairs"], s["vel"], s["vol_o"], s["B_o"],
                               cfg.mu, cfg.h, scene.n_fluid, scene.n_total,
                               s["wall_vel"])
    fx, fy = _viscous_jax(s)
    np.testing.assert_allclose(np.asarray(fx), f_o[:, 0], rtol=1e-3,
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(fy), f_o[:, 1], rtol=1e-3,
                               atol=5e-7)


def test_viscous_momentum_conservation(setup):
    """Fluid-fluid viscous interactions conserve momentum (mask out wall
    entries: their one-sided force is physically non-conservative)."""
    s = setup
    geom_ff = s["geom"]._replace(
        mask_w=np.zeros_like(np.asarray(s["geom"].mask_w)))
    fx, fy = _viscous_jax(s, geom=geom_ff)
    scale = np.abs(np.asarray(fx)).max() * s["scene"].n_fluid
    assert abs(np.asarray(fx).sum()) < 1e-3 * scale
    assert abs(np.asarray(fy).sum()) < 1e-3 * scale


def test_transport_correction_vs_oracle(setup):
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    pos = np.stack([s["x"], s["y"]], axis=1)
    pos_o = oracle.transport_correction(
        s["pairs"], s["vol_o"], s["B_o"], pos, cfg.h, scene.n_fluid,
        scene.n_total, cfg.transport_coeff)
    b11, b12, b21, b22 = _b_cols(s["B_o"])
    vol_j, b11_j, b12_j, b21_j, b22_j = take_j(
        s["cands"], s["vol_o"].astype(F32), b11, b12, b21, b22)
    x2, y2 = transport_correction(
        s["spec"], s["geom"], s["x"].astype(F32), s["y"].astype(F32),
        b11, b12, b21, b22, vol_j, b11_j, b12_j, b21_j, b22_j,
        cfg.h, cfg.transport_coeff)
    np.testing.assert_allclose(np.asarray(x2), pos_o[:, 0], rtol=1e-5,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(y2), pos_o[:, 1], rtol=1e-5,
                               atol=2e-6)


def test_verlet_step_vs_oracle(setup):
    """The full composite Verlet advance against the oracle's
    integration_verlet — every sub-stage must line up."""
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    dt = 1e-3
    pos = np.stack([s["x"], s["y"]], axis=1)
    rho2_o, p2_o, pos2_o, vel2_o, drho2_o, force_o = oracle.integration_verlet(
        s["pairs"], s["vol_o"], s["B_o"], s["rho_o"], scene.mass, pos,
        s["vel"], s["drho"], s["fprior"], dt, scene.n_fluid, scene.n_total,
        cfg.rho0, cfg.p0, cfg.c_f, s["wall_vel"])

    b11, b12, b21, b22 = _b_cols(s["B_o"])
    out = verlet_step(
        s["spec"], s["geom"], s["cands"], s["vol_o"].astype(F32),
        b11, b12, b21, b22, s["rho_o"].astype(F32),
        np.asarray(scene.mass, F32),
        s["x"].astype(F32), s["y"].astype(F32),
        s["vel"][:, 0].astype(F32), s["vel"][:, 1].astype(F32),
        s["drho"].astype(F32), s["fprior"][:, 0].astype(F32),
        s["fprior"][:, 1].astype(F32), np.float32(dt),
        cfg.rho0, cfg.p0, cfg.c_f)
    rho2, p2, x2, y2, vx2, vy2, drho2, fx2, fy2 = out

    np.testing.assert_allclose(np.asarray(rho2), rho2_o, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2), p2_o, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(x2), pos2_o[:, 0], atol=2e-6)
    np.testing.assert_allclose(np.asarray(y2), pos2_o[:, 1], atol=2e-6)
    np.testing.assert_allclose(np.asarray(vx2), vel2_o[:, 0], rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(vy2), vel2_o[:, 1], rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(drho2), drho2_o, rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(fx2), force_o[:, 0], rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fy2), force_o[:, 1], rtol=1e-3,
                               atol=1e-5)


def test_pressure_momentum_conservation(setup):
    """Fluid-fluid pressure forces conserve momentum (antisymmetric under
    the face-pressure formulation when Vol is near-uniform)."""
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    geom_ff = s["geom"]._replace(
        mask_w=np.zeros_like(np.asarray(s["geom"].mask_w)))
    b11, b12, b21, b22 = _b_cols(s["B_o"])
    out = verlet_step(
        s["spec"], geom_ff, s["cands"], s["vol_o"].astype(F32),
        b11, b12, b21, b22, s["rho_o"].astype(F32),
        np.asarray(scene.mass, F32),
        s["x"].astype(F32), s["y"].astype(F32),
        s["vel"][:, 0].astype(F32), s["vel"][:, 1].astype(F32),
        s["drho"].astype(F32), s["fprior"][:, 0].astype(F32),
        s["fprior"][:, 1].astype(F32), np.float32(1e-3),
        cfg.rho0, cfg.p0, cfg.c_f)
    fx = np.asarray(out[7])
    scale = np.abs(fx).sum() + 1e-30
    assert abs(fx.sum()) < 1e-3 * scale


def test_wall_shear_vs_oracle(setup):
    s = setup
    cfg, scene = s["cfg"], s["scene"]
    pos = np.stack([s["x"], s["y"]], axis=1)
    tb_o, tt_o = oracle.wall_shear_monitor(
        s["pairs"], pos, s["vel"], s["wall_vel"], s["vol_o"], s["B_o"],
        scene.n_fluid, cfg.DL, cfg.DH, cfg.mu, cfg.h)
    b11, b12, b21, b22 = _b_cols(s["B_o"])
    # the monitor reads vol_j from the Geometry built with the current vol
    geom = s["geom"]._replace(
        vol_j=take_j(s["cands"], s["vol_o"].astype(F32))[0])
    tb, tt = wall_shear(
        s["spec"], geom, s["cands"], s["vel"][:, 0].astype(F32),
        s["vol_o"].astype(F32), b11, b12, b21, b22, cfg.DL, cfg.mu, cfg.h)
    assert float(tb) == pytest.approx(tb_o, rel=1e-3, abs=1e-6)
    assert float(tt) == pytest.approx(tt_o, rel=1e-3, abs=1e-6)


def test_verlet_dt_golden():
    cfg = default_cfg()
    import jax.numpy as jnp
    vx = jnp.array([0.5, 0.1], jnp.float32)
    vy = jnp.array([0.0, 0.2], jnp.float32)
    dt = float(verlet_dt(vx, vy, cfg.c_f, cfg.h, cfg.nu, cfg.gravity_g,
                         jnp.float32(1.0)))
    v_max = 0.5
    expect = min(0.25 * cfg.h / (cfg.c_f + v_max),
                 0.125 * cfg.h ** 2 / cfg.nu,
                 0.25 * (cfg.h / cfg.gravity_g) ** 0.5, 1.0)
    assert dt == pytest.approx(expect, rel=1e-5)
    # `remain` binds when smaller
    dt2 = float(verlet_dt(vx, vy, cfg.c_f, cfg.h, cfg.nu, cfg.gravity_g,
                          jnp.float32(1e-5)))
    assert dt2 == pytest.approx(1e-5, rel=1e-5)
