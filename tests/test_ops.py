"""Operator validation against the independent float64 NumPy oracle.

Each JAX operator (dense-matrix row-sum formulation) is compared against
``oracle_numpy`` (store-once pair list + two-sided scatter, the reference's
exact semantics) on a jittered configuration with active walls, nonzero
velocities, pressures and prior forces — so every term in every operator is
exercised. Also includes physics property tests (mass-normalization, KGC
identity, momentum conservation, symmetry).
"""

import numpy as np
import pytest

import oracle_numpy as oracle
from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.ops import neighbors as nbr
from sph_poiseuille_flow_tpu.ops.density import density_correction
from sph_poiseuille_flow_tpu.ops.viscosity import viscous_force
from sph_poiseuille_flow_tpu.ops.transport import transport_correction
from sph_poiseuille_flow_tpu.ops.integration import (
    integration_first, kick, integration_second, finalize_density,
    verlet_step, verlet_dt)
from sph_poiseuille_flow_tpu.ops.monitors import wall_shear

from test_config import default_cfg


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
    x = np.asarray(x, np.float32).astype(np.float64)
    y = np.asarray(y, np.float32).astype(np.float64)

    vel = np.zeros((n, 2))
    vel[:nf] = rng.normal(0, 0.3, (nf, 2))
    vel = np.asarray(vel, np.float32).astype(np.float64)
    drho = np.zeros(n)
    drho[:nf] = rng.normal(0, 0.05, nf)
    drho = np.asarray(drho, np.float32).astype(np.float64)
    fprior = np.zeros((n, 2))
    fprior[:nf] = rng.normal(0, 0.01, (nf, 2))
    fprior = np.asarray(fprior, np.float32).astype(np.float64)
    wall_vel = np.zeros((n, 2))

    pairs = oracle.build_pairs(x, y, nf, cfg.DL, cfg.h)
    spec = nbr.make_grid_spec(cfg, scene)
    idx, cache, overflow = nbr.build_cache(
        spec, x.astype(np.float32), y.astype(np.float32))
    assert not bool(overflow)
    return dict(cfg=cfg, scene=scene, spec=spec, cache=cache, idx=idx,
                x=x, y=y, vel=vel, drho=drho, fprior=fprior,
                wall_vel=wall_vel, pairs=pairs, rng=rng)


_DENSITY_MEMO = {}


def _density_both(s):
    if id(s["cache"]) in _DENSITY_MEMO:
        return _DENSITY_MEMO[id(s["cache"])]
    cfg, scene, spec = s["cfg"], s["scene"], s["spec"]
    rho_o, vol_o, B_o = oracle.density_correction(
        s["pairs"], scene.mass, scene.n_fluid, scene.n_total,
        cfg.rho0, cfg.h, cfg.inv_sigma0)
    rho, vol, b11, b12, b21, b22 = density_correction(
        spec, s["cache"], np.asarray(scene.mass, np.float32),
        cfg.rho0, cfg.inv_sigma0)
    out = ((rho_o, vol_o, B_o), (np.asarray(rho), np.asarray(vol),
                                 np.stack([np.asarray(b11), np.asarray(b12),
                                           np.asarray(b21), np.asarray(b22)],
                                          axis=1)))
    _DENSITY_MEMO[id(s["cache"])] = out
    return out


def test_density_correction_vs_oracle(setup):
    (rho_o, vol_o, B_o), (rho, vol, B) = _density_both(setup)
    np.testing.assert_allclose(rho, rho_o, rtol=2e-5)
    np.testing.assert_allclose(vol, vol_o, rtol=2e-5)
    np.testing.assert_allclose(B, B_o, rtol=5e-3, atol=2e-4)


def test_density_uniform_lattice_normalization(setup):
    """On the unjittered lattice, kernel-summation density ~ rho0 and
    KGC ~ identity for interior particles."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    scene = build_scene(cfg)
    spec = nbr.make_grid_spec(cfg, scene)
    _, cache, _ = nbr.build_cache(spec, np.asarray(scene.x, np.float32),
                                  np.asarray(scene.y, np.float32))
    rho, vol, b11, b12, b21, b22 = density_correction(
        spec, cache, np.asarray(scene.mass, np.float32),
        cfg.rho0, cfg.inv_sigma0)
    yf = scene.y[:scene.n_fluid]
    interior = (yf > 3 * cfg.dp) & (yf < cfg.DH - 3 * cfg.dp)
    rho_f = np.asarray(rho)[:scene.n_fluid]
    assert np.allclose(rho_f[interior], cfg.rho0, rtol=2e-2)
    assert np.allclose(np.asarray(b11)[:scene.n_fluid][interior], 1.0,
                       atol=5e-2)
    assert np.allclose(np.asarray(b12)[:scene.n_fluid][interior], 0.0,
                       atol=5e-2)


def test_viscous_force_vs_oracle(setup):
    s = setup
    cfg, scene, spec = s["cfg"], s["scene"], s["spec"]
    (rho_o, vol_o, B_o), _ = _density_both(s)
    f_o = oracle.viscous_force(s["pairs"], s["vel"], vol_o, B_o, cfg.mu,
                               cfg.h, scene.n_fluid, scene.n_total,
                               s["wall_vel"])
    f32 = np.float32
    fx, fy = viscous_force(
        spec, s["cache"], s["vel"][:, 0].astype(f32),
        s["vel"][:, 1].astype(f32), vol_o.astype(f32),
        B_o[:, 0].astype(f32), B_o[:, 1].astype(f32),
        B_o[:, 2].astype(f32), B_o[:, 3].astype(f32),
        s["wall_vel"][:, 0].astype(f32), s["wall_vel"][:, 1].astype(f32),
        cfg.mu, cfg.h)
    np.testing.assert_allclose(np.asarray(fx), f_o[:, 0], rtol=1e-3,
                               atol=5e-7)
    np.testing.assert_allclose(np.asarray(fy), f_o[:, 1], rtol=1e-3,
                               atol=5e-7)


def test_viscous_momentum_conservation(setup):
    """Fluid-fluid viscous interactions conserve momentum exactly (mask out
    wall entries: their one-sided force is physically non-conservative)."""
    s = setup
    cfg, scene, spec = s["cfg"], s["scene"], s["spec"]
    (rho_o, vol_o, B_o), _ = _density_both(s)
    cache_ff = s["cache"]._replace(
        mask_w=np.zeros_like(np.asarray(s["cache"].mask_w)))
    f32 = np.float32
    fx, fy = viscous_force(
        spec, cache_ff, s["vel"][:, 0].astype(f32), s["vel"][:, 1].astype(f32),
        vol_o.astype(f32), B_o[:, 0].astype(f32), B_o[:, 1].astype(f32),
        B_o[:, 2].astype(f32), B_o[:, 3].astype(f32),
        s["wall_vel"][:, 0].astype(f32), s["wall_vel"][:, 1].astype(f32),
        cfg.mu, cfg.h)
    # acc_i uses Vol_j / Vol_i weights -> momentum sum of m*a = rho*Vol*acc;
    # with f = acc*Vol, sum of f*rho ~ 0 when rho uniform; here check the
    # antisymmetric accumulation directly: sum of acc*Vol (=f) over equal-Vol
    # fluid is ~0 relative to the force scale
    scale = np.abs(np.asarray(fx)).max() * scene.n_fluid
    assert abs(np.asarray(fx).sum()) < 1e-3 * scale
    assert abs(np.asarray(fy).sum()) < 1e-3 * scale


def test_transport_correction_vs_oracle(setup):
    s = setup
    cfg, scene, spec = s["cfg"], s["scene"], s["spec"]
    (rho_o, vol_o, B_o), _ = _density_both(s)
    pos = np.stack([s["x"], s["y"]], axis=1)
    pos_o = oracle.transport_correction(
        s["pairs"], vol_o, B_o, pos, cfg.h, scene.n_fluid, scene.n_total,
        cfg.transport_coeff)
    f32 = np.float32
    x2, y2 = transport_correction(
        spec, s["cache"], s["x"].astype(f32), s["y"].astype(f32),
        vol_o.astype(f32), B_o[:, 0].astype(f32), B_o[:, 1].astype(f32),
        B_o[:, 2].astype(f32), B_o[:, 3].astype(f32),
        cfg.h, cfg.transport_coeff)
    np.testing.assert_allclose(np.asarray(x2), pos_o[:, 0], rtol=1e-5,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(y2), pos_o[:, 1], rtol=1e-5,
                               atol=2e-6)


def test_verlet_step_vs_oracle(setup):
    """The full composite Verlet advance against the oracle's
    integration_verlet — every sub-stage must line up."""
    s = setup
    cfg, scene, spec = s["cfg"], s["scene"], s["spec"]
    (rho_o, vol_o, B_o), _ = _density_both(s)
    dt = 1e-3
    pos = np.stack([s["x"], s["y"]], axis=1)
    rho2_o, p2_o, pos2_o, vel2_o, drho2_o, force_o = oracle.integration_verlet(
        s["pairs"], vol_o, B_o, rho_o, scene.mass, pos, s["vel"], s["drho"],
        s["fprior"], dt, scene.n_fluid, scene.n_total, cfg.rho0, cfg.p0,
        cfg.c_f, s["wall_vel"])

    f32 = np.float32
    rho2, p2, x2, y2, vx2, vy2, drho2, fx2, fy2 = verlet_step(
        spec, s["cache"], vol_o.astype(f32),
        B_o[:, 0].astype(f32), B_o[:, 1].astype(f32),
        B_o[:, 2].astype(f32), B_o[:, 3].astype(f32),
        rho_o.astype(f32), np.asarray(scene.mass, f32),
        s["x"].astype(f32), s["y"].astype(f32),
        s["vel"][:, 0].astype(f32), s["vel"][:, 1].astype(f32),
        s["drho"].astype(f32), s["fprior"][:, 0].astype(f32),
        s["fprior"][:, 1].astype(f32),
        s["wall_vel"][:, 0].astype(f32), s["wall_vel"][:, 1].astype(f32),
        np.float32(dt), cfg.rho0, cfg.p0, cfg.c_f)

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
    the face-pressure formulation when Vol is uniform)."""
    s = setup
    cfg, scene, spec = s["cfg"], s["scene"], s["spec"]
    (rho_o, vol_o, B_o), _ = _density_both(s)
    cache_ff = s["cache"]._replace(
        mask_w=np.zeros_like(np.asarray(s["cache"].mask_w)))
    f32 = np.float32
    out = integration_first(
        spec, cache_ff, vol_o.astype(f32),
        B_o[:, 0].astype(f32), B_o[:, 1].astype(f32),
        B_o[:, 2].astype(f32), B_o[:, 3].astype(f32),
        rho_o.astype(f32), np.asarray(scene.mass, f32),
        s["x"].astype(f32), s["y"].astype(f32),
        s["vel"][:, 0].astype(f32), s["vel"][:, 1].astype(f32),
        s["drho"].astype(f32), s["fprior"][:, 0].astype(f32),
        s["fprior"][:, 1].astype(f32), np.float32(1e-3),
        cfg.rho0, cfg.p0, cfg.c_f)
    # force = acc*Vol; with near-uniform Vol the pair antisymmetry makes the
    # sum small relative to the total magnitude
    fx = np.asarray(out.fx)
    scale = np.abs(fx).sum() + 1e-30
    assert abs(fx.sum()) < 1e-3 * scale


def test_wall_shear_vs_oracle(setup):
    s = setup
    cfg, scene, spec = s["cfg"], s["scene"], s["spec"]
    (rho_o, vol_o, B_o), _ = _density_both(s)
    pos = np.stack([s["x"], s["y"]], axis=1)
    tb_o, tt_o = oracle.wall_shear_monitor(
        s["pairs"], pos, s["vel"], s["wall_vel"], vol_o, B_o,
        scene.n_fluid, cfg.DL, cfg.DH, cfg.mu, cfg.h)
    f32 = np.float32
    tb, tt = wall_shear(
        spec, s["cache"], s["y"].astype(f32), s["vel"][:, 0].astype(f32),
        s["wall_vel"][:, 0].astype(f32), vol_o.astype(f32),
        B_o[:, 0].astype(f32), B_o[:, 1].astype(f32),
        B_o[:, 2].astype(f32), B_o[:, 3].astype(f32),
        cfg.DL, cfg.DH, cfg.mu, cfg.h)
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
