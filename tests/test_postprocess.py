"""Postprocess stage: L2 metric, binning semantics, device/host profile
agreement, figure generation, handoff-file validation."""

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.utils import postprocess as pp
from sph_poiseuille_flow_tpu.ops.monitors import (
    mid_channel_profile as device_mid_profile)
from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.ops import neighbors as nbr

from test_config import default_cfg


def test_l2_error_golden():
    u = np.array([1.0, 2.0, np.nan, 4.0])
    u_ex = np.array([1.0, 2.5, 3.0, 4.0])
    # only non-NaN bins participate
    expect = np.sqrt(0.25 / (1 + 2.5 ** 2 + 16))
    assert pp.compute_l2_error(u, u_ex) == pytest.approx(expect)


def test_l2_all_nan_raises():
    with pytest.raises(ValueError):
        pp.compute_l2_error(np.array([np.nan]), np.array([1.0]))


def test_binned_profile_discretize_semantics():
    y = np.array([-0.1, 0.0, 0.049, 0.06, 0.96, 1.0, 1.1])
    u = np.array([99.0, 1.0, 2.0, 3.0, 4.0, 5.0, 99.0])
    y_mid, u_mean = pp.binned_profile_mean(y, u, 0.0, 1.0, 20)
    # out-of-range dropped; right edge inclusive in last bin
    assert u_mean[0] == pytest.approx(1.5)     # 0.0 and 0.049
    assert u_mean[1] == pytest.approx(3.0)     # 0.06
    assert u_mean[19] == pytest.approx(4.5)    # 0.96 and 1.0 (right edge)
    assert np.isnan(u_mean[10])


def test_device_profile_matches_host():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    scene = build_scene(cfg)
    rng = np.random.default_rng(7)
    x = np.asarray(scene.x, np.float32)
    # jitter y off the lattice: undisturbed lattice rows sit EXACTLY on
    # bin edges, where float32 (device) and float64 (host) round to
    # different bins — a test artifact, not an implementation difference
    y = scene.y.copy()
    y[:scene.n_fluid] = np.clip(
        y[:scene.n_fluid] + rng.uniform(0.1, 0.4, scene.n_fluid) * cfg.dp,
        None, cfg.DH - 1e-6)
    y = np.asarray(y, np.float32)
    vx = np.zeros(scene.n_total, np.float32)
    vx[:scene.n_fluid] = rng.normal(0, 1, scene.n_fluid)
    spec = nbr.make_grid_spec(cfg, scene)

    y_mid_h, u_h = pp.mid_channel_profile(
        x[:scene.n_fluid].astype(np.float64),
        y[:scene.n_fluid].astype(np.float64),
        vx[:scene.n_fluid].astype(np.float64),
        cfg.DL, cfg.DH, cfg.mid_x, cfg.mid_half_width, cfg.n_bins)
    y_mid_d, u_d = device_mid_profile(
        spec, x, y, vx, cfg.DL, cfg.DH, cfg.mid_x, cfg.mid_half_width,
        cfg.n_bins)
    np.testing.assert_allclose(np.asarray(y_mid_d), y_mid_h, rtol=1e-5)
    nan_h = np.isnan(u_h)
    np.testing.assert_array_equal(np.isnan(np.asarray(u_d)), nan_h)
    np.testing.assert_allclose(np.asarray(u_d)[~nan_h], u_h[~nan_h],
                               rtol=1e-4, atol=1e-5)


def test_handoff_roundtrip_and_figures(tmp_path):
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    n_bins = cfg.n_bins
    y_mid = np.linspace(0.0125, cfg.DH - 0.0125, n_bins)
    u_exact = cfg.analytic_u(y_mid)
    rng = np.random.default_rng(3)
    u_mean = u_exact * (1 + 0.01 * rng.normal(size=n_bins))
    nf = 200
    data = {
        "cfg_DL": cfg.DL, "cfg_DH": cfg.DH, "cfg_dp": cfg.dp,
        "cfg_U_max": cfg.U_max, "cfg_gravity_g": cfg.gravity_g,
        "cfg_nu": cfg.nu, "cfg_h": cfg.h,
        "cfg_wall_thickness": cfg.wall_thickness,
        "n_fluid": nf,
        "fluid_x": rng.uniform(0, cfg.DL, nf),
        "fluid_y": rng.uniform(0, cfg.DH, nf),
        "fluid_u": rng.uniform(0, 1, nf),
        "fluid_v": rng.uniform(-0.01, 0.01, nf),
        "n_bins": n_bins,
        "profile_times": np.array([0.0, 0.5, 1.0]),
        "mid_profile_u": np.stack([0 * u_mean, 0.5 * u_mean, u_mean],
                                  axis=1),
        "y_mid": y_mid, "u_mean": u_mean, "u_exact": u_exact,
        "result_png": str(tmp_path / "result.png"),
        "profile_evolution_png": str(tmp_path / "evo.png"),
    }
    path = str(tmp_path / "post.npz")
    pp.save_postprocess_npz(path, data)
    result = pp.postprocess_file(path, quiet=True)
    assert result["passed"]
    assert result["L2_error"] < 0.05
    import os
    assert os.path.getsize(data["result_png"]) > 10000
    assert os.path.getsize(data["profile_evolution_png"]) > 10000


def test_handoff_missing_field_rejected(tmp_path):
    path = str(tmp_path / "bad.npz")
    np.savez(path, cfg_DL=1.0)
    with pytest.raises(ValueError):
        pp.load_postprocess_npz(path)


def test_final_profile_reconstruction_fallback(tmp_path):
    """Handoff files without a stored final profile reconstruct it from the
    raw state (reference: get_final_profile,
    SPH_Poiseuille_postprocess.m:158-175)."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    rng = np.random.default_rng(5)
    nf = 4000
    x = rng.uniform(0, cfg.DL, nf)
    y = rng.uniform(0, cfg.DH, nf)
    u = cfg.analytic_u(y)
    data = {
        "cfg_DL": cfg.DL, "cfg_DH": cfg.DH, "cfg_dp": cfg.dp,
        "cfg_U_max": cfg.U_max, "cfg_gravity_g": cfg.gravity_g,
        "cfg_nu": cfg.nu, "cfg_h": cfg.h,
        "cfg_wall_thickness": cfg.wall_thickness,
        "n_fluid": nf,
        "fluid_x": x, "fluid_y": y, "fluid_u": u,
        "fluid_v": np.zeros(nf),
        "n_bins": cfg.n_bins,
        "profile_times": np.array([0.0, 1.0]),
        "mid_profile_u": np.stack([0 * cfg.analytic_u(
            np.linspace(0, cfg.DH, cfg.n_bins))] * 2, axis=1),
        "result_png": str(tmp_path / "r.png"),
        "profile_evolution_png": str(tmp_path / "e.png"),
    }
    path = str(tmp_path / "no_profile.npz")
    pp.save_postprocess_npz(path, data)
    loaded = pp.load_postprocess_npz(path)
    assert "u_mean" not in loaded
    y_mid, u_mean, u_exact = pp.get_final_profile(loaded)
    assert y_mid.shape == (cfg.n_bins,)
    # exact analytic samples -> reconstruction L2 is only binning error
    assert pp.compute_l2_error(u_mean, u_exact) < 0.02
    result = pp.postprocess_file(path, quiet=True)
    assert result["passed"]


def test_edge_seam_metrics_analytic_field():
    """A periodic analytic field has no seam discontinuity: both canaries
    (reference README.md:150-151) must be near zero."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    rng = np.random.default_rng(9)
    nf = 20000
    x = rng.uniform(0, cfg.DL, nf)
    y = rng.uniform(0, cfg.DH, nf)
    u = cfg.analytic_u(y)
    data = {
        "cfg_DL": cfg.DL, "cfg_DH": cfg.DH, "cfg_dp": cfg.dp,
        "cfg_h": cfg.h, "cfg_gravity_g": cfg.gravity_g, "cfg_nu": cfg.nu,
        "fluid_x": x, "fluid_y": y, "fluid_u": u, "n_bins": cfg.n_bins,
    }
    gap, l2 = pp.edge_seam_metrics(data)
    assert gap < 0.02 * cfg.U_max
    assert l2 < 0.02


def test_edge_seam_metrics_detect_discontinuity():
    """A deliberate velocity jump across the seam must move edge_ux_gap."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    rng = np.random.default_rng(13)
    nf = 20000
    x = rng.uniform(0, cfg.DL, nf)
    y = rng.uniform(0, cfg.DH, nf)
    u = cfg.analytic_u(y)
    u = np.where(x < 0.5 * cfg.DL, u, u + 0.2 * cfg.U_max)  # seam jump
    data = {
        "cfg_DL": cfg.DL, "cfg_DH": cfg.DH, "cfg_dp": cfg.dp,
        "cfg_h": cfg.h, "cfg_gravity_g": cfg.gravity_g, "cfg_nu": cfg.nu,
        "fluid_x": x, "fluid_y": y, "fluid_u": u, "n_bins": cfg.n_bins,
    }
    gap, _ = pp.edge_seam_metrics(data)
    assert gap > 0.15 * cfg.U_max


def test_time_averaged_l2():
    """The averaged-profile L2 cancels a zero-mean oscillation that the
    instantaneous L2 sees; absent/malformed full_profile_u returns None."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    n_bins = cfg.n_bins
    edges = np.linspace(0.0, cfg.DH, n_bins + 1)
    y_mid = 0.5 * (edges[:-1] + edges[1:])
    u_exact = cfg.analytic_u(y_mid)
    # 0..40 s: the 5 s window is under the 25%-of-run cap, so it selects
    # t in [35, 40] — six alternating columns
    tvals = np.arange(41, dtype=np.float64)
    # alternating +-5% acoustic-like wobble, zero-mean over the window
    cols = [u_exact * (1.0 + 0.05 * (-1.0) ** k) for k in range(41)]
    data = {
        "cfg_DH": cfg.DH, "cfg_gravity_g": cfg.gravity_g, "cfg_nu": cfg.nu,
        "fluid_y": y_mid, "fluid_u": cols[-1], "n_bins": n_bins,
        "y_mid": y_mid, "u_mean": cols[-1], "u_exact": u_exact,
        "profile_times": tvals,
        "full_profile_u": np.stack(cols, axis=1),
    }
    inst = pp.compute_l2_error(cols[-1], u_exact)
    assert inst == pytest.approx(0.05)
    avg = pp.time_averaged_l2(data)
    # window [3, 8] holds 6 alternating columns -> exact cancellation
    assert avg == pytest.approx(0.0, abs=1e-12)
    assert pp.time_averaged_l2({k: v for k, v in data.items()
                                if k != "full_profile_u"}) is None
    bad = dict(data, full_profile_u=data["full_profile_u"][:, :3])
    assert pp.time_averaged_l2(bad) is None
