"""CLI smoke test: drive the real command-line surface end to end on a
tiny preset (subprocess, CPU platform)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.heavy
def test_cli_end_to_end(tmp_path):
    ini = tmp_path / "tiny.ini"
    ini.write_text(
        "[physical]\nDL = 1.0\nDH = 0.5\ndp = 0.05\nrho0 = 1.0\nmu = 0.4\n"
        "U_bulk = 0.666667\nc_f = 15.0\n"
        "[simulation]\nend_time = 0.2\noutput_interval = 0.1\n"
        "sort_interval = 100\nrestart_from_file = 0\n")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        SPH_RESULT_PNG_OVERRIDE=str(tmp_path / "r.png"),
        SPH_PROFILE_PNG_OVERRIDE=str(tmp_path / "p.png"),
        SPH_POSTPROCESS_MAT_OVERRIDE=str(tmp_path / "post.npz"),
        SPH_RESTART_PATH_OVERRIDE=str(tmp_path / "restart.npz"),
    )
    r = subprocess.run(
        [sys.executable, "-m", "sph_poiseuille_flow_tpu.run",
         "--config", str(ini), "--set", "physical.mu=0.4"],
        env=env, capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "L2 relative error" in r.stdout, r.stdout + r.stderr
    assert "throughput" in r.stdout
    # a 0.2 s run is undeveloped: the verdict must be FAILED with exit 1
    assert "validation FAILED" in r.stdout
    assert r.returncode == 1
    assert (tmp_path / "r.png").exists()
    assert (tmp_path / "restart.npz").exists()

    # standalone postprocess entry point on the produced handoff
    r2 = subprocess.run(
        [sys.executable, "-m", "sph_poiseuille_flow_tpu.run",
         "--postprocess-only", str(tmp_path / "post.npz")],
        env=env, capture_output=True, text=True, timeout=120)
    assert "L2 relative error" in r2.stdout


@pytest.mark.heavy
def test_f64_interval_scalars_not_truncated(tmp_path):
    """--dtype float64: the driver's host-side interval/t scalars must
    enter the device at float64 (the reference is f64 throughout — MATLAB
    doubles). A silent np.float32 cast of the interval puts a ~1.5e-9
    absolute error on a 0.1 s interval, which the per-step dt rows expose:
    the loop's final remainder step lands the clock EXACTLY on the output
    point (stepper._t_add Kahan clock), so the dts must sum back to the
    f64 interval to f64 precision."""
    import math

    import numpy as np

    from sph_poiseuille_flow_tpu.simulation import (Simulation,
                                                    SimulationPaths)
    from test_config import default_cfg

    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=0.1,
                      output_interval=0.1, dtype="float64",
                      step_log_every=1)
    paths = SimulationPaths(
        restart=str(tmp_path / "restart.npz"),
        result_png=str(tmp_path / "r.png"),
        profile_evolution_png=str(tmp_path / "p.png"),
        postprocess_npz=str(tmp_path / "post.npz"))
    sim = Simulation(cfg, paths, log=lambda s: None)
    captured = {}
    orig = sim.engine.run_interval

    def spy(state, cands, geom, interval, **kw):
        captured["interval"] = np.asarray(interval)
        captured["t_base"] = np.asarray(kw.get("t_base"))
        res = orig(state, cands, geom, interval, **kw)
        captured["res"] = res
        return res

    sim.engine.run_interval = spy
    sim.run()
    assert captured["interval"].dtype == np.float64
    assert captured["t_base"].dtype == np.float64
    res = captured["res"]
    n = int(res.step_log_n)
    assert n == int(res.n_steps)
    dts = np.asarray(res.step_log[:n, 2], np.float64)
    assert res.step_log.dtype == np.float64
    # f32-truncated interval would miss 0.1 by ~1.49e-9 here
    assert abs(math.fsum(dts) - 0.1) < 1e-12


def test_resolve_engine_auto():
    """engine="auto" maps to cellgrid off-TPU and for float64, and passes
    explicit engine names through unchanged."""
    from sph_poiseuille_flow_tpu.stepper import resolve_engine_name
    import jax

    from test_config import default_cfg

    cfg = default_cfg()
    assert cfg.engine == "auto"
    resolved = resolve_engine_name(cfg)
    if jax.default_backend() == "tpu":
        assert resolved == "pallas"
    else:
        assert resolved == "cellgrid"
    import dataclasses
    cfg64 = dataclasses.replace(cfg, dtype="float64")
    assert resolve_engine_name(cfg64) == "cellgrid"
    for name in ("cellgrid", "pallas", "gather"):
        assert resolve_engine_name(
            dataclasses.replace(cfg, engine=name)) == name


def test_calibrated_flag_sets_wall_visc_factor(tmp_path, monkeypatch):
    """--calibrated is shorthand for the measured-optimum wall factor
    4.35 (docs/VALIDATION.md); without it the default stays the
    reference-exact 4.0 (sph_physics_mex.c:383-388)."""
    from sph_poiseuille_flow_tpu import run as run_mod

    ini = tmp_path / "tiny.ini"
    ini.write_text(
        "[physical]\nDL = 1.0\nDH = 0.5\ndp = 0.05\nrho0 = 1.0\nmu = 0.4\n"
        "U_bulk = 0.666667\nc_f = 15.0\n"
        "[simulation]\nend_time = 0.2\noutput_interval = 0.1\n"
        "sort_interval = 100\nrestart_from_file = 0\n")

    captured = {}

    class StubSim:
        def __init__(self, cfg, paths, mesh_devices=None):
            captured["cfg"] = cfg

        def run(self):
            return {"particle_steps_per_sec": 0.0, "step": 0,
                    "passed": True}

    monkeypatch.setattr(run_mod, "Simulation", StubSim)
    assert run_mod.main(["--config", str(ini), "--calibrated"]) == 0
    assert captured["cfg"].wall_visc_factor == 4.35
    assert run_mod.main(["--config", str(ini)]) == 0
    assert captured["cfg"].wall_visc_factor == 4.0


def test_lane_pack_nx_flag_reaches_config(tmp_path, monkeypatch):
    """--lane-pack-nx forces the fused-engine grid column count (0 =
    cost-model pick stays the default); the knob must reach the derived
    config so make_grid_spec(lane_pack=True) honors it."""
    from sph_poiseuille_flow_tpu import run as run_mod

    ini = tmp_path / "tiny.ini"
    ini.write_text(
        "[physical]\nDL = 1.0\nDH = 0.5\ndp = 0.05\nrho0 = 1.0\nmu = 0.4\n"
        "U_bulk = 0.666667\nc_f = 15.0\n"
        "[simulation]\nend_time = 0.2\noutput_interval = 0.1\n"
        "sort_interval = 100\nrestart_from_file = 0\n")

    captured = {}

    class StubSim:
        def __init__(self, cfg, paths, mesh_devices=None):
            captured["cfg"] = cfg

        def run(self):
            return {"particle_steps_per_sec": 0.0, "step": 0,
                    "passed": True}

    monkeypatch.setattr(run_mod, "Simulation", StubSim)
    assert run_mod.main(["--config", str(ini), "--lane-pack-nx", "7"]) == 0
    assert captured["cfg"].lane_pack_nx == 7
    assert run_mod.main(["--config", str(ini)]) == 0
    assert captured["cfg"].lane_pack_nx == 0
