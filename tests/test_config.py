"""Config layer tests: INI parsing rules + derived-parameter golden values.

Golden values computed by hand from the reference formulas
(SPH_Poiseuille.m:62-91) at the shipped config.ini defaults.
"""

import math

import pytest

from sph_poiseuille_flow_tpu.config import (
    ConfigError, derive_config, get_ini_numeric, parse_ini_text)

DEFAULT_INI = """
# comment
[physical]
DL = 3.0          # length
DH = 1.0
dp = 0.05
rho0 = 1.0        ; trailing semicolon comment
mu = 0.1
U_bulk = 0.666667
c_f = 15.0

[simulation]
end_time = 20.0
output_interval = 1.0
sort_interval = 100
restart_from_file = 0
"""


def default_cfg(**kw):
    ini = parse_ini_text(DEFAULT_INI)
    kwargs = dict(
        DL=get_ini_numeric(ini, "physical", "DL"),
        DH=get_ini_numeric(ini, "physical", "DH"),
        dp=get_ini_numeric(ini, "physical", "dp"),
        rho0=get_ini_numeric(ini, "physical", "rho0"),
        mu=get_ini_numeric(ini, "physical", "mu"),
        U_bulk=get_ini_numeric(ini, "physical", "U_bulk"),
        c_f=get_ini_numeric(ini, "physical", "c_f"),
        end_time=get_ini_numeric(ini, "simulation", "end_time"),
        output_interval=get_ini_numeric(ini, "simulation", "output_interval"),
        sort_interval=100, restart_from_file=False,
    )
    kwargs.update(kw)
    return derive_config(**kwargs)


class TestParseIni:
    def test_sections_and_values(self):
        ini = parse_ini_text(DEFAULT_INI)
        assert ini["physical"]["DL"] == 3.0
        assert ini["physical"]["rho0"] == 1.0  # trailing ';' comment stripped
        assert ini["simulation"]["sort_interval"] == 100.0

    def test_trailing_hash_comment(self):
        ini = parse_ini_text("[s]\nk = 1.5 # note\n")
        assert ini["s"]["k"] == 1.5

    def test_string_value_kept(self):
        ini = parse_ini_text("[s]\nk = hello\n")
        assert ini["s"]["k"] == "hello"

    def test_key_outside_section_errors(self):
        with pytest.raises(ConfigError):
            parse_ini_text("k = 1\n")

    def test_bad_section_name_errors(self):
        with pytest.raises(ConfigError):
            parse_ini_text("[bad name]\n")

    def test_line_without_equals_ignored(self):
        ini = parse_ini_text("[s]\njunk line\nk = 2\n")
        assert ini["s"]["k"] == 2.0

    def test_missing_key_errors(self):
        ini = parse_ini_text("[s]\nk = 2\n")
        with pytest.raises(ConfigError):
            get_ini_numeric(ini, "s", "absent")
        with pytest.raises(ConfigError):
            get_ini_numeric(ini, "absent", "k")

    def test_non_numeric_errors(self):
        ini = parse_ini_text("[s]\nk = hello\n")
        with pytest.raises(ConfigError):
            get_ini_numeric(ini, "s", "k")


class TestDerived:
    def test_golden_defaults(self):
        cfg = default_cfg()
        assert cfg.DL == pytest.approx(3.0)
        assert cfg.DH == pytest.approx(1.0)
        # g = 12*mu*U_bulk/(rho0*DH^2)
        assert cfg.gravity_g == pytest.approx(12.0 * 0.1 * 0.666667)
        assert cfg.U_max == pytest.approx(1.5 * 0.666667)
        assert cfg.h == pytest.approx(0.065)
        # cutoff_depth = ceil(2.6)*dp = 3dp; wall = max(4dp, 3dp) = 4dp
        assert cfg.cutoff_depth == pytest.approx(0.15)
        assert cfg.wall_thickness == pytest.approx(0.2)
        assert cfg.transport_coeff == 0.30
        assert cfg.p0 == pytest.approx(225.0)       # rho0*c_f^2
        assert cfg.inv_sigma0 == pytest.approx(0.0025)
        assert cfg.nu == pytest.approx(0.1)
        assert cfg.periodic_buffer == 0.0
        assert cfg.tau_target == pytest.approx(cfg.gravity_g * 0.5)

    def test_geometry_snapping(self):
        cfg = default_cfg(DL=3.01, DH=0.99)
        assert cfg.DL == pytest.approx(round(3.01 / 0.05) * 0.05)
        assert cfg.DH == pytest.approx(round(0.99 / 0.05) * 0.05)

    def test_signature_format(self):
        cfg = default_cfg()
        sig = cfg.signature
        assert sig.startswith("DL=3|DH=1|dp=0.05|rho0=1|mu=0.1|Ub=0.666667|")
        assert sig.endswith("|wall=thick-wall-noslip-dual-dt")
        assert "si=100" in sig

    def test_sort_interval_validation(self):
        with pytest.raises(ConfigError):
            default_cfg(sort_interval=0)

    def test_cutoff_vs_domain_validation(self):
        # 2h >= DL/2 must be rejected (minimum-image breaks)
        with pytest.raises(ConfigError):
            default_cfg(DL=0.25)

    def test_analytic_profile(self):
        cfg = default_cfg()
        # max of u(y) at y = DH/2 equals g*DH^2/(8 nu) = 1.5*U_bulk
        u_center = cfg.analytic_u(cfg.DH / 2)
        assert u_center == pytest.approx(cfg.U_max, rel=1e-12)

    def test_n_bins(self):
        assert default_cfg().n_bins == 20
        assert default_cfg(dp=0.025).n_bins == 40


class TestLoadConfigOverrides:
    """--set override validation: unknown (section, key) pairs must error
    instead of being silently dropped (a wrong-section typo like
    ``physical.end_time`` used to leave end_time at the file value)."""

    def _write_ini(self, tmp_path):
        p = tmp_path / "config.ini"
        p.write_text(DEFAULT_INI)
        return str(p)

    def test_valid_override_applies(self, tmp_path):
        from sph_poiseuille_flow_tpu.config import load_config
        cfg = load_config(self._write_ini(tmp_path),
                          ini_overrides={"simulation": {"end_time": 0.1},
                                         "physical": {"dp": 0.025}})
        assert cfg.end_time == pytest.approx(0.1)
        assert cfg.dp == pytest.approx(0.025)

    def test_wrong_section_errors_with_hint(self, tmp_path):
        from sph_poiseuille_flow_tpu.config import load_config
        with pytest.raises(ConfigError, match=r"simulation\.end_time"):
            load_config(self._write_ini(tmp_path),
                        ini_overrides={"physical": {"end_time": 0.1}})

    def test_unknown_key_errors(self, tmp_path):
        from sph_poiseuille_flow_tpu.config import load_config
        with pytest.raises(ConfigError, match="unknown key"):
            load_config(self._write_ini(tmp_path),
                        ini_overrides={"simulation": {"endtime": 0.1}})

    def test_unknown_section_errors(self, tmp_path):
        from sph_poiseuille_flow_tpu.config import load_config
        with pytest.raises(ConfigError, match="unknown section"):
            load_config(self._write_ini(tmp_path),
                        ini_overrides={"engine": {"rebuild_every": 8}})


class TestPerfKnobThreading:
    """The fused-engine perf knobs are first-class config (round-5): a
    validated configuration is reproducible from config file + CLI alone.
    geom_cache/geom_kcut/fused_rows ride GridSpec into the trace-time
    layout decisions (ops/fused_cell.cache_plan / use_rows); env vars
    keep override power for probing."""

    def _spec(self, **cfg_kw):
        from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
        from sph_poiseuille_flow_tpu.ops import neighbors as nbr
        cfg = default_cfg(dp=0.05, **cfg_kw)
        return nbr.make_grid_spec(cfg, build_scene(cfg))

    def test_knobs_ride_the_grid_spec(self):
        spec = self._spec(geom_cache="ring", geom_kcut=4, fused_rows="1")
        assert (spec.geom_cache, spec.geom_kcut, spec.fused_rows) == \
            ("ring", 4, "1")

    def test_cache_plan_honors_config_knob(self, monkeypatch):
        from sph_poiseuille_flow_tpu.ops import fused_cell as fc
        monkeypatch.delenv("SPH_GEOM_CACHE", raising=False)
        spec = self._spec(geom_cache="none")
        assert fc.cache_plan(spec, "float32") == ("none", 0)
        spec = self._spec(geom_cache="ring")
        assert fc.cache_plan(spec, "float32")[0] == "ring"

    def test_env_still_overrides_config(self, monkeypatch):
        from sph_poiseuille_flow_tpu.ops import fused_cell as fc
        spec = self._spec(geom_cache="ring")
        monkeypatch.setenv("SPH_GEOM_CACHE", "none")
        assert fc.cache_plan(spec, "float32") == ("none", 0)

    def test_use_rows_honors_config_knob(self, monkeypatch):
        from sph_poiseuille_flow_tpu.ops import fused_cell as fc
        monkeypatch.delenv("SPH_FUSED_ROWS", raising=False)
        assert fc.use_rows(self._spec(fused_rows="1"), "float32") is True
        assert fc.use_rows(self._spec(fused_rows="0"), "float32") is False

    def test_cli_flags_reach_the_config(self, tmp_path):
        import argparse
        from sph_poiseuille_flow_tpu.config import load_config
        p = tmp_path / "config.ini"
        p.write_text(DEFAULT_INI)
        cfg = load_config(str(p), geom_cache="partial", geom_kcut=6,
                          sub_steps=8, fused_rows="0", celly_margin=0.02,
                          plan_r=2)
        assert cfg.geom_cache == "partial"
        assert cfg.geom_kcut == 6
        assert cfg.sub_steps == 8
        assert cfg.fused_rows == "0"
        assert cfg.celly_margin == pytest.approx(0.02)
        assert cfg.plan_r == 2

    def test_plan_r_rides_the_grid_spec(self, monkeypatch):
        from sph_poiseuille_flow_tpu.ops import fused_cell as fc
        monkeypatch.delenv("SPH_PLAN_R", raising=False)
        spec = self._spec(plan_r=2)
        assert spec.plan_r == 2
        assert fc.plan(spec)[0] == 2
        # env keeps override power over the config knob
        monkeypatch.setenv("SPH_PLAN_R", "1")
        assert fc.plan(spec)[0] == 1

    def test_plan_r_auto_rule(self, monkeypatch):
        """nx >= 100 -> R=1 (the round-5 per-row-occupancy pick); narrow
        grids keep the padded-lane cost model (docs/SCALING.md R-sweep)."""
        import dataclasses

        from sph_poiseuille_flow_tpu.ops import fused_cell as fc
        monkeypatch.delenv("SPH_PLAN_R", raising=False)
        spec = self._spec()
        wide = dataclasses.replace(spec, nx=100, ny=40)
        assert fc.plan(wide) == (1, 100, 40, 40)
        narrow = dataclasses.replace(spec, nx=40, ny=18)
        assert fc.plan(narrow)[0] == 3
