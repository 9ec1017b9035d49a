"""Scene tests: lattice/wall geometry golden checks vs the reference
layout (SPH_Poiseuille.m:93-125, build_shell_wall_particles.m)."""

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.config import ConfigError
from sph_poiseuille_flow_tpu.models.poiseuille import (
    build_scene, build_wall_particles, fluid_lattice)

from test_config import default_cfg


def test_fluid_lattice_counts_and_bounds():
    x, y = fluid_lattice(3.0, 1.0, 0.05)
    assert x.size == 60 * 20
    assert x.min() == pytest.approx(0.025)
    assert x.max() == pytest.approx(2.975)
    assert y.min() == pytest.approx(0.025)
    assert y.max() == pytest.approx(0.975)


def test_wall_layers():
    x, y, normal, measure, thick = build_wall_particles(3.0, 1.0, 0.05, 0.2)
    # 4 layers x 60 columns x 2 walls
    assert x.size == 4 * 60 * 2
    bottom = y < 0
    top = y > 1.0
    assert bottom.sum() == top.sum() == 240
    assert y[bottom].min() == pytest.approx(-0.175)
    assert y[bottom].max() == pytest.approx(-0.025)
    assert y[top].min() == pytest.approx(1.025)
    assert y[top].max() == pytest.approx(1.175)
    # normals point into the wall
    np.testing.assert_allclose(normal[:240], np.tile([0.0, -1.0], (240, 1)))
    np.testing.assert_allclose(normal[240:], np.tile([0.0, 1.0], (240, 1)))
    np.testing.assert_allclose(measure, 0.05)
    np.testing.assert_allclose(thick, 0.05)


def test_wall_thickness_must_divide():
    with pytest.raises(ConfigError):
        build_wall_particles(3.0, 1.0, 0.05, 0.21)


def test_scene_masses_and_layout():
    cfg = default_cfg()
    scene = build_scene(cfg)
    assert scene.n_fluid == 1200
    assert scene.n_wall == 480
    assert scene.n_total == 1680
    # fluid first, walls last
    assert np.all(scene.y[:scene.n_fluid] > 0)
    assert np.all((scene.y[scene.n_fluid:] < 0)
                  | (scene.y[scene.n_fluid:] > cfg.DH))
    np.testing.assert_allclose(scene.mass, cfg.rho0 * cfg.dp ** 2)
