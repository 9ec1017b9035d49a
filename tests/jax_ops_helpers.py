"""Shared helpers bridging the oracle-style test data to the pure-row-math
JAX op API (ops take caller-gathered neighbor values)."""

import numpy as np

from sph_poiseuille_flow_tpu.ops import neighbors as nbr
from sph_poiseuille_flow_tpu.ops.density import (density_sums,
                                                 kernel_gradient_correction)


def build_cands_geom(cfg, scene, x32, y32, vol=None, wall_vx=None,
                     wall_vy=None):
    """Build (spec, cands, geom) from float32 positions."""
    spec = nbr.make_grid_spec(cfg, scene)
    n = scene.n_total
    f32 = np.float32
    mass = np.asarray(scene.mass, f32)
    wvx = np.zeros(n, f32) if wall_vx is None else np.asarray(wall_vx, f32)
    wvy = np.zeros(n, f32) if wall_vy is None else np.asarray(wall_vy, f32)
    cands = nbr.build_candidates(spec, x32, y32, mass, wvx, wvy)
    vol = mass if vol is None else np.asarray(vol, f32)
    geom = nbr.compute_geometry(spec, cands, x32, y32, vol)
    return spec, cands, geom


def take_j(cands, *arrays):
    """NumPy equivalent of the engine's packed gather."""
    j = np.asarray(cands.jsafe)
    return tuple(np.asarray(a)[j] for a in arrays)


def full_density(spec, geom, cands, mass, rho0, inv_sigma0):
    """density_sums + KGC with the intermediate vol_j gather, mirroring
    Engine._step. Returns (rho, vol, b11, b12, b21, b22)."""
    rho, vol = density_sums(spec, geom, cands, mass, rho0, inv_sigma0)
    (vol_j,) = take_j(cands, vol)
    b11, b12, b21, b22 = kernel_gradient_correction(spec, geom, vol_j)
    return rho, vol, b11, b12, b21, b22
