"""Cubic-spline kernel golden tests (sph_neighbor_search_mex.c:115-133)."""

import math

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.ops.kernels import cubic_spline, sigma_2d, w0


H = 0.065


def ref_kernel(r, h):
    sigma = 10.0 / (7.0 * math.pi * h * h)
    q = r / h
    if q < 1.0:
        return (sigma * (1 - 1.5 * q * q + 0.75 * q ** 3),
                sigma * (-3 * q + 2.25 * q * q) / h)
    if q < 2.0:
        tq = 2.0 - q
        return sigma * 0.25 * tq ** 3, -sigma * 0.75 * tq * tq / h
    return 0.0, 0.0


def test_w0():
    assert w0(H) == pytest.approx(10.0 / (7.0 * math.pi * H * H))
    w, dw = cubic_spline(np.float32(0.0), H)
    assert float(w) == pytest.approx(w0(H), rel=1e-6)
    assert float(dw) == pytest.approx(0.0, abs=1e-6)


def test_against_reference_formula():
    rs = np.linspace(0.0, 2.5 * H, 101)
    w, dw = cubic_spline(rs.astype(np.float32), H)
    for i, r in enumerate(rs):
        wr, dwr = ref_kernel(r, H)
        assert float(w[i]) == pytest.approx(wr, rel=2e-5, abs=1e-5)
        assert float(dw[i]) == pytest.approx(dwr, rel=2e-5, abs=1e-3)


def test_compact_support():
    w, dw = cubic_spline(np.float32(2.0 * H), H)
    assert float(w) == 0.0
    assert float(dw) == 0.0


def test_continuity_at_q1():
    eps = 1e-5 * H
    w_lo, dw_lo = cubic_spline(np.float64(H - eps), H)
    w_hi, dw_hi = cubic_spline(np.float64(H + eps), H)
    assert float(w_lo) == pytest.approx(float(w_hi), rel=1e-3)
    assert float(dw_lo) == pytest.approx(float(dw_hi), rel=1e-3)


def test_normalization_2d():
    # integral of W over the plane should be ~1 (midpoint rule)
    n = 400
    span = 2.0 * H
    g = (np.arange(n) + 0.5) / n * 2 * span - span
    X, Y = np.meshgrid(g, g)
    r = np.sqrt(X ** 2 + Y ** 2)
    w, _ = cubic_spline(r, H)
    cell = (2 * span / n) ** 2
    assert float(np.sum(np.asarray(w)) * cell) == pytest.approx(1.0, rel=1e-3)
