"""Neighbor engine validation against a brute-force O(n^2) periodic search.

This is the subsystem both reference fixes live in (periodic ghost + dedup,
sph_neighbor_search_mex.c:267-303) — validated here pair-for-pair, including
seam particles, against an independent NumPy implementation.
"""

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.ops import neighbors as nbr
from sph_poiseuille_flow_tpu.stepper import initial_state

from test_config import default_cfg


def brute_force_pairs(x, y, n_fluid, DL, cutoff):
    """All directed (i fluid, j any) pairs with min-image dx, r < cutoff."""
    pairs = {}
    n = x.size
    for i in range(n_fluid):
        for j in range(n):
            if j == i:
                continue
            dx = x[i] - x[j]
            dx -= DL * np.round(dx / DL)
            dy = y[i] - y[j]
            r2 = dx * dx + dy * dy
            if 1e-24 < r2 < cutoff * cutoff:
                pairs[(i, j)] = (dx, dy, np.sqrt(r2))
    return pairs


def extract_cache_pairs(spec, idx, cache):
    """Valid directed pairs from the dense cache (idx unused; kept for
    signature symmetry with build_cache outputs)."""
    mask = np.asarray(cache.mask_f + cache.mask_w) > 0
    dx = np.asarray(cache.dx)
    dy = np.asarray(cache.dy)
    r = np.asarray(cache.r)
    out = {}
    for i in range(spec.n_fluid):
        for c in np.nonzero(mask[i])[0]:
            j = int(np.asarray(cache.jsafe)[i, c])
            assert (i, j) not in out, f"duplicate pair ({i},{j})"
            out[(i, j)] = (dx[i, c], dy[i, c], r[i, c])
    return out


@pytest.mark.parametrize("seed,n_jitter", [(0, 0), (1, 1), (2, 2)])
def test_matches_brute_force(seed, n_jitter):
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    scene = build_scene(cfg)
    rng = np.random.default_rng(seed)
    x = scene.x.copy()
    y = scene.y.copy()
    if n_jitter:
        # jitter fluid particles (including across the periodic seam)
        x[:scene.n_fluid] += rng.uniform(-0.4, 0.4, scene.n_fluid) * cfg.dp * n_jitter
        y[:scene.n_fluid] += rng.uniform(-0.4, 0.4, scene.n_fluid) * cfg.dp * n_jitter
        x[:scene.n_fluid] = np.mod(x[:scene.n_fluid], cfg.DL)

    spec = nbr.make_grid_spec(cfg, scene)
    xj = np.asarray(x, np.float32)
    yj = np.asarray(y, np.float32)
    idx, cache, overflow = nbr.build_cache(spec, xj, yj)
    assert not bool(overflow)

    got = extract_cache_pairs(spec, idx, cache)
    want = brute_force_pairs(np.asarray(xj, np.float64),
                             np.asarray(yj, np.float64),
                             scene.n_fluid, cfg.DL, spec.cutoff)

    # allow disagreement only for pairs within float32 noise of the cutoff
    edge = 1e-4 * spec.cutoff
    for key in set(want) - set(got):
        assert abs(want[key][2] - spec.cutoff) < edge, \
            f"missing pair {key} at r={want[key][2]}"
    for key in set(got) - set(want):
        assert abs(got[key][2] - spec.cutoff) < edge, \
            f"spurious pair {key} at r={got[key][2]}"
    for key in set(got) & set(want):
        np.testing.assert_allclose(got[key], want[key], rtol=1e-4, atol=1e-6)


def test_seam_symmetry():
    """Fluid-fluid pairs appear in both directions with negated geometry."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    scene = build_scene(cfg)
    spec = nbr.make_grid_spec(cfg, scene)
    idx, cache, _ = nbr.build_cache(
        spec, np.asarray(scene.x, np.float32), np.asarray(scene.y, np.float32))
    got = extract_cache_pairs(spec, idx, cache)
    for (i, j), (dx, dy, r) in got.items():
        if j < spec.n_fluid:
            assert (j, i) in got
            rdx, rdy, rr = got[(j, i)]
            np.testing.assert_allclose([rdx, rdy, rr], [-dx, -dy, r],
                                       rtol=1e-5, atol=1e-7)


def test_pair_count_uniform_lattice():
    """On the default lattice every interior fluid particle must see the
    full kernel-support stencil; spot-check neighbor counts."""
    cfg = default_cfg()
    scene = build_scene(cfg)
    spec = nbr.make_grid_spec(cfg, scene)
    idx, cache, overflow = nbr.build_cache(
        spec, np.asarray(scene.x, np.float32), np.asarray(scene.y, np.float32))
    assert not bool(overflow)
    counts = np.asarray(cache.mask_f + cache.mask_w).sum(axis=1)
    # dp lattice, cutoff 2.6 dp: 20 neighbors within radius for every
    # interior particle (5x5 block minus corners minus self)
    assert counts.max() == 20
    assert counts.min() > 0
    # interior particles (y well inside) all have exactly 20
    yf = scene.y[:scene.n_fluid]
    interior = (yf > 3 * cfg.dp) & (yf < cfg.DH - 3 * cfg.dp)
    assert np.all(counts[interior] == 20)


def test_overflow_detection():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0, cell_capacity=2)
    scene = build_scene(cfg)
    spec = nbr.make_grid_spec(cfg, scene)
    _, _, overflow = nbr.build_cache(
        spec, np.asarray(scene.x, np.float32), np.asarray(scene.y, np.float32))
    assert bool(overflow)


def test_skin_gives_same_interaction_set():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    cfg_skin = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0,
                           neighbor_skin=0.5 * 0.05, cell_capacity=24)
    scene = build_scene(cfg)
    x = np.asarray(scene.x, np.float32)
    y = np.asarray(scene.y, np.float32)
    spec_a = nbr.make_grid_spec(cfg, scene)
    spec_b = nbr.make_grid_spec(cfg_skin, scene)
    _, cache_a, _ = nbr.build_cache(spec_a, x, y)
    _, cache_b, _ = nbr.build_cache(spec_b, x, y)
    pairs_a = extract_cache_pairs(spec_a, None, cache_a)
    pairs_b = extract_cache_pairs(spec_b, None, cache_b)
    assert set(pairs_a) == set(pairs_b)
