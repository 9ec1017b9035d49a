"""Neighbor engine validation against a brute-force O(n^2) periodic search.

This is the subsystem both reference fixes live in (periodic ghost + dedup,
sph_neighbor_search_mex.c:267-303) — validated here pair-for-pair, including
seam particles, against an independent NumPy implementation. Also covers
capacity overflow flags, candidate compaction, skin-based candidate reuse,
and the displacement guard.
"""

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.ops import neighbors as nbr

from jax_ops_helpers import build_cands_geom
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


def extract_pairs(spec, cands, geom):
    """Valid directed pairs from the dense compacted rows."""
    mask = np.asarray(geom.mask_f + geom.mask_w) > 0
    dx = np.asarray(geom.dx)
    dy = np.asarray(geom.dy)
    r = np.asarray(geom.r)
    jsafe = np.asarray(cands.jsafe)
    out = {}
    for i in range(spec.n_fluid):
        for c in np.nonzero(mask[i])[0]:
            j = int(jsafe[i, c])
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

    xj = np.asarray(x, np.float32)
    yj = np.asarray(y, np.float32)
    spec, cands, geom = build_cands_geom(cfg, scene, xj, yj)
    assert not bool(cands.overflow)

    got = extract_pairs(spec, cands, geom)
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
    spec, cands, geom = build_cands_geom(
        cfg, scene, np.asarray(scene.x, np.float32),
        np.asarray(scene.y, np.float32))
    got = extract_pairs(spec, cands, geom)
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
    spec, cands, geom = build_cands_geom(
        cfg, scene, np.asarray(scene.x, np.float32),
        np.asarray(scene.y, np.float32))
    assert not bool(cands.overflow)
    counts = np.asarray(geom.mask_f + geom.mask_w).sum(axis=1)
    # dp lattice, cutoff 2.6 dp: 20 neighbors within radius for every
    # interior particle (5x5 block minus corners minus self)
    assert counts.max() == 20
    assert counts.min() > 0
    yf = scene.y[:scene.n_fluid]
    interior = (yf > 3 * cfg.dp) & (yf < cfg.DH - 3 * cfg.dp)
    assert np.all(counts[interior] == 20)


def test_cell_overflow_detection():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0, cell_capacity=2)
    scene = build_scene(cfg)
    spec, cands, geom = build_cands_geom(
        cfg, scene, np.asarray(scene.x, np.float32),
        np.asarray(scene.y, np.float32))
    assert bool(cands.overflow)


def test_compaction_overflow_detection():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0,
                      neighbor_capacity=4)
    scene = build_scene(cfg)
    spec, cands, geom = build_cands_geom(
        cfg, scene, np.asarray(scene.x, np.float32),
        np.asarray(scene.y, np.float32))
    assert bool(cands.overflow)


def test_skin_gives_same_interaction_set():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0)
    cfg_skin = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0,
                           neighbor_skin=0.5 * 0.05, cell_capacity=24,
                           neighbor_capacity=64)
    scene = build_scene(cfg)
    x = np.asarray(scene.x, np.float32)
    y = np.asarray(scene.y, np.float32)
    spec_a, cands_a, geom_a = build_cands_geom(cfg, scene, x, y)
    spec_b, cands_b, geom_b = build_cands_geom(cfg_skin, scene, x, y)
    pairs_a = extract_pairs(spec_a, cands_a, geom_a)
    pairs_b = extract_pairs(spec_b, cands_b, geom_b)
    assert set(pairs_a) == set(pairs_b)


def test_displacement_guard():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0,
                      neighbor_skin=0.5 * 0.05, cell_capacity=24,
                      neighbor_capacity=64)
    scene = build_scene(cfg)
    x = np.asarray(scene.x, np.float32)
    y = np.asarray(scene.y, np.float32)
    spec, cands, geom = build_cands_geom(cfg, scene, x, y)
    # small move: within skin/2 -> no trip
    x_small = x.copy()
    x_small[0] += 0.4 * spec.skin / 2
    assert not bool(nbr.displacement_exceeded(spec, cands, x_small, y))
    # large move: beyond skin/2 -> trip
    x_big = x.copy()
    x_big[0] += 1.1 * spec.skin / 2
    assert bool(nbr.displacement_exceeded(spec, cands, x_big, y))
    # periodic wrap must not look like a huge displacement
    x_wrap = x.copy()
    x_wrap[0] = np.float32(np.mod(x_wrap[0] - 0.4 * spec.skin / 2, cfg.DL))
    assert not bool(nbr.displacement_exceeded(spec, cands, x_wrap, y))


def test_step_displacement_guard():
    """The fatal (single-step) drift check: trips only when ONE step's
    motion crosses half the skin, min-image-wrapped."""
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0,
                      neighbor_skin=0.5 * 0.05, cell_capacity=24,
                      neighbor_capacity=64)
    scene = build_scene(cfg)
    x = np.asarray(scene.x, np.float32)
    y = np.asarray(scene.y, np.float32)
    spec, _, _ = build_cands_geom(cfg, scene, x, y)
    x_small = x.copy()
    x_small[0] += 0.4 * spec.skin / 2
    assert not bool(nbr.step_displacement_exceeded(spec, x, y, x_small, y))
    x_big = x.copy()
    x_big[0] += 1.1 * spec.skin / 2
    assert bool(nbr.step_displacement_exceeded(spec, x, y, x_big, y))
    # a wrap across the seam is a SMALL min-image move, not a DL-sized one
    x_wrap = x.copy()
    x_wrap[0] = np.float32(np.mod(x_wrap[0] - 0.4 * spec.skin / 2, cfg.DL))
    assert not bool(nbr.step_displacement_exceeded(spec, x, y, x_wrap, y))


def test_accumulated_drift_self_heals_with_early_rebuild():
    """A stale-list ACCUMULATED drift crossing must not trip the fatal
    guard: the per-step engines heal it with an early rebuild (the
    analogue of the fused engine's sub-chunk rollback). Feed a step whose
    input positions already sit > skin/2 from the candidate refs but whose
    own motion is small: guard stays False and the returned candidates
    are freshly rebuilt (refs == the new positions)."""
    from sph_poiseuille_flow_tpu.stepper import Engine, initial_state
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=1.0,
                      neighbor_skin=0.5 * 0.05, cell_capacity=24,
                      neighbor_capacity=64, rebuild_every=8)
    scene = build_scene(cfg)
    eng = Engine(cfg, scene)
    state, cands, geom, ovf = eng.init(initial_state(cfg, scene))
    assert not bool(ovf)
    # drift particle 0 past the half-skin budget relative to the refs
    x_d = state.x.at[0].add(0.8 * cfg.neighbor_skin)
    state = state._replace(x=x_d)
    geom = nbr.compute_geometry(eng.spec, cands, state.x, state.y,
                                state.vol)
    assert bool(nbr.displacement_exceeded(eng.spec, cands, state.x,
                                          state.y))
    # step_idx=1: NOT a scheduled rebuild step (1 % 8 != 0)
    new_state, cands2, _, dt, ovf2, guard, _, _ = eng.step(
        state, cands, geom, step_idx=1, remain=1e-4)
    assert not bool(guard), "accumulated drift must self-heal, not trip"
    assert not bool(ovf2)
    # healed: candidates were rebuilt at the new positions
    np.testing.assert_allclose(np.asarray(cands2.ref_x),
                               np.asarray(new_state.x), rtol=0, atol=0)


class TestLanePackedNxPicker:
    """Lock the auto-nx cost model's picks for the validated grids: the
    integer-ratio shipping config, the legacy-margin fallback combos, the
    force knob, and the integer-ratio generalization across dp."""

    @staticmethod
    def _spec(dp, K, skin_mult, **kw):
        cfg = default_cfg(DL=3.0, DH=1.0, dp=dp, end_time=20.0,
                          engine="pallas", neighbor_skin=skin_mult * dp,
                          cell_capacity=K, **kw)
        scene = build_scene(cfg)
        return nbr.make_grid_spec(cfg, scene, lane_pack=True)

    def test_shipping_pick_dp025(self):
        # cell_x = 3dp exactly (occupancy-invariant under x translation):
        # pristine 9 slots, measured full-20 s max 12, K=14 with margin
        spec = self._spec(0.025, 14, 0.3)
        assert spec.nx == 40
        assert abs(spec.cell_x / 0.025 - 3.0) < 1e-9
        assert spec.K == 14

    def test_legacy_combo_preserved(self):
        # the historically validated K=18/skin=0.75dp grid must keep
        # resolving to nx=32 via the legacy +2-margin fallback pass
        spec = self._spec(0.025, 18, 0.75)
        assert spec.nx == 32

    def test_integer_ratio_generalizes(self):
        # the same K=14 integer-ratio family scales with resolution:
        # dp=0.01 -> nx=100 keeps cell_x = 3dp exactly
        spec = self._spec(0.01, 14, 0.3)
        assert spec.nx == 100
        assert abs(spec.cell_x / 0.01 - 3.0) < 1e-9

    def test_force_knob_clamped_to_nx_max(self):
        # lane_pack_nx is an escape hatch; it may never produce cells
        # narrower than the candidate cutoff
        spec = self._spec(0.025, 18, 0.75, lane_pack_nx=10_000)
        assert spec.cell_x >= spec.cand_cutoff - 1e-12
        forced = self._spec(0.025, 14, 0.3, lane_pack_nx=40)
        assert forced.nx == 40
