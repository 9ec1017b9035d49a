"""Pallas-fused engine equivalence: PallasCellEngine must reproduce the
XLA cellgrid engine (kernels run in interpreter mode on CPU)."""

import numpy as np
import pytest

from sph_poiseuille_flow_tpu.models.poiseuille import build_scene
from sph_poiseuille_flow_tpu.stepper import (CellEngine, PallasCellEngine,
                                             initial_state, make_engine)

from test_config import default_cfg


@pytest.fixture(scope="module")
def engines():
    cfg = default_cfg(DL=1.0, DH=0.5, dp=0.05, end_time=0.5,
                      output_interval=0.25)
    scene = build_scene(cfg)
    return cfg, scene, CellEngine(cfg, scene), PallasCellEngine(cfg, scene)


def _jittered_state(cfg, scene, state0, seed=7):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    nf, n = scene.n_fluid, scene.n_total
    x = np.asarray(state0.x).copy()
    y = np.asarray(state0.y).copy()
    x[:nf] = np.mod(x[:nf] + rng.uniform(-0.35, 0.35, nf) * cfg.dp, cfg.DL)
    y[:nf] += rng.uniform(-0.35, 0.35, nf) * cfg.dp
    vx = np.zeros(n, np.float32)
    vy = np.zeros(n, np.float32)
    vx[:nf] = rng.normal(0, 0.4, nf)
    vy[:nf] = rng.normal(0, 0.1, nf)
    drho = np.zeros(n, np.float32)
    drho[:nf] = rng.normal(0, 0.05, nf)
    return state0._replace(x=jnp.asarray(x, jnp.float32),
                           y=jnp.asarray(y, jnp.float32),
                           vx=jnp.asarray(vx), vy=jnp.asarray(vy),
                           drho_dt=jnp.asarray(drho))


def test_dispatch():
    cfg = default_cfg(engine="pallas")
    scene = build_scene(cfg)
    assert isinstance(make_engine(cfg, scene), PallasCellEngine)


@pytest.mark.heavy
def test_init_and_jittered_step_equivalence(engines):
    cfg, scene, xla, pls = engines
    st = _jittered_state(cfg, scene, initial_state(cfg, scene))

    sa, la, ga, ova = xla.init(st)
    sp, lp, gp, ovp = pls.init(st)
    assert not bool(ova) and not bool(ovp)
    tols = {"p": dict(rtol=5e-3, atol=5e-4)}
    for name in ("rho", "vol", "b11", "b12", "b21", "b22", "p"):
        tol = tols.get(name, dict(rtol=2e-4, atol=2e-5))
        np.testing.assert_allclose(np.asarray(getattr(sp, name)),
                                   np.asarray(getattr(sa, name)),
                                   err_msg=f"init {name}", **tol)

    out_a = xla.step(sa, la, ga, remain=1.0)
    out_p = pls.step(sp, lp, gp, remain=1.0)
    st_a, st_p = out_a[0], out_p[0]
    assert float(out_p[3]) == pytest.approx(float(out_a[3]), rel=1e-6)
    tols = {"p": dict(rtol=1e-2, atol=2.5e-2),
            "drho_dt": dict(rtol=5e-3, atol=5e-3)}
    for name in st_a._fields:
        tol = tols.get(name, dict(rtol=2e-3, atol=5e-4))
        np.testing.assert_allclose(np.asarray(getattr(st_p, name)),
                                   np.asarray(getattr(st_a, name)),
                                   err_msg=name, **tol)
    # wall-shear monitor parity
    assert float(out_p[6]) == pytest.approx(float(out_a[6]), rel=1e-3,
                                            abs=1e-6)
    assert float(out_p[7]) == pytest.approx(float(out_a[7]), rel=1e-3,
                                            abs=1e-6)


@pytest.mark.heavy
def test_interval_equivalence(engines):
    cfg, scene, xla, pls = engines
    state0 = initial_state(cfg, scene)
    sa, la, ga, _ = xla.init(state0)
    sp, lp, gp, _ = pls.init(state0)
    ra = xla.run_interval(sa, la, ga, np.float32(0.05))
    rp = pls.run_interval(sp, lp, gp, np.float32(0.05))
    assert int(ra.n_steps) == int(rp.n_steps)
    assert not bool(rp.overflow)
    assert float(rp.v_max) == pytest.approx(float(ra.v_max), rel=1e-3,
                                            abs=1e-6)
    # pallas counts the step's own (pre-rebuild) pair set; on a short
    # interval the sets coincide
    assert int(rp.n_pairs) == int(ra.n_pairs)


@pytest.mark.heavy
@pytest.mark.parametrize("variant", [
    pytest.param({"SPH_FUSED_ROWS": "1"}, id="rows"),
    pytest.param({"SPH_FUSED_UNROLL": "2"}, id="unroll2"),
])
def test_alternate_loop_forms_step_equivalence(engines, monkeypatch,
                                               variant):
    """The measured-and-rejected kernel loop forms (candidate-row-outer
    'rows' mode; anchor-rank unroll) must stay numerically equivalent to
    the shipping slab form — they are kept as documented perf probes
    (docs/SCALING.md) and must not rot."""
    for k, v in variant.items():
        monkeypatch.setenv(k, v)
    cfg, scene, xla, _ = engines
    pls = PallasCellEngine(cfg, scene)   # fresh trace under the env
    st = _jittered_state(cfg, scene, initial_state(cfg, scene))
    sa, la, ga, _ = xla.init(st)
    sp, lp, gp, ovp = pls.init(st)
    assert not bool(ovp)
    out_a = xla.step(sa, la, ga, remain=1.0)
    out_p = pls.step(sp, lp, gp, remain=1.0)
    st_a, st_p = out_a[0], out_p[0]
    tols = {"p": dict(rtol=1e-2, atol=2.5e-2),
            "drho_dt": dict(rtol=5e-3, atol=5e-3)}
    for name in st_a._fields:
        tol = tols.get(name, dict(rtol=2e-3, atol=5e-4))
        np.testing.assert_allclose(np.asarray(getattr(st_p, name)),
                                   np.asarray(getattr(st_a, name)),
                                   err_msg=name, **tol)


def test_expand_exact_beyond_bf16():
    """_expand must reproduce candidate values EXACTLY (f32), not bf16.

    The one-hot lane-tiling matmul rides the MXU, whose default f32
    precision is a single bf16 pass (8 mantissa bits). Without
    precision=HIGHEST every candidate position/pid silently rounds to
    ~0.4% — invisible on CPU (XLA CPU dots are exact f32) but corrupting
    every pair distance on real TPU hardware. Values below are chosen to
    need >8 mantissa bits so a regression fails wherever the MXU default
    is in effect."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sph_poiseuille_flow_tpu.ops.fused_cell import _interpret

    K, bx = 4, 8
    rows = 9 * K
    rng = np.random.default_rng(3)
    # odd integers up to 2^13 and positions with full f32 mantissas: both
    # round under bf16
    v = np.where(rng.random((rows, bx)) < 0.5,
                 rng.integers(1, 8192, (rows, bx)) * 2 + 1,
                 rng.random((rows, bx)) * 3.0).astype(np.float32)

    def body(v_ref, o_ref):
        # one-hot lane-tiling matrix E[c, k*bx+c] = 1 (the retired
        # pallas_cell engine's candidate-expansion pattern, kept as the
        # minimal reproducer of the MXU default-precision trap)
        lane = jax.lax.broadcasted_iota(jnp.int32, (bx, K * bx), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (bx, K * bx), 0)
        E = (lane % bx == col).astype(v_ref.dtype)
        o_ref[:, :] = jnp.dot(v_ref[:, :], E,
                              preferred_element_type=v_ref.dtype,
                              precision=jax.lax.Precision.HIGHEST)

    out = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, K * bx), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(v))
    expect = np.concatenate([v] * K, axis=1)
    np.testing.assert_array_equal(np.asarray(out), expect)


@pytest.mark.heavy
@pytest.mark.parametrize("mode", ["ring", "none", "partial"])
def test_geom_cache_modes_bit_identical(monkeypatch, mode):
    """"ring" (the depth-4 wavefront schedule — ops/fused_cell.cache_mode's
    dp <= 0.01 fallback whose VMEM footprint is n_groups/4 smaller) must be
    BIT-identical to the full per-(group, k) cache: each (sweep, group)
    body sees exactly the same inputs, only the execution order of
    independent bodies changes. "none" (the recompute path) is
    ULP-equivalent, not bit-equal: the cache stores the dw*m1 / dw*mw
    PRODUCTS (and sweep 1's dw*Vol*mask write-back), whose association
    order differs from the recompute expression — measured 1-ULP
    differences on <0.1% of elements over a ~20-step interval.
    "partial" (rank-truncated ring: only k < k_cut cached, recompute
    tail — the dp=0.005 fallback) is likewise ULP-equivalent on the
    tail ranks' contributions. The tall domain yields 6+ row groups, so
    ring slots genuinely cycle (group 4 overwrites group 0's slot) and
    the wavefront ramp-up/steady/ramp-down phases are all on the
    compared path."""
    import jax.numpy as jnp

    import sph_poiseuille_flow_tpu.ops.fused_cell as fc

    cfg = default_cfg(DL=1.0, DH=5.0, dp=0.05, end_time=0.2,
                      output_interval=0.1, engine="pallas",
                      rebuild_every=8)
    scene = build_scene(cfg)
    s0 = initial_state(cfg, scene)

    monkeypatch.setenv("SPH_GEOM_CACHE", "full")
    full_eng = PallasCellEngine(cfg, scene)
    spec = full_eng.spec
    assert fc.plan(spec)[2] > fc._RING_DEPTH, \
        "test domain too shallow to cycle the ring"
    assert fc.cache_mode(spec, jnp.float32) == "full"
    s1, l1, g1, _ = full_eng.init(s0)
    r_full = full_eng.run_interval(s1, l1, g1, np.float32(0.005))
    # trace the single-step path while the env still says "full"
    # (cache_mode is read at trace time, which is the first call)
    o_full = full_eng.step(s1, l1, g1, remain=1.0)

    monkeypatch.setenv("SPH_GEOM_CACHE", mode)
    assert fc.cache_mode(spec, jnp.float32) == mode
    if mode == "partial":   # forced partial must genuinely split the loop
        kc = fc.cache_plan(spec, jnp.float32)[1]
        assert 2 <= kc < spec.K
    eng2 = PallasCellEngine(cfg, scene)   # fresh trace under the env
    s2, l2, g2, _ = eng2.init(s0)
    r2 = eng2.run_interval(s2, l2, g2, np.float32(0.005))

    assert int(r_full.n_steps) == int(r2.n_steps)
    assert int(r_full.n_pairs) == int(r2.n_pairs)

    def cmp(a, b, msg):
        a, b = np.asarray(a), np.asarray(b)
        if mode == "ring":
            np.testing.assert_array_equal(a, b, err_msg=msg)
        else:   # recompute (none / partial tail): ULP-level reassociation
            #       only (p amplifies a rho ULP by p0/rho0 = 225 -> atol
            #       covers it)
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-5,
                                       err_msg=msg)

    for name in r_full.state._fields:
        cmp(getattr(r2.state, name), getattr(r_full.state, name), name)
    cmp(r2.tau_bottom, r_full.tau_bottom, "tau_bottom")

    # the single-step path (_fused_call: grid-scheduled wavefront when
    # ring) must match too
    o2 = eng2.step(s2, l2, g2, remain=1.0)
    for name in o_full[0]._fields:
        cmp(getattr(o2[0], name), getattr(o_full[0], name),
            f"step {name}")


@pytest.mark.heavy
@pytest.mark.parametrize("forced_r", [1, 2])
def test_plan_r_bit_identical(monkeypatch, forced_r):
    """The row-group width R is a pure SCHEDULING choice: it sets the lane
    width L = R*nx and the occupancy-bound granularity (occl is a max over
    the R rows of a group), but every particle's candidate slab stacks the
    same 9K sub-rows in the same order and empty anchor ranks contribute
    exact zeros — so trajectories must be BIT-identical across R. This is
    the correctness basis for the round-5 R=1 shipping pick at dp<=0.01
    (per-row occupancy bounds measured +54% at dp=0.005, docs/SCALING.md):
    a forced R must reproduce the cost-model R's interval bit for bit,
    including the drift-guard/rollback schedule."""
    cfg = default_cfg(DL=1.0, DH=5.0, dp=0.05, end_time=0.2,
                      output_interval=0.1, engine="pallas",
                      rebuild_every=8)
    scene = build_scene(cfg)
    s0 = initial_state(cfg, scene)

    eng_auto = PallasCellEngine(cfg, scene)
    import sph_poiseuille_flow_tpu.ops.fused_cell as fc
    assert fc.plan(eng_auto.spec)[0] != forced_r, \
        "forced R must differ from the cost-model pick to test anything"
    s1, l1, g1, _ = eng_auto.init(s0)
    r_auto = eng_auto.run_interval(s1, l1, g1, np.float32(0.005))

    monkeypatch.setenv("SPH_PLAN_R", str(forced_r))
    eng_r = PallasCellEngine(cfg, scene)   # fresh trace under the env
    s2, l2, g2, _ = eng_r.init(s0)
    r2 = eng_r.run_interval(s2, l2, g2, np.float32(0.005))

    assert int(r_auto.n_steps) == int(r2.n_steps)
    for name in r_auto.state._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(r2.state, name)),
            np.asarray(getattr(r_auto.state, name)), err_msg=name)
    np.testing.assert_array_equal(np.asarray(r2.tau_bottom),
                                  np.asarray(r_auto.tau_bottom))


def test_cache_mode_resolution_shipping_grids():
    """Pin the auto (R, cache-mode) picks at the three bench grids (the
    shipping perf configs, docs/SCALING.md): dp=0.025 (nx=40) keeps the
    padded-cost row grouping (R=3) and fits the FULL per-(group, k)
    cache; dp=0.01 and dp=0.005 (nx >= 100) take the round-5 R=1 pick —
    per-row occupancy bounds, measured 6.1e7 / 6.2e7 psteps/s — whose
    small lane width makes the whole-K depth-4 RING VMEM-resident
    (17.5 / 35 MB). A silent flip either way is a perf or a compile
    regression."""
    import jax.numpy as jnp

    import sph_poiseuille_flow_tpu.ops.fused_cell as fc
    from sph_poiseuille_flow_tpu.config import derive_config

    for dp, want_r, want in ((0.025, 3, "full"), (0.01, 1, "ring"),
                             (0.005, 1, "ring")):
        nx3 = round(3.0 / (3.0 * dp))
        cfg = derive_config(
            DL=3.0, DH=1.0, dp=dp, rho0=1.0, mu=0.1, U_bulk=0.666667,
            c_f=15.0, end_time=20.0, output_interval=0.5,
            sort_interval=100, restart_from_file=False, engine="pallas",
            neighbor_skin=0.3 * dp, rebuild_every=128, cell_capacity=14,
            lane_pack_nx=nx3, neighbor_capacity=56)
        eng = PallasCellEngine(cfg, build_scene(cfg))
        assert fc.plan(eng.spec)[0] == want_r, \
            f"dp={dp}: row-group pick flipped from R={want_r}"
        mode, kc = fc.cache_plan(eng.spec, jnp.float32)
        assert mode == want, f"dp={dp}: cache_mode flipped from {want}"
        if want == "partial":
            assert 2 <= kc < eng.spec.K
            assert fc._cache_bytes(eng.spec, jnp.float32,
                                   fc._RING_DEPTH, kc) \
                <= fc._PARTIAL_CACHE_BUDGET
        else:   # budgeted estimate stays under the limit
            assert kc == eng.spec.K
            n_slots = (fc._RING_DEPTH if want == "ring"
                       else fc.plan(eng.spec)[2])
            assert fc._cache_bytes(eng.spec, jnp.float32, n_slots) \
                <= fc._RING_CACHE_BUDGET


@pytest.fixture(scope="module")
def engines_shipping():
    """Shipping-style lane-packed pick, shrunk to an interpret-affordable
    box: integer-ratio cells (cell_x = 3dp exactly) selected by the
    measured-margin pass of the cost model with K=14 — the same pick
    family as the dp=0.025 nx=40 TPU config (docs/SCALING.md). The other
    pallas tests only reach the legacy-margin fallback picks, so this is
    the one CPU test driving physics through a shipping-shape grid."""
    cfg = default_cfg(DL=1.2, DH=0.5, dp=0.05, end_time=0.5,
                      output_interval=0.25, neighbor_skin=0.015,
                      cell_capacity=14, rebuild_every=32)
    scene = build_scene(cfg)
    return cfg, scene, CellEngine(cfg, scene), PallasCellEngine(cfg, scene)


@pytest.mark.heavy
def test_shipping_pick_shape(engines_shipping):
    cfg, scene, xla, pls = engines_shipping
    spec = pls.spec
    assert spec.nx == 8 and spec.K == 14
    assert spec.cell_x / cfg.dp == pytest.approx(3.0)
    # integer-ratio cells widen beyond the candidate cutoff: the x drift
    # budget (cell_x - cutoff - also y-expansion margin) must be strictly
    # positive or candidate reuse would be unsound
    assert spec.skin_x > 0.0 and spec.skin_y > 0.0


@pytest.mark.heavy
def test_shipping_pick_step_equivalence(engines_shipping):
    cfg, scene, xla, pls = engines_shipping
    st = _jittered_state(cfg, scene, initial_state(cfg, scene))
    sa, la, ga, ova = xla.init(st)
    sp, lp, gp, ovp = pls.init(st)
    assert not bool(ova) and not bool(ovp)
    out_a = xla.step(sa, la, ga, remain=1.0)
    out_p = pls.step(sp, lp, gp, remain=1.0)
    st_a, st_p = out_a[0], out_p[0]
    assert float(out_p[3]) == pytest.approx(float(out_a[3]), rel=1e-6)
    tols = {"p": dict(rtol=1e-2, atol=2.5e-2),
            "drho_dt": dict(rtol=5e-3, atol=5e-3)}
    for name in st_a._fields:
        tol = tols.get(name, dict(rtol=2e-3, atol=5e-4))
        np.testing.assert_allclose(np.asarray(getattr(st_p, name)),
                                   np.asarray(getattr(st_a, name)),
                                   err_msg=name, **tol)


@pytest.mark.heavy
def test_shipping_pick_interval_equivalence(engines_shipping):
    cfg, scene, xla, pls = engines_shipping
    state0 = initial_state(cfg, scene)
    sa, la, ga, _ = xla.init(state0)
    sp, lp, gp, _ = pls.init(state0)
    ra = xla.run_interval(sa, la, ga, np.float32(0.03))
    rp = pls.run_interval(sp, lp, gp, np.float32(0.03))
    assert int(ra.n_steps) == int(rp.n_steps)
    assert not bool(rp.overflow) and not bool(rp.skin_guard)
    assert float(rp.v_max) == pytest.approx(float(ra.v_max), rel=1e-3,
                                            abs=1e-6)
    assert float(rp.tau_bottom) == pytest.approx(float(ra.tau_bottom),
                                                 rel=1e-3, abs=1e-6)
