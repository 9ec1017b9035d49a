"""Fully-fused Pallas TPU step: the ENTIRE physics step in ONE kernel.

Round-2 lesson: the XLA cellgrid engine moves ~156 MB/step through HBM at
dp=0.025 (measured via compiled cost analysis) because XLA materializes the
(S, K, 9K) pair blocks between fusion groups, and the 5-kernel Pallas
engine spent comparable time in the XLA glue (27 ``make_cores`` relayouts
per step) between kernels. This module eliminates both: one ``pallas_call``
executes all four pair phases as sequential grid sweeps with every
intermediate resident in VMEM; per step the only HBM traffic is the tiny
per-particle state (~100 KB) in and out.

Layout — "k-loop over slot rows":

* every field travels as a HALO'D CORE ``(nyp+2, K, nx+2)``: cell row
  (outer, dynamic-indexable), slot rank K (sublanes), cell column + wrapped
  x-halo (lanes). Built by one packed scatter per field (no transposes, no
  a_km twin — the slot-side row of a cell IS sublane k of its core).
* the grid is ``(4 sweeps, n_groups)``, phase-major: sweep s processes all
  row groups before sweep s+1, so cross-cell dependencies (neighbor Vol for
  KGC, neighbor B for forces, neighbor v' for continuity) are satisfied by
  sweep ordering — the reference's four pair passes per step
  (sph_physics_mex.c: density :178-234, KGC :239-365, forces :466-957,
  continuity :1073-1116) map 1:1 onto sweeps.
* each program stages the nine (dy, dx) window slabs of its R rows into a
  ``(9K, L=R*nx)`` VMEM scratch per field (static lane offsets only), then
  loops k = 0..K-1: the slot-side row is sublane ``4K+k`` of the center
  slab — FREE, no relayout, no MXU, no precision trap (the bf16 MXU
  default-precision lesson, tests/test_pallas.py::test_expand_exact_beyond_bf16,
  does not apply: there are no matmuls here at all).
* per-k reductions are (9K, L) -> (1, L) sublane sums; per-slot algebra
  runs on (1, L) rows and accumulates into (K, L) buffers flushed to the
  output cores with their wrapped halo columns, so later sweeps can stage
  from them directly.

R (rows per group) is chosen to pack lanes near the 128-lane vreg width
(``plan``): dp=0.025 -> R=3 (105/128), dp=0.01 -> R=4 (356/384).

Pair formulas are identical to ops/cellgrid.py (each cites the reference
C source); equivalence vs the XLA engine is enforced by tests/test_pallas.py.
Kernels run under ``interpret=True`` automatically off-TPU so the suite
tests them on CPU.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbors import GridSpec


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_limit_bytes(cm: str) -> int:
    """Scoped-VMEM budget for the fused kernels. "partial" packs cache +
    working set just past the default 100 MB scoped budget (measured
    101.65 MB at dp=0.005 k_cut=6); the chip has 128 MB of VMEM.
    SPH_VMEM_LIMIT_MB overrides (probing lever — Mosaic's scoped-stack
    requirement itself grows with the granted limit, docs/SCALING.md)."""
    ov = os.environ.get("SPH_VMEM_LIMIT_MB")
    mb = int(ov) if ov else (112 if cm == "partial" else 100)
    return mb * 1024 * 1024


def plan(spec: GridSpec):
    """(R, L, n_groups, nyp): pack R cell rows per program so L = R*nx
    fills 128-lane vregs well. R is a pure SCHEDULING choice — the
    trajectory is bit-identical across R (test_pallas.py:
    test_plan_r_bit_identical) — so the pick is purely a measured cost
    question. Round-5 measurement (docs/SCALING.md R-sweep): once ONE
    row reasonably fills the 128-lane vregs (nx >= 100, util >= 78%),
    R=1 beats the padded-lane-cost model decisively — 6.1e7 vs 4.8e7
    psteps/s at dp=0.01 (R=1 vs R=5), 6.2e7 vs 4.0e7 at dp=0.005 —
    because occl (the occupancy k-loop bound) is a max over the R rows
    of a group: R=1 bounds every row by ITS OWN occupancy instead of
    the group's worst row, and the whole-K ring cache shrinks linearly
    with L to VMEM-resident sizes (17-35 MB). Narrow grids (nx=40:
    3.2x lane padding at R=1, measured 2.3e7 vs 3.9e7) keep the
    padded-cost pick. SPH_PLAN_R / SPHConfig.plan_r override (probing
    lever / config reproducibility)."""
    nx, ny = spec.nx, spec.ny
    forced = (int(os.environ.get("SPH_PLAN_R", "0"))
              or int(getattr(spec, "plan_r", 0)))
    if forced > 0:
        R = min(forced, 8)
        n_groups = -(-ny // R)
        return R, R * nx, n_groups, R * n_groups
    if nx >= 100:
        return 1, nx, ny, ny
    best = None
    for R in range(1, 9):
        L = R * nx
        cost = -(-L // 128) * 128 * (-(-ny // R))
        if best is None or cost < best[0]:
            best = (cost, R)
    R = best[1]
    n_groups = -(-ny // R)
    return R, R * nx, n_groups, R * n_groups


class FusedLayout(NamedTuple):
    """Per-rebuild state of the fused engine: scatter/take indices and the
    static halo'd cores (the layout-level ghost entries,
    sph_neighbor_search_mex.c:267-295)."""

    pidx: jnp.ndarray   # (n,) int32 flat index into (nyp, K, nx) interior
    hidx: jnp.ndarray   # (n,) int32 flat index into (nyp+2, K, nx+2)
    isf_c: jnp.ndarray  # halo'd 1.0-fluid mask core (0.0 wall/empty)
    mass_c: jnp.ndarray
    wvx_c: jnp.ndarray  # prescribed wall velocity
    wvy_c: jnp.ndarray
    wbot_c: jnp.ndarray  # bottom/top wall membership masks
    wtop_c: jnp.ndarray
    refx_p: jnp.ndarray  # PLAIN position cores at rebuild (skin guard on
    refy_p: jnp.ndarray  # cores — per-particle order never materializes)
    occ: jnp.ndarray     # (n_groups, 1) int32 max cell occupancy per row
    #                      group: the kernels' k-loop bound (empty slot
    #                      ranks are skipped entirely)
    overflow: jnp.ndarray


def make_plain(spec: GridSpec, pidx, vals, fill: float = 0.0):
    """Packed scatter of a per-particle array into the PLAIN (nyp, K, nx)
    core (no halo)."""
    R, L, n_groups, nyp = plan(spec)
    nx, K = spec.nx, spec.K
    flat = jnp.full((nyp * K * nx,), fill, vals.dtype)
    return flat.at[pidx].set(vals, mode="drop").reshape(nyp, K, nx)


def halo_ify(spec: GridSpec, plain, fill: float = 0.0,
             xshift: float = 0.0):
    """PLAIN (nyp, K, nx) core -> halo'd (nyp+2, K, nx+2): wrapped x
    columns (zeroed for nx < 3, make_core's dedup) + ``fill`` y-halo rows.
    Static slicing only — this is how per-step position/velocity cores
    travel between steps without ever leaving cell layout.

    ``xshift`` (the x POSITION core passes DL): halo columns hold the
    TRANSLATED copies x -+ DL — the reference's ghost-entry translation
    (sph_neighbor_search_mex.c:282-295) — so in-kernel pair dx needs no
    per-op minimum-image correction (nx >= 3 only; tiny domains keep the
    zeroed-halo + min-image path)."""
    nyp, K, nx = plain.shape
    if nx >= 3:
        left, right = plain[:, :, -1:] - xshift, plain[:, :, :1] + xshift
    else:
        left = right = jnp.full((nyp, K, 1), fill, plain.dtype)
    c = jnp.concatenate([left, plain, right], axis=2)
    pad = jnp.full((1, K, nx + 2), fill, plain.dtype)
    return jnp.concatenate([pad, c, pad], axis=0)


def make_core(spec: GridSpec, pidx, vals, fill: float = 0.0,
              xshift: float = 0.0):
    """Packed scatter of a per-particle array into the halo'd core:
    plain scatter + halo construction (wrapped x columns, ``fill`` y-halo
    rows; -1 fill for the pid core so dead slots can never alias
    particle 0). See make_plain/halo_ify for the two halves."""
    return halo_ify(spec, make_plain(spec, pidx, vals, fill), fill,
                    xshift=xshift)


def _packed_cores(spec: GridSpec, pidx, fields, fills):
    """Scatter F per-particle arrays into plain cores with ONE packed
    scatter (vs F separate scatter kernels — the rebuild was measured
    scatter-bound). Returns a list of (nyp, K, nx) plain cores."""
    R, L, n_groups, nyp = plan(spec)
    nx, K = spec.nx, spec.K
    F = len(fields)
    pack = jnp.stack(fields, axis=-1)
    fill_row = jnp.asarray(fills, pack.dtype)
    flat = jnp.broadcast_to(fill_row, (nyp * K * nx, F))
    out = flat.at[pidx].set(pack, mode="drop").reshape(nyp, K, nx, F)
    return [out[..., f] for f in range(F)]


def build_fused_layout(spec: GridSpec, x, y, mass, wall_vx, wall_vy,
                       wall_y, state_fields=()) -> FusedLayout:
    """Slot assignment + static cores. ``state_fields`` optionally rides
    extra per-particle arrays through the SAME packed scatter (the
    in-loop rebuild scatters x/y/vx/vy/drho this way); their halo'd cores
    are returned as a second value."""
    from .cellgrid import assign_slots

    R, L, n_groups, nyp = plan(spec)
    n, nx, K = spec.n_total, spec.nx, spec.K
    slot, overflow = assign_slots(spec, x, y)
    cell = slot // K
    k = slot % K
    iy = cell // nx
    ix = cell - iy * nx
    in_range = slot < spec.n_cells * K  # overflow sentinel -> dropped
    pidx = jnp.where(in_range, (iy * K + k) * nx + ix, nyp * K * nx)
    hidx = jnp.where(in_range, ((iy + 1) * K + k) * (nx + 2) + ix + 1,
                     (nyp + 2) * K * (nx + 2))
    pidx = pidx.astype(jnp.int32)
    hidx = hidx.astype(jnp.int32)

    # per-row-group k-loop bound: the max rank actually occupied in any
    # cell of the group's R rows (the kernels skip empty slot ranks — the
    # static-capacity twin of the reference's exact per-cell linked lists,
    # sph_neighbor_search_mex.c:69-113)
    ones = jnp.zeros((spec.n_cells,), jnp.int32).at[
        jnp.minimum(cell, spec.n_cells - 1)].add(
        jnp.where(in_range, 1, 0).astype(jnp.int32))
    occ_rows = jnp.zeros((nyp, nx), jnp.int32).at[:spec.ny, :].set(
        ones.reshape(spec.ny, nx))
    occ = jnp.max(occ_rows.reshape(n_groups, R * nx), axis=1,
                  keepdims=True)
    occ = jnp.minimum(occ, K).astype(jnp.int32)

    fdtype = x.dtype
    is_fluid = (jnp.arange(n) < spec.n_fluid).astype(fdtype)
    is_wall = 1.0 - is_fluid
    fields = [is_fluid, is_wall, mass, wall_vx, wall_vy,
              is_wall * (wall_y <= 0.0), is_wall * (wall_y >= spec.DH),
              x, y] + list(state_fields)
    # empty slots ride at x = _BIG_X: past the cutoff from everything, so
    # the kernels never need a per-lane occupancy mask (see _geometry)
    fills = [0.0] * 7 + [_BIG_X, 0.0] + [0.0] * len(state_fields)
    cores = _packed_cores(spec, pidx, fields, fills)
    lay = FusedLayout(
        pidx=pidx, hidx=hidx,
        isf_c=halo_ify(spec, cores[0]),
        mass_c=halo_ify(spec, cores[2]),
        wvx_c=halo_ify(spec, cores[3]),
        wvy_c=halo_ify(spec, cores[4]),
        wbot_c=halo_ify(spec, cores[5]),
        wtop_c=halo_ify(spec, cores[6]),
        refx_p=cores[7], refy_p=cores[8],
        occ=occ, overflow=overflow)
    if state_fields:
        return lay, cores[9:]
    return lay


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _stage(scr, core, g0, spec, R):
    """Stage the nine (dy, dx) window slabs of rows [g0, g0+R) from a
    halo'd core into the (9K, L) scratch. Lane offsets are static (Mosaic
    requirement); the row index is dynamic. Window order (dy, dx) matches
    cellgrid._nview."""
    nx, K = spec.nx, spec.K
    b = 0
    for dy in range(3):
        for dx in range(3):
            for r in range(R):
                scr[b * K:(b + 1) * K, r * nx:(r + 1) * nx] = \
                    core[g0 + r + dy, :, dx:dx + nx]
            b += 1


def _stage_aside(buf, core, g0, spec, R, halo: bool):
    """Stage only the slot-side rows (center cells) of rows [g0, g0+R)
    into a (K, L) buffer, for fields needed per-slot but never as
    neighbors."""
    nx, K = spec.nx, spec.K
    for r in range(R):
        if halo:
            buf[:, r * nx:(r + 1) * nx] = core[g0 + r + 1, :, 1:nx + 1]
        else:
            buf[:, r * nx:(r + 1) * nx] = core[g0 + r, :, 0:nx]


def _flush(out, acc, g0, spec, R, halo: bool):
    """Write an accumulated (K, L) per-slot block to an output core's rows
    [g0, g0+R); for halo'd cores also write the wrapped x-halo columns so
    later sweeps can stage from them (nx < 3 halos stay zero, matching
    make_core's dedup)."""
    nx, K = spec.nx, spec.K
    for r in range(R):
        blk = acc[:, r * nx:(r + 1) * nx]
        if halo:
            out[g0 + r + 1, :, 1:nx + 1] = blk
            if nx >= 3:
                out[g0 + r + 1, :, 0:1] = acc[:, (r + 1) * nx - 1:
                                              (r + 1) * nx]
                out[g0 + r + 1, :, nx + 1:nx + 2] = acc[:, r * nx:r * nx + 1]
        else:
            out[g0 + r, :, 0:nx] = blk


_BIG_X = 1.0e9   # x-core fill for empty slots: pushes them past the
#                  cutoff so NO per-lane identity mask is ever needed


def _geometry(spec, k, sx, sy, sisf, need_w=True):
    """Masked pair geometry of slot k vs the (9K, L) candidate slabs:
    (af, r_safe, ex, ey, w, dw, m1, mw). Formulas cite
    sph_neighbor_search_mex.c:115-133 (cubic spline); the periodic seam
    is handled by the TRANSLATED x-halo columns for nx >= 3 (the
    reference's ghost entries, :282-295) and by minimum-image only on
    tiny nx < 3 domains.

    Masking discipline: the validity mask folds three exclusions into the
    r2 window test alone — empty slots ride at x = _BIG_X (far past the
    cutoff), the self pair has r2 == 0 exactly (< the 1e-24 floor) — and
    only ``m1``/``mw`` (+ ``w``) are hard-zeroed. ``ex``/``ey``/``dw``/
    ``r`` may carry bounded garbage on invalid lanes: every consumer
    multiplies by an m1- or mw-carrying coefficient, and all garbage is
    finite (r2 is clamped before rsqrt)."""
    K, h = spec.K, spec.h
    A = pl.ds(4 * K + k, 1)
    xa, ya = sx[A, :], sy[A, :]
    xv, yv = sx[:, :], sy[:, :]
    isfv = sisf[:, :]
    dx = xa - xv
    if spec.nx < 3:
        dx = dx - spec.DL * jnp.round(dx / spec.DL)
    dy = ya - yv
    r2 = dx * dx + dy * dy
    fvalid = ((r2 < spec.cutoff * spec.cutoff) & (r2 > 1e-24)).astype(
        xa.dtype)
    rs = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
    r = r2 * rs
    sigma = 10.0 / (7.0 * math.pi * h * h)
    q = r / h
    tq = 2.0 - q
    if need_w:
        w = jnp.where(q < 1.0, sigma * (1.0 - 1.5 * q * q + 0.75 * q ** 3),
                      jnp.where(q < 2.0, sigma * 0.25 * tq ** 3, 0.0))
        w = w * fvalid
    else:
        w = q  # unused by the caller (density is the only W consumer)
    soh = sigma / h
    dw = jnp.where(q < 1.0, q * (2.25 * soh * q - 3.0 * soh),
                   jnp.where(q < 2.0, -0.75 * soh * tq * tq, 0.0))
    m1 = fvalid * isfv
    mw = fvalid - m1
    af = sisf[A, :]
    return (af, r, dx * rs, dy * rs, w, dw, m1, mw)


def _w0(h):
    return 10.0 / (7.0 * math.pi * h * h)


# ---------------------------------------------------------------------------
# the fused step kernel
# ---------------------------------------------------------------------------

# ref index bookkeeping (see _fused_call):
_N_IN = 11          # xC yC vxC vyC drP isfC massC wvxC wvyC | occ params
#                     (SMEM params row: [dt, g, mu, wall_visc_factor])
_HALO_OUT = 7       # volO b11O b12O b21O b22O vx2O vy2O
_PLAIN_OUT = 9      # rhoO pO drhoO fxO fyO fpxO fpyO x2O y2O
_N_OUT = _HALO_OUT + _PLAIN_OUT + 1   # + cntO
_N_SCR_FULL = 14    # (9K, L) staging scratches
_N_ACC = 8          # (K, L) output accumulators
_N_ASIDE = 8        # (K, L) aside buffers
_N_CACHE = 5        # geometry-cache slabs: ex ey r dw*m1 dw*mw

# Geometry cache: within ONE step all four sweeps see the SAME positions
# (the position cores update only at the end of sweep 3), so the pair
# geometry computed by sweep 0 — unit vector, distance, kernel gradient,
# validity masks — is bitwise reusable by sweeps 1-3. When the cache fits
# VMEM, sweep 0 stores (ex, ey, r, dw*m1, dw*mw) per (group, k) slab and
# sweep 1 folds in the neighbor volumes (write-back as dw*Vol_j*mask), so
# sweeps 1-3 skip _geometry (incl. its rsqrt) AND the x/y/isf slab
# staging — ~35% of the step's flops at the shipping dp=0.025 grid
# (docs/SCALING.md roofline).
#
# Three cache layouts:
# * "full": one slab per (group, k) — n_groups*K slabs, sweep-major
#   schedule (all groups of sweep s before sweep s+1). Fits small grids.
# * "ring": depth-4 ring of per-(slot, k) slabs under a WAVEFRONT
#   schedule — at phase p, sweep s processes group p - s (s ascending
#   within the phase, so every cross-group dependency — sweep s of group
#   g needs sweep s-1's outputs from groups g-1..g+1 — is satisfied:
#   sweep s-1 of group g+1 runs at phase g+s, one position earlier in
#   the SAME phase). A group's geometry is written by sweep 0 at phase g
#   into slot g mod 4 and last read by sweep 3 at phase g+3, before
#   sweep 0 of group g+4 overwrites the slot — so 4 slots suffice and
#   the cache shrinks by n_groups/4, bringing the measured ~15% cache
#   gain (docs/SCALING.md) to the dp <= 0.01 grids whose full cache
#   exceeds VMEM. Values are bit-identical to the sweep-major schedule
#   (each (sweep, group) body sees exactly the same inputs; only the
#   execution order of independent bodies changes).
# * "partial": the ring, truncated in anchor RANK — only ranks
#   k < k_cut are cached; the occupancy-bounded k-loops split into a
#   cached head [0, k_cut) and a recompute tail [k_cut, kmax). For
#   grids whose depth-4 ring still exceeds VMEM (dp=0.005: 140 MB vs
#   128 MB, measured OOM — docs/SCALING.md), this trades away the
#   staging saving (sweeps 1-3 must still stage x/y/isf for the tail)
#   to keep the geometry saving on the head ranks.
_GEOM_CACHE_BUDGET = 48 * 1024 * 1024
_RING_CACHE_BUDGET = 80 * 1024 * 1024
_PARTIAL_CACHE_BUDGET = 64 * 1024 * 1024
_RING_DEPTH = 4


def _cache_bytes(spec: GridSpec, dtype, n_slots: int,
                 k_cut: int | None = None) -> int:
    R, L, n_groups, nyp = plan(spec)
    K = spec.K if k_cut is None else k_cut
    esize = jnp.dtype(dtype).itemsize
    sub = -(-9 * spec.K // 8) * 8
    lanes = -(-L // 128) * 128
    return _N_CACHE * n_slots * K * sub * lanes * esize


def use_geom_cache(spec: GridSpec, dtype) -> bool:
    """True when the full per-(group, k) geometry cache fits the VMEM
    budget (tile-padded estimate) alongside the working set."""
    R, L, n_groups, nyp = plan(spec)
    return _cache_bytes(spec, dtype, n_groups) <= _GEOM_CACHE_BUDGET


def cache_plan(spec: GridSpec, dtype) -> tuple:
    """Resolve the geometry-cache layout: ("full"|"ring"|"partial"|"none",
    k_cut) with k_cut = number of cached anchor ranks (== K except for
    "partial"). The mode comes from ``spec.geom_cache`` / ``spec.geom_kcut``
    (the SPHConfig knobs riding the spec); env vars SPH_GEOM_CACHE
    (auto|full|ring|partial|none|0) and SPH_GEOM_KCUT still override for
    probing."""
    import os
    K = spec.K
    env = (os.environ.get("SPH_GEOM_CACHE", "")
           or getattr(spec, "geom_cache", "auto"))

    def partial_kcut():
        kc = (int(os.environ.get("SPH_GEOM_KCUT", "0"))
              or int(getattr(spec, "geom_kcut", 0)))
        if kc <= 0:
            kc = K - 1
            while kc >= 2 and _cache_bytes(
                    spec, dtype, _RING_DEPTH, kc) > _PARTIAL_CACHE_BUDGET:
                kc -= 1
        u = _k_unroll()   # the k-loop split point must align to the unroll
        return min(kc - kc % u, K)

    if env in ("0", "none"):
        return "none", 0
    if env in ("full", "ring"):
        return env, K
    if env == "partial":
        return "partial", partial_kcut()
    if use_geom_cache(spec, dtype):
        return "full", K
    if _cache_bytes(spec, dtype, _RING_DEPTH) <= _RING_CACHE_BUDGET:
        return "ring", K
    kc = partial_kcut()
    if kc >= 2:
        return "partial", kc
    return "none", 0


def cache_mode(spec: GridSpec, dtype) -> str:
    """Resolved geometry-cache layout name (see cache_plan)."""
    return cache_plan(spec, dtype)[0]


def _when(cond):
    """pl.when that also accepts a Python bool (static sweep selection in
    the chunk kernel, where each sweep body is emitted exactly once)."""
    if isinstance(cond, bool):
        return (lambda f: f()) if cond else (lambda f: None)
    return pl.when(cond)


def _k_unroll() -> int:
    """Anchor-rank unroll factor of the slab-form k-loops (env knob
    SPH_FUSED_UNROLL, read at trace time). Each k-iteration streams every
    staged (9K, L) candidate slab from VMEM — the measured per-step
    bottleneck (~75% of in-kernel time at the dp=0.025 shipping grid) —
    while the slab values are identical across k (only the anchor row
    changes). Processing U ranks per iteration lets Mosaic's elementwise
    fusion reuse each loaded slab tile for U anchor chains, cutting the
    shared-field traffic by ~U."""
    import os
    return max(1, int(os.environ.get("SPH_FUSED_UNROLL", "1")))


def _kloop(kmax, K, unroll, body, carry0):
    """fori over anchor ranks, ``unroll`` ranks per iteration.
    ``body(k, valid, carry) -> carry`` must guard its stores with
    ``_when(valid)`` and mask carry contributions via ``_maskv`` —
    ``valid`` is literal True for rank 0 of each iteration (always in
    range) and a traced bool for the tail ranks; k arrives clamped to
    K-1 so reads stay in bounds."""
    if unroll <= 1:
        return jax.lax.fori_loop(
            0, kmax, lambda k, c: body(k, True, c), carry0)
    n_it = (kmax + unroll - 1) // unroll

    def ubody(i, c):
        for j in range(unroll):
            k = i * unroll + j
            if j == 0:
                c = body(k, True, c)
            else:
                c = body(jnp.minimum(k, K - 1), k < kmax, c)
        return c

    return jax.lax.fori_loop(0, n_it, ubody, carry0)


def _kloop_span(k0, kmax, K, unroll, body, carry0):
    """_kloop over anchor ranks [k0, kmax) — the recompute tail of a
    partial-cache split (k0 static, a multiple of ``unroll`` so the
    rank-0-of-iteration validity argument of _kloop still holds). Runs
    zero iterations when kmax <= k0."""
    if unroll <= 1:
        return jax.lax.fori_loop(
            k0, jnp.maximum(kmax, k0), lambda k, c: body(k, True, c),
            carry0)
    assert k0 % unroll == 0, "partial k_cut must align to the unroll"
    n_it = (kmax + unroll - 1) // unroll

    def ubody(i, c):
        for j in range(unroll):
            k = i * unroll + j
            if j == 0:
                c = body(k, True, c)
            else:
                c = body(jnp.minimum(k, K - 1), k < kmax, c)
        return c

    return jax.lax.fori_loop(k0 // unroll, jnp.maximum(n_it, k0 // unroll),
                             ubody, carry0)


def _maskv(valid, v):
    """Zero ``v`` on tail (invalid) unrolled ranks."""
    return v if valid is True else jnp.where(valid, v, jnp.zeros_like(v))


# Loop-order selection: "slabs" = anchor-rank-outer (each of kmax
# iterations re-streams every (9K, L) candidate slab from VMEM — the
# measured bottleneck: ~160 MB/step of VMEM reads at the dp=0.025
# shipping grid), "rows" = candidate-row-outer (each slab row is
# streamed ONCE per sweep as a (1, L) load and computed against ALL K
# anchor ranks held in registers as (K, L) values; reductions become
# register-resident accumulator adds). Config knob SPHConfig.fused_rows
# (riding spec.fused_rows); env override SPH_FUSED_ROWS=0/1.
def use_rows(spec: GridSpec, dtype) -> bool:
    import os
    v = (os.environ.get("SPH_FUSED_ROWS", "")
         or getattr(spec, "fused_rows", "auto"))
    if v == "1":
        return True
    if v == "0":
        return False
    return False  # default until measured on hardware


def _step_kernel(*refs, spec, R, L, n_groups, nyp, scalars,
                 sweep_offset=0, n_cache=0, rows=False, ring=False,
                 k_cut=None):
    if n_cache:
        cache = refs[-n_cache:]
        refs = refs[:-n_cache]
    else:
        cache = None
    occs, params = refs[9], refs[10]
    if ring:
        # wavefront grid (n_groups + 3, 4): at phase p = program_id(0),
        # sweep s = program_id(1) processes group p - s (see the ring
        # cache-layout note above _GEOM_CACHE_BUDGET)
        sweep = pl.program_id(1)
        grp = pl.program_id(0) - sweep
    else:
        sweep = pl.program_id(0) + sweep_offset
        grp = pl.program_id(1)
    # (g, mu, wall_visc_factor) arrive via SMEM so sweeps over them reuse
    # ONE compile (the remaining scalars are true physics constants)
    full = scalars[:5] + (params[0, 1], params[0, 2], params[0, 3])

    def run(grp):
        if rows:
            _kernel_body_rows(refs, spec=spec, R=R, L=L,
                              n_groups=n_groups, nyp=nyp, scalars=full,
                              sweep=sweep, grp=grp, dt=params[0, 0],
                              kmax=occs[grp, 0], occs=occs)
        else:
            _kernel_body(refs, spec=spec, R=R, L=L, n_groups=n_groups,
                         nyp=nyp, scalars=full, sweep=sweep, grp=grp,
                         dt=params[0, 0], kmax=occs[grp, 0], cache=cache,
                         ring=ring, k_cut=k_cut)

    if ring:
        grp_c = jnp.clip(grp, 0, n_groups - 1)

        @pl.when(jnp.logical_and(grp >= 0, grp < n_groups))
        def _():
            run(grp_c)
    else:
        run(grp)


def _kernel_body(refs, *, spec, R, L, n_groups, nyp, scalars, sweep, grp,
                 dt, kmax, cache=None, ring=False, k_cut=None):
    """One (sweep, grp) cell of the fused step. ``refs`` uses the v2
    positional layout (occs/dts slots present but unread — sweep/grp/dt/
    kmax arrive as parameters so the chunk kernel can drive the same body
    from in-kernel loops). ``ring``: cache slabs are indexed modulo
    _RING_DEPTH (wavefront schedule, see the cache-layout note above).
    ``k_cut``: partial cache — only anchor ranks k < k_cut are cached;
    the k-loops split into a cached head and a recompute tail, and the
    anchor-side reads of the cached head come from the (staged) scr
    slabs instead of asides, since the tail stages them anyway."""
    (rho0, p0, c_f, inv_sigma0, transport_coeff, g, mu, wf) = scalars
    nx, K, h = spec.nx, spec.K, spec.h
    NK = 9 * K
    cslot = (grp % _RING_DEPTH) if ring else grp
    kc = K if (cache is None or k_cut is None) else k_cut
    partial = cache is not None and kc < K
    unroll = _k_unroll()

    (xC, yC, vxC, vyC, drC, isfC, massC, wvxC, wvyC) = refs[:9]
    (volO, b11O, b12O, b21O, b22O, vx2O, vy2O,
     rhoO, pO, drhoO, fxO, fyO, fpxO, fpyO, x2O, y2O,
     cntO) = refs[_N_IN:_N_IN + _N_OUT]
    base = _N_IN + _N_OUT
    scr = refs[base:base + _N_SCR_FULL]
    acc = refs[base + _N_SCR_FULL:base + _N_SCR_FULL + _N_ACC]
    aside = refs[base + _N_SCR_FULL + _N_ACC:
                 base + _N_SCR_FULL + _N_ACC + _N_ASIDE]

    g0 = grp * R
    fdtype = xC.dtype

    def zero_accs(n_used):
        # empty slot ranks are skipped by the occupancy-bounded k-loop, so
        # their accumulator rows must be cleared before the flush (a stale
        # row would leak the previous group's values into the output core)
        for i in range(n_used):
            acc[i][:, :] = jnp.zeros((K, L), fdtype)

    # ---- sweep 0: density (sph_physics_mex.c:178-234) ----
    @_when(sweep == 0)
    def _density():
        # one-time: zero the y-halo rows of every core written by later
        # sweeps (their interiors are fully flushed; only the halo rows
        # would otherwise stage uninitialized VMEM)
        @pl.when(grp == 0)
        def _():
            for c in (volO, b11O, b12O, b21O, b22O, vx2O, vy2O):
                c[0, :, :] = jnp.zeros((K, nx + 2), fdtype)
                c[nyp + 1, :, :] = jnp.zeros((K, nx + 2), fdtype)

        _stage(scr[0], xC, g0, spec, R)
        _stage(scr[1], yC, g0, spec, R)
        _stage(scr[2], isfC, g0, spec, R)
        _stage(scr[3], massC, g0, spec, R)
        _stage_aside(aside[0], drC, g0, spec, R, halo=False)
        zero_accs(3)
        inv_rho0 = 1.0 / rho0

        def kbody(k, valid, cnt, store=cache is not None):
            af, r, ex, ey, w, dw, m1, mw = _geometry(
                spec, k, scr[0], scr[1], scr[2])
            if store:
                @_when(valid)
                def _():
                    ck = cslot * kc + k
                    cache[0][ck, :, :] = ex
                    cache[1][ck, :, :] = ey
                    cache[2][ck, :, :] = r
                    cache[3][ck, :, :] = dw * m1
                    cache[4][ck, :, :] = dw * mw
            massv = scr[3][:, :]
            sig_inner = _w0(h) + jnp.sum(w * m1, axis=0, keepdims=True)
            sig_contact = jnp.sum(w * (massv * inv_rho0) * mw, axis=0,
                                  keepdims=True)
            massa = scr[3][pl.ds(4 * K + k, 1), :]
            mass_safe = jnp.where(massa > 0, massa, 1.0)
            rho = (sig_inner * rho0 * inv_sigma0
                   + sig_contact * rho0 * rho0 * inv_sigma0 / mass_safe)
            rho = jnp.where(rho <= 1e-12, rho0, rho)
            rho = jnp.where(af > 0, rho, rho0)   # walls keep rho0
            vol = mass_safe / rho
            # stage-1 density half-kick + EOS (c:857-865)
            dra = aside[0][pl.ds(k, 1), :]
            rho_half = jnp.where(
                af > 0,
                jnp.where(rho + 0.5 * dt * dra < 1e-10, rho0,
                          rho + 0.5 * dt * dra),
                rho)
            p_half = jnp.where(af > 0, p0 * (rho_half / rho0 - 1.0), 0.0)

            @_when(valid)
            def _():
                acc[0][pl.ds(k, 1), :] = vol
                acc[1][pl.ds(k, 1), :] = rho_half
                acc[2][pl.ds(k, 1), :] = p_half

            # reference pair-count convention (fluid-rooted, store-once):
            # each fluid-fluid pair counted half from both sides
            return cnt + _maskv(valid, af * (
                0.5 * jnp.sum(m1, axis=0, keepdims=True)
                + jnp.sum(mw, axis=0, keepdims=True)))

        if partial:
            cnt = _kloop(jnp.minimum(kmax, kc), K, unroll,
                         lambda k, v, c: kbody(k, v, c, store=True),
                         jnp.zeros((1, L), fdtype))
            cnt = _kloop_span(kc, kmax, K, unroll,
                              lambda k, v, c: kbody(k, v, c, store=False),
                              cnt)
        else:
            cnt = _kloop(kmax, K, unroll, kbody, jnp.zeros((1, L), fdtype))
        cntO[pl.ds(grp, 1), :] = cnt
        _flush(volO, acc[0], g0, spec, R, halo=True)
        # rho_half/p_half travel in dedicated halo'd scratch cores appended
        # after the aside buffers (refs[-4:], see _fused_call scratch_shapes)
        rhoHS, pHS, dxsS, dysS = refs[-4], refs[-3], refs[-2], refs[-1]
        _flush(rhoHS, acc[1], g0, spec, R, halo=True)
        _flush(pHS, acc[2], g0, spec, R, halo=True)

        @pl.when(grp == 0)
        def _():
            rhoHS[0, :, :] = jnp.zeros((K, nx + 2), fdtype)
            rhoHS[nyp + 1, :, :] = jnp.zeros((K, nx + 2), fdtype)
            pHS[0, :, :] = jnp.zeros((K, nx + 2), fdtype)
            pHS[nyp + 1, :, :] = jnp.zeros((K, nx + 2), fdtype)

    # ---- sweep 1: kernel gradient correction (c:239-365) ----
    @_when(sweep == 1)
    def _kgc():
        _stage(scr[3], volO, g0, spec, R)
        if cache is None or partial:
            _stage(scr[0], xC, g0, spec, R)
            _stage(scr[1], yC, g0, spec, R)
            _stage(scr[2], isfC, g0, spec, R)
        if cache is not None and not partial:
            _stage_aside(aside[0], isfC, g0, spec, R, halo=True)
        zero_accs(4)

        def kbody(k, valid, carry, cached=cache is not None):
            volv = scr[3][:, :]
            if not cached:
                af, r, ex, ey, w, dw, m1, mw = _geometry(
                    spec, k, scr[0], scr[1], scr[2], need_w=False)
                rf = r * dw * volv * (m1 + mw)
            else:
                ck = cslot * kc + k
                ex = cache[0][ck, :, :]
                ey = cache[1][ck, :, :]
                r = cache[2][ck, :, :]
                dwv1 = cache[3][ck, :, :] * volv
                dwvw = cache[4][ck, :, :] * volv

                # write-back: sweeps 2-3 consume dw*Vol_j*mask directly,
                # so the volume fold-in happens exactly once per step
                @_when(valid)
                def _():
                    cache[3][ck, :, :] = dwv1
                    cache[4][ck, :, :] = dwvw

                af = (scr[2][pl.ds(4 * K + k, 1), :] if partial
                      else aside[0][pl.ds(k, 1), :])
                rf = r * (dwv1 + dwvw)
            a11 = -jnp.sum(rf * ex * ex, axis=0, keepdims=True)
            a12 = -jnp.sum(rf * ex * ey, axis=0, keepdims=True)
            a22 = -jnp.sum(rf * ey * ey, axis=0, keepdims=True)
            a21 = a12
            # regularized pseudo-inverse blend (c:321-365)
            ata11 = a11 * a11 + a21 * a21 + 1e-8
            ata12 = a11 * a12 + a21 * a22
            ata22 = a12 * a12 + a22 * a22 + 1e-8
            det_m = ata11 * ata22 - ata12 * ata12
            degen = jnp.abs(det_m) < 1e-20
            det_safe = jnp.where(degen, 1.0, det_m)
            im11 = ata22 / det_safe
            im12 = -ata12 / det_safe
            im22 = ata11 / det_safe
            p11 = jnp.where(degen, 1.0, im11 * a11 + im12 * a12)
            p12 = jnp.where(degen, 0.0, im11 * a21 + im12 * a22)
            p21 = jnp.where(degen, 0.0, im12 * a11 + im22 * a12)
            p22 = jnp.where(degen, 1.0, im12 * a21 + im22 * a22)
            det_a = a11 * a22 - a12 * a21
            det_sqr = jnp.maximum(1.0 - det_a, 0.0)
            denom = det_a + det_sqr
            small = jnp.abs(denom) < 1e-12
            denom_safe = jnp.where(small, 1.0, denom)
            w1 = jnp.where(small, 0.0, det_a / denom_safe)
            w2 = jnp.where(small, 1.0, det_sqr / denom_safe)

            @_when(valid)
            def _():
                acc[0][pl.ds(k, 1), :] = jnp.where(af > 0,
                                                   w1 * p11 + w2, 1.0)
                acc[1][pl.ds(k, 1), :] = jnp.where(af > 0, w1 * p12, 0.0)
                acc[2][pl.ds(k, 1), :] = jnp.where(af > 0, w1 * p21, 0.0)
                acc[3][pl.ds(k, 1), :] = jnp.where(af > 0,
                                                   w1 * p22 + w2, 1.0)

            return carry

        if partial:
            _kloop(jnp.minimum(kmax, kc), K, unroll,
                   lambda k, v, c: kbody(k, v, c, cached=True),
                   jnp.zeros((1, 1), fdtype))
            _kloop_span(kc, kmax, K, unroll,
                        lambda k, v, c: kbody(k, v, c, cached=False),
                        jnp.zeros((1, 1), fdtype))
        else:
            _kloop(kmax, K, unroll, kbody, jnp.zeros((1, 1), fdtype))
        _flush(b11O, acc[0], g0, spec, R, halo=True)
        _flush(b12O, acc[1], g0, spec, R, halo=True)
        _flush(b21O, acc[2], g0, spec, R, halo=True)
        _flush(b22O, acc[3], g0, spec, R, halo=True)

    # ---- sweep 2: viscous + shifting + Riemann pressure + kick ----
    # (c:466-545 viscous, :633-709 shifting, :867-957 pressure,
    #  :1388-1409 kick)
    @_when(sweep == 2)
    def _forces():
        rhoHS, pHS, dxsS, dysS = refs[-4], refs[-3], refs[-2], refs[-1]
        if cache is None or partial:
            _stage(scr[0], xC, g0, spec, R)
            _stage(scr[1], yC, g0, spec, R)
            _stage(scr[2], isfC, g0, spec, R)
            _stage(scr[3], volO, g0, spec, R)
        if cache is not None and not partial:
            _stage_aside(aside[1], isfC, g0, spec, R, halo=True)
            _stage_aside(aside[2], volO, g0, spec, R, halo=True)
        _stage(scr[4], vxC, g0, spec, R)
        _stage(scr[5], vyC, g0, spec, R)
        _stage(scr[6], b11O, g0, spec, R)
        _stage(scr[7], b12O, g0, spec, R)
        _stage(scr[8], b21O, g0, spec, R)
        _stage(scr[9], b22O, g0, spec, R)
        _stage(scr[10], rhoHS, g0, spec, R)
        _stage(scr[11], pHS, g0, spec, R)
        _stage(scr[12], wvxC, g0, spec, R)
        _stage(scr[13], wvyC, g0, spec, R)
        _stage_aside(aside[0], massC, g0, spec, R, halo=True)
        zero_accs(8)

        def kbody(k, valid, carry, cached=cache is not None):
            A = pl.ds(4 * K + k, 1)
            if not cached:
                af, r, ex, ey, w, dw, m1, mw = _geometry(
                    spec, k, scr[0], scr[1], scr[2], need_w=False)
                volv = scr[3][:, :]
                dwv = dw * volv
                dwv1 = dwv * m1
                dwvw = dwv * mw
                vola = scr[3][A, :]
            else:
                ck = cslot * kc + k
                ex = cache[0][ck, :, :]
                ey = cache[1][ck, :, :]
                r = cache[2][ck, :, :]
                dwv1 = cache[3][ck, :, :]
                dwvw = cache[4][ck, :, :]
                if partial:
                    af = scr[2][A, :]
                    vola = scr[3][A, :]
                else:
                    af = aside[1][pl.ds(k, 1), :]
                    vola = aside[2][pl.ds(k, 1), :]
            vxa, vxv = scr[4][A, :], scr[4][:, :]
            vya, vyv = scr[5][A, :], scr[5][:, :]
            b11a, b11v = scr[6][A, :], scr[6][:, :]
            b12a, b12v = scr[7][A, :], scr[7][:, :]
            b21a, b21v = scr[8][A, :], scr[8][:, :]
            b22a, b22v = scr[9][A, :], scr[9][:, :]
            rhoha, rhohv = scr[10][A, :], scr[10][:, :]
            pha, phv = scr[11][A, :], scr[11][:, :]
            wvxv, wvyv = scr[12][:, :], scr[13][:, :]
            massa = aside[0][pl.ds(k, 1), :]
            mass_safe = jnp.where(massa > 0, massa, 1.0)
            inv_denom = 1.0 / (r + 0.01 * h)

            # corrected-gradient projections, reused for BOTH the eBe
            # scalar (e . (B e) = ex*tx + ey*ty) and the pressure force
            tx_f = (b11a + b11v) * ex + (b12a + b12v) * ey
            ty_f = (b21a + b21v) * ex + (b22a + b22v) * ey
            tx_w = b11a * ex + b12a * ey
            ty_w = b21a * ex + b22a * ey
            ebe_f = ex * tx_f + ey * ty_f
            ebe_w = ex * tx_w + ey * ty_w

            # viscous, 4.0 no-slip wall factor (c:466-545)
            cf_p = ebe_f * mu * inv_denom * dwv1
            cw_p = wf * ebe_w * mu * inv_denom * dwvw
            acc_x = jnp.sum(cf_p * (vxa - vxv) + cw_p * (vxa - wvxv),
                            axis=0, keepdims=True)
            acc_y = jnp.sum(cf_p * (vya - vyv) + cw_p * (vya - wvyv),
                            axis=0, keepdims=True)
            fpx = jnp.where(af > 0, acc_x * vola + massa * g, 0.0)
            fpy = jnp.where(af > 0, acc_y * vola, 0.0)

            # shifting increment, -2 wall mirror factor (c:633-709);
            # reuses the tx/ty projections computed above
            inc_x = jnp.sum(-dwv1 * tx_f - 2.0 * dwvw * tx_w,
                            axis=0, keepdims=True)
            inc_y = jnp.sum(-dwv1 * ty_f - 2.0 * dwvw * ty_w,
                            axis=0, keepdims=True)
            limiter = jnp.clip(
                100.0 * (inc_x * inc_x + inc_y * inc_y) / (h * h), 0.0, 1.0)
            shift = transport_coeff * h * h * limiter * af

            # Riemann pressure + virtual wall pressure (c:867-957)
            rho_bar = 0.5 * (rhoha + rhohv)
            un_l = vxa * ex + vya * ey
            un_r = vxv * ex + vyv * ey
            beta = jnp.minimum(3.0 * jnp.maximum(un_l - un_r, 0.0), c_f)
            p_avg = 0.5 * (pha + phv)
            p_star = p_avg + 0.5 * beta * rho_bar * (un_l - un_r)
            p_face = 0.5 * (p_avg + p_star)
            ax_prior = fpx / mass_safe
            ay_prior = fpy / mass_safe
            face_acc = -(ax_prior * ex + ay_prior * ey)
            p_wall = pha + rhoha * r * jnp.maximum(0.0, face_acc)
            pacc_x = -jnp.sum(p_face * tx_f * dwv1
                              + (pha + p_wall) * tx_w * dwvw,
                              axis=0, keepdims=True)
            pacc_y = -jnp.sum(p_face * ty_f * dwv1
                              + (pha + p_wall) * ty_w * dwvw,
                              axis=0, keepdims=True)
            fx = jnp.where(af > 0, pacc_x * vola, 0.0)
            fy = jnp.where(af > 0, pacc_y * vola, 0.0)

            # full-step kick, walls stay at rest (c:1388-1409)
            inv_m = 1.0 / mass_safe
            vx2 = jnp.where(af > 0, vxa + (fpx + fx) * inv_m * dt, 0.0)
            vy2 = jnp.where(af > 0, vya + (fpy + fy) * inv_m * dt, 0.0)

            @_when(valid)
            def _():
                acc[0][pl.ds(k, 1), :] = vx2
                acc[1][pl.ds(k, 1), :] = vy2
                acc[2][pl.ds(k, 1), :] = fx
                acc[3][pl.ds(k, 1), :] = fy
                acc[4][pl.ds(k, 1), :] = fpx
                acc[5][pl.ds(k, 1), :] = fpy
                acc[6][pl.ds(k, 1), :] = shift * inc_x
                acc[7][pl.ds(k, 1), :] = shift * inc_y

            return carry

        if partial:
            _kloop(jnp.minimum(kmax, kc), K, unroll,
                   lambda k, v, c: kbody(k, v, c, cached=True),
                   jnp.zeros((1, 1), fdtype))
            _kloop_span(kc, kmax, K, unroll,
                        lambda k, v, c: kbody(k, v, c, cached=False),
                        jnp.zeros((1, 1), fdtype))
        else:
            _kloop(kmax, K, unroll, kbody, jnp.zeros((1, 1), fdtype))
        _flush(vx2O, acc[0], g0, spec, R, halo=True)
        _flush(vy2O, acc[1], g0, spec, R, halo=True)
        _flush(fxO, acc[2], g0, spec, R, halo=False)
        _flush(fyO, acc[3], g0, spec, R, halo=False)
        _flush(fpxO, acc[4], g0, spec, R, halo=False)
        _flush(fpyO, acc[5], g0, spec, R, halo=False)
        _flush(dxsS, acc[6], g0, spec, R, halo=False)
        _flush(dysS, acc[7], g0, spec, R, halo=False)

    # ---- sweep 3: continuity + finalize + position update ----
    # (c:1073-1116 continuity, :1429-1451 finalize; positions:
    #  shift + two half drifts, SPH_Poiseuille.m:254-283 ordering)
    @_when(sweep == 3)
    def _continuity():
        rhoHS, pHS, dxsS, dysS = refs[-4], refs[-3], refs[-2], refs[-1]
        if cache is None or partial:
            _stage(scr[0], xC, g0, spec, R)
            _stage(scr[1], yC, g0, spec, R)
            _stage(scr[2], isfC, g0, spec, R)
            _stage(scr[3], volO, g0, spec, R)
        if cache is not None and not partial:
            _stage_aside(aside[5], isfC, g0, spec, R, halo=True)
            _stage_aside(aside[6], xC, g0, spec, R, halo=True)
            _stage_aside(aside[7], yC, g0, spec, R, halo=True)
        _stage(scr[4], vx2O, g0, spec, R)
        _stage(scr[5], vy2O, g0, spec, R)
        _stage(scr[6], wvxC, g0, spec, R)
        _stage(scr[7], wvyC, g0, spec, R)
        _stage_aside(aside[0], rhoHS, g0, spec, R, halo=True)
        _stage_aside(aside[1], vxC, g0, spec, R, halo=True)
        _stage_aside(aside[2], vyC, g0, spec, R, halo=True)
        _stage_aside(aside[3], dxsS, g0, spec, R, halo=False)
        _stage_aside(aside[4], dysS, g0, spec, R, halo=False)
        zero_accs(3)
        # position accumulators start as the STAGED center positions, not
        # zero: slot ranks >= kmax are skipped by the occupancy-bounded
        # k-loop, and their output positions must stay at the input values
        # (_BIG_X for empty slots) — a zero there would (a) teleport empty
        # slots to x=0 inside the domain for the next chunk step and
        # (b) blow up the displacement guard against the _BIG_X ref core
        if cache is None or partial:
            acc[3][:, :] = scr[0][4 * K:5 * K, :]
            acc[4][:, :] = scr[1][4 * K:5 * K, :]
        else:
            acc[3][:, :] = aside[6][:, :]
            acc[4][:, :] = aside[7][:, :]

        def kbody(k, valid, carry, cached=cache is not None):
            A = pl.ds(4 * K + k, 1)
            kA = pl.ds(k, 1)
            if not cached:
                af, r, ex, ey, w, dw, m1, mw = _geometry(
                    spec, k, scr[0], scr[1], scr[2], need_w=False)
                volv = scr[3][:, :]
                dwv = dw * volv
                dwv1 = dwv * m1
                dwvw = dwv * mw
                xa = scr[0][A, :]
                ya = scr[1][A, :]
            else:
                ck = cslot * kc + k
                ex = cache[0][ck, :, :]
                ey = cache[1][ck, :, :]
                dwv1 = cache[3][ck, :, :]
                dwvw = cache[4][ck, :, :]
                if partial:
                    af = scr[2][A, :]
                    xa = scr[0][A, :]
                    ya = scr[1][A, :]
                else:
                    af = aside[5][kA, :]
                    xa = aside[6][kA, :]
                    ya = aside[7][kA, :]
            vx2a, vx2v = scr[4][A, :], scr[4][:, :]
            vy2a, vy2v = scr[5][A, :], scr[5][:, :]
            wvxv, wvyv = scr[6][:, :], scr[7][:, :]
            rhoha = aside[0][kA, :]

            u_jump_f = (vx2a - vx2v) * ex + (vy2a - vy2v) * ey
            u_jump_w = 2.0 * ((vx2a - wvxv) * ex + (vy2a - wvyv) * ey)
            rate = jnp.sum(u_jump_f * dwv1 + u_jump_w * dwvw,
                           axis=0, keepdims=True)
            drho_new = jnp.where(af > 0, rate * rhoha, 0.0)
            rho_new = rhoha + 0.5 * dt * drho_new
            rho_new = jnp.where(rho_new < 1e-10, rho0, rho_new)
            rho_new = jnp.where(af > 0, rho_new, rhoha)
            p_new = jnp.where(af > 0, p0 * (rho_new / rho0 - 1.0), 0.0)

            # positions: shift + half drift (old v) + half drift (new v);
            # walls never move
            vxa_old = aside[1][kA, :]
            vya_old = aside[2][kA, :]
            x2 = xa + aside[3][kA, :] + 0.5 * dt * (vxa_old + vx2a)
            y2 = ya + aside[4][kA, :] + 0.5 * dt * (vya_old + vy2a)
            x2 = jnp.where(af > 0, x2, xa)
            y2 = jnp.where(af > 0, y2, ya)

            @_when(valid)
            def _():
                acc[0][kA, :] = rho_new
                acc[1][kA, :] = p_new
                acc[2][kA, :] = drho_new
                acc[3][kA, :] = x2
                acc[4][kA, :] = y2

            return carry

        if partial:
            _kloop(jnp.minimum(kmax, kc), K, unroll,
                   lambda k, v, c: kbody(k, v, c, cached=True),
                   jnp.zeros((1, 1), fdtype))
            _kloop_span(kc, kmax, K, unroll,
                        lambda k, v, c: kbody(k, v, c, cached=False),
                        jnp.zeros((1, 1), fdtype))
        else:
            _kloop(kmax, K, unroll, kbody, jnp.zeros((1, 1), fdtype))
        _flush(rhoO, acc[0], g0, spec, R, halo=False)
        _flush(pO, acc[1], g0, spec, R, halo=False)
        _flush(drhoO, acc[2], g0, spec, R, halo=False)
        _flush(x2O, acc[3], g0, spec, R, halo=False)
        _flush(y2O, acc[4], g0, spec, R, halo=False)


def _kernel_body_rows(refs, *, spec, R, L, n_groups, nyp, scalars, sweep,
                      grp, dt, kmax, occs):
    """Candidate-row-outer twin of ``_kernel_body`` (same formulas, same
    staging slots, same flush layout — every formula citation there
    applies here). The loop inversion: instead of kmax anchor-rank
    iterations that each re-stream every (9K, L) candidate slab from
    VMEM, the candidate loop streams each slab ROW once as a (1, L) load
    and computes against ALL K anchor ranks held as register-resident
    (K, L) values; per-pair reductions become accumulator adds carried
    through the loop, and per-anchor postprocessing (KGC inversion, EOS,
    kick, limiter) runs once on (K, L) instead of once per rank. The
    candidate loop is bounded per window ROW OF CELLS (dy) by the
    occupancy of the row groups it can touch, and the three dx window
    columns are unrolled inside the body (3 rows per iteration).

    Sweep 2 needs TWO candidate passes: the virtual wall pressure
    (c:926-950) consumes the anchor's COMPLETED viscous+gravity force,
    which the slab form has after one in-iteration reduction but the
    row form only has after the full viscous pass.

    Empty slot ranks (rank >= cell occupancy) differ benignly from the
    slab form: the slab k-loop never writes them (outputs stay 0 from
    zero_accs), while the row form computes them masked — af == 0 and
    mass == 0 force the same 0/identity/pass-through values the
    consumers expect; positions keep their _BIG_X sentinels."""
    (rho0, p0, c_f, inv_sigma0, transport_coeff, g, mu, wf) = scalars
    nx, K, h = spec.nx, spec.K, spec.h

    (xC, yC, vxC, vyC, drC, isfC, massC, wvxC, wvyC) = refs[:9]
    (volO, b11O, b12O, b21O, b22O, vx2O, vy2O,
     rhoO, pO, drhoO, fxO, fyO, fpxO, fpyO, x2O, y2O,
     cntO) = refs[_N_IN:_N_IN + _N_OUT]
    base = _N_IN + _N_OUT
    scr = refs[base:base + _N_SCR_FULL]
    acc = refs[base + _N_SCR_FULL:base + _N_SCR_FULL + _N_ACC]
    aside = refs[base + _N_SCR_FULL + _N_ACC:
                 base + _N_SCR_FULL + _N_ACC + _N_ASIDE]

    g0 = grp * R
    fdtype = xC.dtype
    A = slice(4 * K, 5 * K)   # center-block rows = the (K, L) anchors

    # per-window-row candidate occupancy bounds: dy=1 spans exactly this
    # group's rows; dy=0/2 can touch one row of the prev/next group
    o_self = kmax
    o_prev = jnp.where(grp > 0, occs[jnp.maximum(grp - 1, 0), 0], 0)
    o_next = jnp.where(grp < n_groups - 1,
                       occs[jnp.minimum(grp + 1, n_groups - 1), 0], 0)
    docc = (jnp.maximum(o_prev, o_self), o_self,
            jnp.maximum(o_next, o_self))

    def sweep_rows(row_body, accs):
        for dyw in range(3):
            def body(kc, accs, dyw=dyw):
                for dxw in range(3):
                    accs = row_body((dyw * 3 + dxw) * K + kc, accs)
                return accs
            accs = jax.lax.fori_loop(0, docc[dyw], body, accs)
        return accs

    def geom_row(rr, xa, ya, need_w):
        """(K, L) pair geometry of all anchors vs candidate row ``rr``
        (masking discipline identical to _geometry)."""
        xv = scr[0][pl.ds(rr, 1), :]
        yv = scr[1][pl.ds(rr, 1), :]
        isfv = scr[2][pl.ds(rr, 1), :]
        dx = xa - xv
        if spec.nx < 3:
            dx = dx - spec.DL * jnp.round(dx / spec.DL)
        dyv = ya - yv
        r2 = dx * dx + dyv * dyv
        fvalid = ((r2 < spec.cutoff * spec.cutoff)
                  & (r2 > 1e-24)).astype(fdtype)
        rs = jax.lax.rsqrt(jnp.maximum(r2, 1e-24))
        r = r2 * rs
        sigma = 10.0 / (7.0 * math.pi * h * h)
        q = r / h
        tq = 2.0 - q
        if need_w:
            w = jnp.where(q < 1.0,
                          sigma * (1.0 - 1.5 * q * q + 0.75 * q ** 3),
                          jnp.where(q < 2.0, sigma * 0.25 * tq ** 3, 0.0))
            w = w * fvalid
        else:
            w = None
        soh = sigma / h
        dw = jnp.where(q < 1.0, q * (2.25 * soh * q - 3.0 * soh),
                       jnp.where(q < 2.0, -0.75 * soh * tq * tq, 0.0))
        m1 = fvalid * isfv
        mw = fvalid - m1
        return r, dx * rs, dyv * rs, w, dw, m1, mw

    zkl = jnp.zeros((K, L), fdtype)

    # ---- sweep 0: density (sph_physics_mex.c:178-234) ----
    @_when(sweep == 0)
    def _density():
        @pl.when(grp == 0)
        def _():
            for c in (volO, b11O, b12O, b21O, b22O, vx2O, vy2O):
                c[0, :, :] = jnp.zeros((K, nx + 2), fdtype)
                c[nyp + 1, :, :] = jnp.zeros((K, nx + 2), fdtype)

        _stage(scr[0], xC, g0, spec, R)
        _stage(scr[1], yC, g0, spec, R)
        _stage(scr[2], isfC, g0, spec, R)
        _stage(scr[3], massC, g0, spec, R)
        _stage_aside(aside[0], drC, g0, spec, R, halo=False)
        xa, ya = scr[0][A, :], scr[1][A, :]
        af = scr[2][A, :]
        massa = scr[3][A, :]
        inv_rho0 = 1.0 / rho0

        def rbody(rr, accs):
            s_in, s_ct, cntA = accs
            r, ex, ey, w, dw, m1, mw = geom_row(rr, xa, ya, True)
            massv = scr[3][pl.ds(rr, 1), :]
            return (s_in + w * m1,
                    s_ct + w * (massv * inv_rho0) * mw,
                    cntA + 0.5 * m1 + mw)

        s_in, s_ct, cntA = sweep_rows(rbody, (zkl, zkl, zkl))
        mass_safe = jnp.where(massa > 0, massa, 1.0)
        rho = ((_w0(h) + s_in) * rho0 * inv_sigma0
               + s_ct * rho0 * rho0 * inv_sigma0 / mass_safe)
        rho = jnp.where(rho <= 1e-12, rho0, rho)
        rho = jnp.where(af > 0, rho, rho0)   # walls keep rho0
        vol = jnp.where(massa > 0, mass_safe / rho, 0.0)
        dra = aside[0][:, :]
        rho_half = jnp.where(
            af > 0,
            jnp.where(rho + 0.5 * dt * dra < 1e-10, rho0,
                      rho + 0.5 * dt * dra),
            rho)
        rho_half = jnp.where(massa > 0, rho_half, 0.0)
        p_half = jnp.where(af > 0, p0 * (rho_half / rho0 - 1.0), 0.0)
        acc[0][:, :] = vol
        acc[1][:, :] = rho_half
        acc[2][:, :] = p_half
        # reference pair-count convention (fluid-rooted, store-once)
        cntO[pl.ds(grp, 1), :] = jnp.sum(af * cntA, axis=0, keepdims=True)
        _flush(volO, acc[0], g0, spec, R, halo=True)
        rhoHS, pHS = refs[-4], refs[-3]
        _flush(rhoHS, acc[1], g0, spec, R, halo=True)
        _flush(pHS, acc[2], g0, spec, R, halo=True)

        @pl.when(grp == 0)
        def _():
            rhoHS[0, :, :] = jnp.zeros((K, nx + 2), fdtype)
            rhoHS[nyp + 1, :, :] = jnp.zeros((K, nx + 2), fdtype)
            pHS[0, :, :] = jnp.zeros((K, nx + 2), fdtype)
            pHS[nyp + 1, :, :] = jnp.zeros((K, nx + 2), fdtype)

    # ---- sweep 1: kernel gradient correction (c:239-365) ----
    @_when(sweep == 1)
    def _kgc():
        _stage(scr[0], xC, g0, spec, R)
        _stage(scr[1], yC, g0, spec, R)
        _stage(scr[2], isfC, g0, spec, R)
        _stage(scr[3], volO, g0, spec, R)
        xa, ya = scr[0][A, :], scr[1][A, :]
        af = scr[2][A, :]

        def rbody(rr, accs):
            a11, a12, a22 = accs
            r, ex, ey, w, dw, m1, mw = geom_row(rr, xa, ya, False)
            volv = scr[3][pl.ds(rr, 1), :]
            rf = r * dw * volv * (m1 + mw)
            return (a11 - rf * ex * ex, a12 - rf * ex * ey,
                    a22 - rf * ey * ey)

        a11, a12, a22 = sweep_rows(rbody, (zkl, zkl, zkl))
        a21 = a12
        # regularized pseudo-inverse blend (c:321-365)
        ata11 = a11 * a11 + a21 * a21 + 1e-8
        ata12 = a11 * a12 + a21 * a22
        ata22 = a12 * a12 + a22 * a22 + 1e-8
        det_m = ata11 * ata22 - ata12 * ata12
        degen = jnp.abs(det_m) < 1e-20
        det_safe = jnp.where(degen, 1.0, det_m)
        im11 = ata22 / det_safe
        im12 = -ata12 / det_safe
        im22 = ata11 / det_safe
        p11 = jnp.where(degen, 1.0, im11 * a11 + im12 * a12)
        p12 = jnp.where(degen, 0.0, im11 * a21 + im12 * a22)
        p21 = jnp.where(degen, 0.0, im12 * a11 + im22 * a12)
        p22 = jnp.where(degen, 1.0, im12 * a21 + im22 * a22)
        det_a = a11 * a22 - a12 * a21
        det_sqr = jnp.maximum(1.0 - det_a, 0.0)
        denom = det_a + det_sqr
        small = jnp.abs(denom) < 1e-12
        denom_safe = jnp.where(small, 1.0, denom)
        w1 = jnp.where(small, 0.0, det_a / denom_safe)
        w2 = jnp.where(small, 1.0, det_sqr / denom_safe)
        acc[0][:, :] = jnp.where(af > 0, w1 * p11 + w2, 1.0)
        acc[1][:, :] = jnp.where(af > 0, w1 * p12, 0.0)
        acc[2][:, :] = jnp.where(af > 0, w1 * p21, 0.0)
        acc[3][:, :] = jnp.where(af > 0, w1 * p22 + w2, 1.0)
        _flush(b11O, acc[0], g0, spec, R, halo=True)
        _flush(b12O, acc[1], g0, spec, R, halo=True)
        _flush(b21O, acc[2], g0, spec, R, halo=True)
        _flush(b22O, acc[3], g0, spec, R, halo=True)

    # ---- sweep 2: viscous + shifting + Riemann pressure + kick ----
    # (c:466-545 viscous, :633-709 shifting, :867-957 pressure,
    #  :1388-1409 kick) — two candidate passes, see docstring
    @_when(sweep == 2)
    def _forces():
        rhoHS, pHS, dxsS, dysS = refs[-4], refs[-3], refs[-2], refs[-1]
        _stage(scr[0], xC, g0, spec, R)
        _stage(scr[1], yC, g0, spec, R)
        _stage(scr[2], isfC, g0, spec, R)
        _stage(scr[3], volO, g0, spec, R)
        _stage(scr[4], vxC, g0, spec, R)
        _stage(scr[5], vyC, g0, spec, R)
        _stage(scr[6], b11O, g0, spec, R)
        _stage(scr[7], b12O, g0, spec, R)
        _stage(scr[8], b21O, g0, spec, R)
        _stage(scr[9], b22O, g0, spec, R)
        _stage(scr[10], rhoHS, g0, spec, R)
        _stage(scr[11], pHS, g0, spec, R)
        _stage(scr[12], wvxC, g0, spec, R)
        _stage(scr[13], wvyC, g0, spec, R)
        _stage_aside(aside[0], massC, g0, spec, R, halo=True)
        xa, ya = scr[0][A, :], scr[1][A, :]
        af = scr[2][A, :]
        vola = scr[3][A, :]
        vxa, vya = scr[4][A, :], scr[5][A, :]
        b11a, b12a = scr[6][A, :], scr[7][A, :]
        b21a, b22a = scr[8][A, :], scr[9][A, :]
        massa = aside[0][:, :]

        def rbodyA(rr, accs):
            acc_x, acc_y, inc_x, inc_y = accs
            r, ex, ey, w, dw, m1, mw = geom_row(rr, xa, ya, False)
            volv = scr[3][pl.ds(rr, 1), :]
            vxv = scr[4][pl.ds(rr, 1), :]
            vyv = scr[5][pl.ds(rr, 1), :]
            b11v = scr[6][pl.ds(rr, 1), :]
            b12v = scr[7][pl.ds(rr, 1), :]
            b21v = scr[8][pl.ds(rr, 1), :]
            b22v = scr[9][pl.ds(rr, 1), :]
            wvxv = scr[12][pl.ds(rr, 1), :]
            wvyv = scr[13][pl.ds(rr, 1), :]
            dwv = dw * volv
            dwv1 = dwv * m1
            dwvw = dwv * mw
            tx_f = (b11a + b11v) * ex + (b12a + b12v) * ey
            ty_f = (b21a + b21v) * ex + (b22a + b22v) * ey
            tx_w = b11a * ex + b12a * ey
            ty_w = b21a * ex + b22a * ey
            ebe_f = ex * tx_f + ey * ty_f
            ebe_w = ex * tx_w + ey * ty_w
            inv_denom = 1.0 / (r + 0.01 * h)
            cf_p = ebe_f * mu * inv_denom * dwv1
            cw_p = wf * ebe_w * mu * inv_denom * dwvw
            return (acc_x + cf_p * (vxa - vxv) + cw_p * (vxa - wvxv),
                    acc_y + cf_p * (vya - vyv) + cw_p * (vya - wvyv),
                    inc_x - dwv1 * tx_f - 2.0 * dwvw * tx_w,
                    inc_y - dwv1 * ty_f - 2.0 * dwvw * ty_w)

        acc_x, acc_y, inc_x, inc_y = sweep_rows(
            rbodyA, (zkl, zkl, zkl, zkl))
        fpx = jnp.where(af > 0, acc_x * vola + massa * g, 0.0)
        fpy = jnp.where(af > 0, acc_y * vola, 0.0)
        limiter = jnp.clip(
            100.0 * (inc_x * inc_x + inc_y * inc_y) / (h * h), 0.0, 1.0)
        shift = transport_coeff * h * h * limiter * af
        mass_safe = jnp.where(massa > 0, massa, 1.0)
        ax_prior = fpx / mass_safe
        ay_prior = fpy / mass_safe
        rhoha = scr[10][A, :]
        pha = scr[11][A, :]

        def rbodyB(rr, accs):
            pacc_x, pacc_y = accs
            r, ex, ey, w, dw, m1, mw = geom_row(rr, xa, ya, False)
            volv = scr[3][pl.ds(rr, 1), :]
            vxv = scr[4][pl.ds(rr, 1), :]
            vyv = scr[5][pl.ds(rr, 1), :]
            b11v = scr[6][pl.ds(rr, 1), :]
            b12v = scr[7][pl.ds(rr, 1), :]
            b21v = scr[8][pl.ds(rr, 1), :]
            b22v = scr[9][pl.ds(rr, 1), :]
            rhohv = scr[10][pl.ds(rr, 1), :]
            phv = scr[11][pl.ds(rr, 1), :]
            dwv = dw * volv
            dwv1 = dwv * m1
            dwvw = dwv * mw
            tx_f = (b11a + b11v) * ex + (b12a + b12v) * ey
            ty_f = (b21a + b21v) * ex + (b22a + b22v) * ey
            tx_w = b11a * ex + b12a * ey
            ty_w = b21a * ex + b22a * ey
            rho_bar = 0.5 * (rhoha + rhohv)
            un_l = vxa * ex + vya * ey
            un_r = vxv * ex + vyv * ey
            beta = jnp.minimum(3.0 * jnp.maximum(un_l - un_r, 0.0), c_f)
            p_avg = 0.5 * (pha + phv)
            p_star = p_avg + 0.5 * beta * rho_bar * (un_l - un_r)
            p_face = 0.5 * (p_avg + p_star)
            face_acc = -(ax_prior * ex + ay_prior * ey)
            p_wall = pha + rhoha * r * jnp.maximum(0.0, face_acc)
            return (pacc_x - (p_face * tx_f * dwv1
                              + (pha + p_wall) * tx_w * dwvw),
                    pacc_y - (p_face * ty_f * dwv1
                              + (pha + p_wall) * ty_w * dwvw))

        pacc_x, pacc_y = sweep_rows(rbodyB, (zkl, zkl))
        fx = jnp.where(af > 0, pacc_x * vola, 0.0)
        fy = jnp.where(af > 0, pacc_y * vola, 0.0)
        inv_m = 1.0 / mass_safe
        vx2 = jnp.where(af > 0, vxa + (fpx + fx) * inv_m * dt, 0.0)
        vy2 = jnp.where(af > 0, vya + (fpy + fy) * inv_m * dt, 0.0)
        acc[0][:, :] = vx2
        acc[1][:, :] = vy2
        acc[2][:, :] = fx
        acc[3][:, :] = fy
        acc[4][:, :] = fpx
        acc[5][:, :] = fpy
        acc[6][:, :] = shift * inc_x
        acc[7][:, :] = shift * inc_y
        _flush(vx2O, acc[0], g0, spec, R, halo=True)
        _flush(vy2O, acc[1], g0, spec, R, halo=True)
        _flush(fxO, acc[2], g0, spec, R, halo=False)
        _flush(fyO, acc[3], g0, spec, R, halo=False)
        _flush(fpxO, acc[4], g0, spec, R, halo=False)
        _flush(fpyO, acc[5], g0, spec, R, halo=False)
        _flush(dxsS, acc[6], g0, spec, R, halo=False)
        _flush(dysS, acc[7], g0, spec, R, halo=False)

    # ---- sweep 3: continuity + finalize + position update ----
    # (c:1073-1116 continuity, :1429-1451 finalize)
    @_when(sweep == 3)
    def _continuity():
        rhoHS, pHS, dxsS, dysS = refs[-4], refs[-3], refs[-2], refs[-1]
        _stage(scr[0], xC, g0, spec, R)
        _stage(scr[1], yC, g0, spec, R)
        _stage(scr[2], isfC, g0, spec, R)
        _stage(scr[3], volO, g0, spec, R)
        _stage(scr[4], vx2O, g0, spec, R)
        _stage(scr[5], vy2O, g0, spec, R)
        _stage(scr[6], wvxC, g0, spec, R)
        _stage(scr[7], wvyC, g0, spec, R)
        _stage_aside(aside[0], rhoHS, g0, spec, R, halo=True)
        _stage_aside(aside[1], vxC, g0, spec, R, halo=True)
        _stage_aside(aside[2], vyC, g0, spec, R, halo=True)
        _stage_aside(aside[3], dxsS, g0, spec, R, halo=False)
        _stage_aside(aside[4], dysS, g0, spec, R, halo=False)
        xa, ya = scr[0][A, :], scr[1][A, :]
        af = scr[2][A, :]
        vx2a, vy2a = scr[4][A, :], scr[5][A, :]

        def rbody(rr, accs):
            (rate,) = accs
            r, ex, ey, w, dw, m1, mw = geom_row(rr, xa, ya, False)
            volv = scr[3][pl.ds(rr, 1), :]
            vx2v = scr[4][pl.ds(rr, 1), :]
            vy2v = scr[5][pl.ds(rr, 1), :]
            wvxv = scr[6][pl.ds(rr, 1), :]
            wvyv = scr[7][pl.ds(rr, 1), :]
            dwv = dw * volv
            u_jump_f = (vx2a - vx2v) * ex + (vy2a - vy2v) * ey
            u_jump_w = 2.0 * ((vx2a - wvxv) * ex + (vy2a - wvyv) * ey)
            return (rate + u_jump_f * dwv * m1 + u_jump_w * dwv * mw,)

        (rate,) = sweep_rows(rbody, (zkl,))
        rhoha = aside[0][:, :]
        drho_new = jnp.where(af > 0, rate * rhoha, 0.0)
        rho_new = rhoha + 0.5 * dt * drho_new
        rho_new = jnp.where(rho_new < 1e-10, rho0, rho_new)
        rho_new = jnp.where(af > 0, rho_new, rhoha)
        p_new = jnp.where(af > 0, p0 * (rho_new / rho0 - 1.0), 0.0)
        vxa_old = aside[1][:, :]
        vya_old = aside[2][:, :]
        x2 = xa + aside[3][:, :] + 0.5 * dt * (vxa_old + vx2a)
        y2 = ya + aside[4][:, :] + 0.5 * dt * (vya_old + vy2a)
        x2 = jnp.where(af > 0, x2, xa)   # walls/empties never move
        y2 = jnp.where(af > 0, y2, ya)
        acc[0][:, :] = rho_new
        acc[1][:, :] = p_new
        acc[2][:, :] = drho_new
        acc[3][:, :] = x2
        acc[4][:, :] = y2
        _flush(rhoO, acc[0], g0, spec, R, halo=False)
        _flush(pO, acc[1], g0, spec, R, halo=False)
        _flush(drhoO, acc[2], g0, spec, R, halo=False)
        _flush(x2O, acc[3], g0, spec, R, halo=False)
        _flush(y2O, acc[4], g0, spec, R, halo=False)


def _fused_call(spec: GridSpec, cores, occ, dt, scalars):
    """pallas_call wrapper for the fused step. ``cores``: the 9 input
    cores; ``occ``: (n_groups, 1) int32 k-loop bounds; ``dt`` and the
    (g, mu, wall_visc_factor) tail of ``scalars`` may be traced (they
    ride the SMEM params row). Returns the 17 outputs."""
    R, L, n_groups, nyp = plan(spec)
    nx, K = spec.nx, spec.K
    dtype = cores[0].dtype
    halo_shape = (nyp + 2, K, nx + 2)
    plain_shape = (nyp, K, nx)

    rows = use_rows(spec, dtype)
    cm, kc = ("none", 0) if rows else cache_plan(spec, dtype)
    if (cm in ("ring", "partial")
            and _cache_bytes(spec, dtype, _RING_DEPTH,
                             kc if cm == "partial" else None)
            > (_RING_CACHE_BUDGET if cm == "ring"
               else _PARTIAL_CACHE_BUDGET)):
        # The single-step kernel serves init / in-loop logging / tests —
        # never the hot path (FusedEngine._step docstring) — but it pays
        # the same scoped-VMEM stack as the chunk kernel. A FORCED
        # ring/partial whose cache busts cache_plan's own auto budgets
        # (SPH_PLAN_R / SPH_GEOM_CACHE probe configs) OOMs Mosaic here
        # with a scoped stack that chases any granted limit (measured
        # 112.7 MB @ 100 -> 123.2 MB @ 123, round 5). Cache modes are
        # bit-/ULP-equivalent (test_pallas.py:
        # test_geom_cache_modes_bit_identical), so the one-shot kernel
        # drops to the full cache when it fits, else to recompute;
        # auto-planned configs (all shipping grids) are never affected.
        cm, kc = (("full", K) if use_geom_cache(spec, dtype)
                  else ("none", 0))
    gc = cm != "none"
    ring = cm in ("ring", "partial")
    n_slots = _RING_DEPTH if ring else n_groups
    kernel = functools.partial(_step_kernel, spec=spec, R=R, L=L,
                               n_groups=n_groups, nyp=nyp,
                               scalars=scalars[:5] + (None, None, None),
                               n_cache=_N_CACHE if gc else 0, rows=rows,
                               ring=ring,
                               k_cut=kc if cm == "partial" else None)
    out_shape = ([jax.ShapeDtypeStruct(halo_shape, dtype)] * _HALO_OUT
                 + [jax.ShapeDtypeStruct(plain_shape, dtype)] * _PLAIN_OUT
                 + [jax.ShapeDtypeStruct((n_groups, L), dtype)])
    params = jnp.stack([jnp.asarray(dt, dtype),
                        jnp.asarray(scalars[5], dtype),
                        jnp.asarray(scalars[6], dtype),
                        jnp.asarray(scalars[7], dtype)]).reshape(1, 4)
    return pl.pallas_call(
        kernel,
        grid=(n_groups + 3, 4) if ring else (4, n_groups),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * _N_OUT,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((9 * K, L), dtype) for _ in range(_N_SCR_FULL)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(_N_ACC)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(_N_ASIDE)]
            + [pltpu.VMEM(halo_shape, dtype),    # rho_half core
               pltpu.VMEM(halo_shape, dtype),    # p_half core
               pltpu.VMEM(plain_shape, dtype),   # dx_shift core
               pltpu.VMEM(plain_shape, dtype)]   # dy_shift core
            + ([pltpu.VMEM((n_slots * kc, 9 * K, L), dtype)
                for _ in range(_N_CACHE)] if gc else [])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(cm)),
        interpret=_interpret(),
    )(*cores, occ, params)


# ---------------------------------------------------------------------------
# the multi-step chunk kernel (v3): up to `rebuild_every` steps per call
# ---------------------------------------------------------------------------

_C_IN = 14   # xH0 yH0 vxH0 vyH0 drP0 isfC massC wvxC wvyC refxP
#              refyP (VMEM) + occs, params(1,8), nsub(1,1) (SMEM);
#              params row: [t, t_comp, interval, g, mu, wf, 0, 0]
_C_STATE = 5  # leading outputs: xHs yHs vxHs vyHs drPs (working state)

def _chunk_kernel(*refs, spec, R, L, n_groups, nyp, scalars, n_cache=0,
                  rows=False, ring=False, k_cut=None):
    """Run up to ``nsub`` whole physics steps inside ONE kernel: the state
    cores live in the output refs (VMEM) across steps, the four pair
    sweeps reuse ``_kernel_body`` verbatim, and the per-step XLA glue
    (verlet dt, periodic wrap, skin guard, halo rebuild) happens in-kernel
    on whole cores. Per call the only HBM traffic is the one-time core
    in/out; the per-call fixed cost (~0.09 ms on v5e) amortizes over the
    chunk. The candidate REBUILD stays XLA-side (argsort/scatter), so a
    chunk ends exactly at the rebuild cadence — semantics are identical to
    the single-step loop (same steps, same rebuild points, same guard
    observation schedule)."""
    (rho0, p0, c_f, inv_sigma0, transport_coeff) = scalars[:5]
    nx, K, h = spec.nx, spec.K, spec.h
    DL = spec.DL

    if n_cache:
        cache = refs[-n_cache:]
        refs = refs[:-n_cache]
    else:
        cache = None
    (xH0, yH0, vxH0, vyH0, drP0, isfC, massC, wvxC, wvyC,
     refxP, refyP, occs, params, nsub) = refs[:_C_IN]
    state = refs[_C_IN:_C_IN + _C_STATE]
    outs17 = refs[_C_IN + _C_STATE:_C_IN + _C_STATE + _N_OUT]
    steps_o = refs[_C_IN + _C_STATE + _N_OUT]
    t_o = refs[_C_IN + _C_STATE + _N_OUT + 1]
    scratch = refs[_C_IN + _C_STATE + _N_OUT + 2:]
    xHs, yHs, vxHs, vyHs, drPs = state
    (volO, b11O, b12O, b21O, b22O, vx2O, vy2O,
     rhoO, pO, drhoO, fxO, fyO, fpxO, fpyO, x2O, y2O, cntO) = outs17
    fdtype = xH0.dtype
    g, mu, wf = params[0, 3], params[0, 4], params[0, 5]
    full_scalars = (rho0, p0, c_f, inv_sigma0, transport_coeff, g, mu, wf)

    # working state starts as the incoming cores (y-halo rows arrive 0 and
    # are never written again; x-halo columns are refreshed every step)
    xHs[...] = xH0[...]
    yHs[...] = yH0[...]
    vxHs[...] = vxH0[...]
    vyHs[...] = vyH0[...]
    drPs[...] = drP0[...]

    body_refs = ((xHs, yHs, vxHs, vyHs, drPs, isfC, massC, wvxC, wvyC,
                  occs, params) + tuple(outs17) + tuple(scratch))

    nu = mu / rho0
    dt_visc = 0.125 * h * h / jnp.maximum(nu, 1e-12)
    dt_body = 0.25 * jnp.sqrt(h / jnp.maximum(jnp.abs(g), 1e-12))
    interval = params[0, 2]
    n_sub = nsub[0, 0]

    def cond(c):
        steps, t, tc = c
        return jnp.logical_and(steps < n_sub, t < interval)

    def step_body(c):
        steps, t, tc = c
        # max over the entire core equals the fluid-only verlet_dt max by
        # invariant: the kick writes 0 to every wall and empty slot
        # (jnp.where(af > 0, ...) in sweep 2), so non-fluid slots can never
        # contribute to v_max
        v_max = jnp.sqrt(jnp.max(vxHs[...] ** 2 + vyHs[...] ** 2))
        remain = interval - t
        dt_ac = 0.25 * h / jnp.maximum(c_f + v_max, 1e-12)
        dt = jnp.maximum(
            jnp.minimum(jnp.minimum(dt_ac, jnp.asarray(dt_visc, fdtype)),
                        jnp.minimum(jnp.asarray(dt_body, fdtype), remain)),
            1e-12)

        def run_cell(s, grp):
            if rows:
                _kernel_body_rows(
                    body_refs, spec=spec, R=R, L=L,
                    n_groups=n_groups, nyp=nyp, scalars=full_scalars,
                    sweep=s, grp=grp, dt=dt, kmax=occs[grp, 0],
                    occs=occs)
            else:
                _kernel_body(body_refs, spec=spec, R=R, L=L,
                             n_groups=n_groups, nyp=nyp,
                             scalars=full_scalars, sweep=s, grp=grp,
                             dt=dt, kmax=occs[grp, 0], cache=cache,
                             ring=ring, k_cut=k_cut)

        if ring:
            # wavefront schedule (see the ring cache-layout note): phase
            # p runs sweep s on group p - s; each sweep body is emitted
            # once (static s) behind a group-validity predicate
            def pbody(p, carry):
                for s in range(4):
                    grp = p - s
                    grp_c = jnp.clip(grp, 0, n_groups - 1)

                    @pl.when(jnp.logical_and(grp >= 0, grp < n_groups))
                    def _(s=s, grp_c=grp_c):
                        run_cell(s, grp_c)
                return carry
            jax.lax.fori_loop(0, n_groups + 3, pbody, 0)
        else:
            for s in range(4):
                def gbody(grp, carry, s=s):
                    run_cell(s, grp)
                    return carry
                jax.lax.fori_loop(0, n_groups, gbody, 0)

        # positions stay UNWRAPPED within a chunk: pair dx through the
        # translated x-halos requires center values continuous with the
        # frozen cell assignment (a mid-chunk wrap would teleport a seam
        # particle DL away from its cell). The caller wraps at rebuilds
        # and interval ends; per-chunk drift is microscopic (<= n_sub *
        # v_max * dt ~ 1e-2 * dp).
        x2w = x2O[...]
        y2w = y2O[...]

        # Kahan-compensated interval clock (stepper._t_add)
        yk = dt - tc
        t2 = t + yk
        tc2 = (t2 - t) - yk

        # NOTE the displacement guard is NOT in the loop: every in-kernel
        # variant was measured slower than it looks — the exact 8-pass
        # reduction costs ~0.05 ms/step (~30% of a step), and predicating
        # it (pl.when / lax.cond) keeps the full cost anyway because
        # Mosaic lowers large-body predication to execute-and-select.
        # Validity is instead checked ONCE PER CHUNK, XLA-side, by
        # ``pair_drift_exceeded`` on the returned position cores — the
        # chunk boundary IS the rebuild cadence, which is exactly the
        # window candidate validity must cover (see that function for the
        # soundness argument).

        # halo-ify back into the working state (TRANSLATED x columns, the
        # ghost-entry copies; nx < 3 keeps the BIG/0 input halos per
        # make_core's dedup and relies on min-image)
        xHs[1:nyp + 1, :, 1:nx + 1] = x2w
        yHs[1:nyp + 1, :, 1:nx + 1] = y2w
        if nx >= 3:
            xHs[1:nyp + 1, :, 0:1] = x2w[:, :, nx - 1:nx] - DL
            xHs[1:nyp + 1, :, nx + 1:nx + 2] = x2w[:, :, 0:1] + DL
            yHs[1:nyp + 1, :, 0:1] = y2w[:, :, nx - 1:nx]
            yHs[1:nyp + 1, :, nx + 1:nx + 2] = y2w[:, :, 0:1]
        vxHs[...] = vx2O[...]
        vyHs[...] = vy2O[...]
        drPs[...] = drhoO[...]

        return (steps + 1, t2, tc2)

    steps, t, tc = jax.lax.while_loop(
        cond, step_body,
        (jnp.asarray(0, jnp.int32), params[0, 0], params[0, 1]))
    steps_o[0, 0] = steps
    t_o[0, 0] = t
    t_o[0, 1] = tc


def fused_chunk_call(spec: GridSpec, lay: FusedLayout, xH, yH, vxH, vyH,
                     drP, t_local, t_comp, interval_len, n_sub,
                     rho0: float, p0: float, c_f: float, inv_sigma0: float,
                     transport_coeff: float, g, mu,
                     wall_visc_factor: float = 4.0):
    """Run up to ``n_sub`` steps in one kernel call. Returns
    (state_cores_dict, aux_outs_dict, steps_done, t_new, t_comp_new).
    Candidate validity is NOT checked in-kernel (every in-kernel guard
    variant measured ~30% of the step; TPU predication executes both
    paths) — the caller must run ``pair_drift_exceeded`` on the returned
    position cores before rebuilding (stepper.PallasCellEngine does).

    ``g``, ``mu`` and ``wall_visc_factor`` may be traced scalars (SMEM
    params row) — (g, mu) sweep lanes share ONE compile."""
    R, L, n_groups, nyp = plan(spec)
    nx, K = spec.nx, spec.K
    dtype = xH.dtype
    halo_shape = (nyp + 2, K, nx + 2)
    plain_shape = (nyp, K, nx)
    scalars = (rho0, p0, c_f, inv_sigma0, transport_coeff)
    rows = use_rows(spec, dtype)
    cm, kc = ("none", 0) if rows else cache_plan(spec, dtype)
    gc = cm != "none"
    n_slots = _RING_DEPTH if cm in ("ring", "partial") else n_groups
    kernel = functools.partial(_chunk_kernel, spec=spec, R=R, L=L,
                               n_groups=n_groups, nyp=nyp, scalars=scalars,
                               n_cache=_N_CACHE if gc else 0, rows=rows,
                               ring=cm in ("ring", "partial"),
                               k_cut=kc if cm == "partial" else None)
    params = jnp.stack([jnp.asarray(t_local, dtype),
                        jnp.asarray(t_comp, dtype),
                        jnp.asarray(interval_len, dtype),
                        jnp.asarray(g, dtype),
                        jnp.asarray(mu, dtype),
                        jnp.asarray(wall_visc_factor, dtype),
                        jnp.asarray(0.0, dtype),
                        jnp.asarray(0.0, dtype)]).reshape(1, 8)
    nsub = jnp.asarray(n_sub, jnp.int32).reshape(1, 1)
    out_shape = (
        [jax.ShapeDtypeStruct(halo_shape, dtype)] * 4      # state halo'd
        + [jax.ShapeDtypeStruct(plain_shape, dtype)]       # drPs
        + [jax.ShapeDtypeStruct(halo_shape, dtype)] * _HALO_OUT
        + [jax.ShapeDtypeStruct(plain_shape, dtype)] * _PLAIN_OUT
        + [jax.ShapeDtypeStruct((n_groups, L), dtype)]     # cnt
        + [jax.ShapeDtypeStruct((1, 1), jnp.int32),        # steps
           jax.ShapeDtypeStruct((1, 2), dtype)])           # t, t_comp
    outs = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3),
        out_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)]
                   * (_C_STATE + _N_OUT)
                   + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2),
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((9 * K, L), dtype) for _ in range(_N_SCR_FULL)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(_N_ACC)]
            + [pltpu.VMEM((K, L), dtype) for _ in range(_N_ASIDE)]
            + [pltpu.VMEM(halo_shape, dtype),    # rho_half core
               pltpu.VMEM(halo_shape, dtype),    # p_half core
               pltpu.VMEM(plain_shape, dtype),   # dx_shift core
               pltpu.VMEM(plain_shape, dtype)]   # dy_shift core
            + ([pltpu.VMEM((n_slots * kc, 9 * K, L), dtype)
                for _ in range(_N_CACHE)] if gc else [])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(cm)),
        interpret=_interpret(),
    )(xH, yH, vxH, vyH, drP, lay.isf_c, lay.mass_c, lay.wvx_c,
      lay.wvy_c, lay.refx_p, lay.refy_p, lay.occ, params, nsub)
    (xHs, yHs, vxHs, vyHs, drPs,
     volH, b11H, b12H, b21H, b22H, vx2H, vy2H,
     rhoP, pP, drhoP, fxP, fyP, fpxP, fpyP, x2P, y2P, cnt,
     steps_o, t_o) = outs
    st = dict(xH=xHs, yH=yHs, vxH=vxHs, vyH=vyHs, drP=drPs,
              xP=x2P, yP=y2P)
    aux = dict(volH=volH, b11H=b11H, b12H=b12H, b21H=b21H, b22H=b22H,
               rhoP=rhoP, pP=pP, drP=drhoP, fxP=fxP, fyP=fyP,
               fpxP=fpxP, fpyP=fpyP, cnt=cnt)
    return (st, aux, steps_o[0, 0], t_o[0, 0], t_o[0, 1])


def pair_drift_bounds(spec: GridSpec, lay: FusedLayout, x2P, y2P):
    """Per-sub-chunk candidate-validity bounds (XLA-side): the guard of
    the chunk engine. Returns per-axis upper bounds (bx, by) on the
    PAIR-RELATIVE displacement since the rebuild; candidates stay valid
    while bx <= skin_x = cell_x - cutoff AND by <= skin_y (beyond that
    the frozen 3x3 stencil can miss a pair that has come within the
    cutoff).

    Runs once per SUB-CHUNK on the returned position cores, NOT per step
    in-kernel (measured: the in-kernel reduction costs ~30% of a step
    and TPU predication cannot skip it). The stepper soft-stops
    sub-chunking and rebuilds when a 1.5x extrapolation of the last
    sub-chunk's increment would cross a budget OR when 3/4 of a budget
    is consumed (the floor catches plateau-then-burst trajectories the
    increment extrapolation is blind to). A genuine violation rolls the
    offending sub-chunk back, HALVES the sub-chunk length, and re-runs
    on fresh candidates (exponential backoff); only a single-step
    violation straight out of a rebuild hard-flags the run. Soundness of the sub-chunk
    granularity: drift is quasi-monotone (pair-relative velocity is
    shear-scale, ~per-mille of dp per step at validated dts), so an
    above-budget excursion that RETURNS below the budget within one
    sub-chunk would need pair-relative speeds orders beyond the
    dt-stable regime; the 20 s validation runs assert the flag stays
    clean end-to-end (docs/VALIDATION.md).

    Formula: fluid slots contribute their drift; wall slots anchor the
    range at 0 (a fluid-wall pair's relative displacement IS the fluid's
    absolute drift); empty slots are excluded (+-BIG sentinels) —
    anchoring them at 0 would defeat the pairwise cancellation of
    uniform advection. A candidate pair's rebuild cells differ by <= 1
    in BOTH axes (3x3 stencil), so the max over 2-row x 2-column
    (x-wrapped) windows of the per-slot displacement range bounds every
    pair difference — the column locality matters: acoustic velocity
    fluctuations decorrelate across x, so a row-wide range would
    overestimate true pair drift several-fold (measured ~5x at developed
    flow). Positions are unwrapped between rebuilds, so no min-image is
    needed."""
    R, L, n_groups, nyp = plan(spec)
    nx = spec.nx
    fdtype = x2P.dtype
    fl = lay.isf_c[1:nyp + 1, :, 1:nx + 1] > 0
    occm = lay.refx_p < 0.5 * _BIG_X
    BIG = jnp.asarray(1e30, fdtype)

    # both axes ride ONE stacked array so the whole guard lowers to a
    # single chain of fused reductions (the two-pass form measured
    # ~0.116 ms/call on v5e — one launch-bound tiny kernel per op — vs
    # one chunk-kernel STEP at ~0.13 ms; this runs once per sub-chunk)
    d = jnp.stack([x2P - lay.refx_p, y2P - lay.refy_p])   # (2, nyp, K, nx)
    dmax = jnp.where(fl, d, jnp.where(occm, 0.0, -BIG))
    dmin = jnp.where(fl, d, jnp.where(occm, 0.0, BIG))
    mx = jnp.max(dmax, axis=2)            # (2, nyp, nx) over slot rank
    mn = jnp.min(dmin, axis=2)
    mx = jnp.maximum(mx[:, :-1], mx[:, 1:])     # 2-row windows
    mn = jnp.minimum(mn[:, :-1], mn[:, 1:])
    if nx >= 3:
        mx = jnp.maximum(mx, jnp.roll(mx, -1, axis=2))  # 2-col,
        mn = jnp.minimum(mn, jnp.roll(mn, -1, axis=2))  # x-wrapped
    else:
        mx = jnp.max(mx, axis=2, keepdims=True)
        mn = jnp.min(mn, axis=2, keepdims=True)
    # fully-empty windows: mx=-BIG, mn=+BIG -> clamped to 0
    b = jnp.max(jnp.maximum(mx - mn, 0.0), axis=(1, 2))
    return b[0], b[1]


def pair_drift_exceeded(spec: GridSpec, lay: FusedLayout, x2P, y2P):
    """Hard validity flag: True iff a per-axis drift bound exceeds its
    budget (see pair_drift_bounds)."""
    if spec.skin <= 0.0:
        return jnp.asarray(False)
    bx, by = pair_drift_bounds(spec, lay, x2P, y2P)
    return jnp.logical_or(bx > spec.skin_x, by > spec.skin_y)


def fused_step_cores(spec: GridSpec, lay: FusedLayout, xH, yH, vxH, vyH,
                     drP, dt, rho0: float, p0: float, c_f: float,
                     inv_sigma0: float, transport_coeff: float, g, mu,
                     wall_visc_factor: float = 4.0):
    """Core-level fused step: state stays in cell layout across steps.
    Inputs: halo'd position/velocity cores + plain drho_dt core. Returns a
    dict of output cores (names suffixed H = halo'd, P = plain) + ``cnt``
    (the per-lane pair-count rows). Per step, NOTHING is gathered back to
    particle order — per-particle state materializes only at rebuilds and
    interval ends (stepper.PallasCellEngine). ``g``/``mu``/
    ``wall_visc_factor`` may be traced (SMEM params row)."""
    cores = [xH, yH, vxH, vyH, drP,
             lay.isf_c, lay.mass_c, lay.wvx_c, lay.wvy_c]
    outs = _fused_call(
        spec, cores, lay.occ, dt,
        (rho0, p0, c_f, inv_sigma0, transport_coeff, g, mu,
         wall_visc_factor))
    (volH, b11H, b12H, b21H, b22H, vx2H, vy2H,
     rhoP, pP, drhoP, fxP, fyP, fpxP, fpyP, x2P, y2P, cnt) = outs
    return dict(volH=volH, b11H=b11H, b12H=b12H, b21H=b21H, b22H=b22H,
                vxH=vx2H, vyH=vy2H, rhoP=rhoP, pP=pP, drP=drhoP,
                fxP=fxP, fyP=fyP, fpxP=fpxP, fpyP=fpyP,
                xP=x2P, yP=y2P, cnt=cnt)


def take_h(lay: FusedLayout, core):
    """Collect a halo'd core back to particle order (one packed take)."""
    return core.reshape(-1)[lay.hidx]


def take_p(lay: FusedLayout, core):
    """Collect a plain core back to particle order (one packed take)."""
    return core.reshape(-1)[lay.pidx]


def fused_cell_step(spec: GridSpec, lay: FusedLayout, x, y, vx, vy,
                    drho_dt, dt, rho0: float, p0: float, c_f: float,
                    inv_sigma0: float, transport_coeff: float, g, mu,
                    wall_visc_factor: float = 4.0):
    """Per-particle wrapper of ``fused_step_cores`` (scatter -> kernel ->
    collect). Same operator order and formulas as cellgrid.cell_step / the
    reference inner loop (SPH_Poiseuille.m:254-283). Returns the
    per-particle dict of cell_step plus ``n_pairs``."""
    xH = make_core(spec, lay.pidx, x, fill=_BIG_X, xshift=spec.DL)
    yH, vxH, vyH = (make_core(spec, lay.pidx, v) for v in (y, vx, vy))
    drP = make_plain(spec, lay.pidx, drho_dt)
    o = fused_step_cores(
        spec, lay, xH, yH, vxH, vyH, drP, dt, rho0, p0, c_f, inv_sigma0,
        transport_coeff, g, mu, wall_visc_factor)
    n_pairs = jnp.round(jnp.sum(o["cnt"])).astype(jnp.int32)
    return dict(rho=take_p(lay, o["rhoP"]), p=take_p(lay, o["pP"]),
                drho_dt=take_p(lay, o["drP"]),
                vx=take_h(lay, o["vxH"]), vy=take_h(lay, o["vyH"]),
                fx=take_p(lay, o["fxP"]), fy=take_p(lay, o["fyP"]),
                fpx=take_p(lay, o["fpxP"]), fpy=take_p(lay, o["fpyP"]),
                vol=take_h(lay, o["volH"]), b11=take_h(lay, o["b11H"]),
                b12=take_h(lay, o["b12H"]), b21=take_h(lay, o["b21H"]),
                b22=take_h(lay, o["b22H"]),
                x=take_p(lay, o["xP"]), y=take_p(lay, o["yP"]),
                n_pairs=n_pairs)


# ---------------------------------------------------------------------------
# wall-shear monitor kernel (single sweep, same structure)
# ---------------------------------------------------------------------------


def _shear_kernel(*refs, spec, R, L, n_groups, nyp):
    nx, K, h = spec.nx, spec.K, spec.h
    (xC, yC, isfC, volC, vxC, b11C, b12C, b21C, b22C,
     wvxC, wbotC, wtopC, occs, params) = refs[:14]
    tbO, ttO = refs[14], refs[15]
    scr = refs[16:16 + 7]
    aside = refs[23:]
    mu, wf = params[0, 0], params[0, 1]

    grp = pl.program_id(0)
    g0 = grp * R
    kmax = occs[grp, 0]

    _stage(scr[0], xC, g0, spec, R)
    _stage(scr[1], yC, g0, spec, R)
    _stage(scr[2], isfC, g0, spec, R)
    _stage(scr[3], volC, g0, spec, R)
    _stage(scr[4], wvxC, g0, spec, R)
    _stage(scr[5], wbotC, g0, spec, R)
    _stage(scr[6], wtopC, g0, spec, R)
    _stage_aside(aside[0], vxC, g0, spec, R, halo=True)
    _stage_aside(aside[1], b11C, g0, spec, R, halo=True)
    _stage_aside(aside[2], b12C, g0, spec, R, halo=True)
    _stage_aside(aside[3], b21C, g0, spec, R, halo=True)
    _stage_aside(aside[4], b22C, g0, spec, R, halo=True)

    def kbody(k, carry):
        tb, tt = carry
        af, r, ex, ey, w, dw, m1, mw = _geometry(
            spec, k, scr[0], scr[1], scr[2], need_w=False)
        A = pl.ds(4 * K + k, 1)
        kA = pl.ds(k, 1)
        volv = scr[3][:, :]
        wvxv = scr[4][:, :]
        wbotv, wtopv = scr[5][:, :], scr[6][:, :]
        vxa = aside[0][kA, :]
        vola = scr[3][A, :]
        b11a = aside[1][kA, :]
        b12a = aside[2][kA, :]
        b21a = aside[3][kA, :]
        b22a = aside[4][kA, :]
        ebe = (ex * (b11a * ex + b12a * ey)
               + ey * (b21a * ex + b22a * ey))
        f_pair = (wf * mu * ebe * dw * volv * (vxa - wvxv)
                  / (r + 0.01 * h) * vola) * mw
        return (tb + jnp.sum(f_pair * wbotv, axis=0, keepdims=True),
                tt + jnp.sum(f_pair * wtopv, axis=0, keepdims=True))

    zero = jnp.zeros((1, L), xC.dtype)
    tb, tt = jax.lax.fori_loop(0, kmax, kbody, (zero, zero))
    tbO[pl.ds(grp, 1), :] = tb
    ttO[pl.ds(grp, 1), :] = tt


def fused_wall_shear_cores(spec: GridSpec, lay: FusedLayout, xH, yH, vxH,
                           volH, b11H, b12H, b21H, b22H, mu,
                           wall_visc_factor: float = 4.0):
    """Wall-shear monitor over cores already in the (freshly rebuilt)
    layout — ordering as the reference (after the rebuild,
    SPH_Poiseuille.m:280-283; formula sph_physics_mex.c:1713-1742)."""
    R, L, n_groups, nyp = plan(spec)
    dtype = xH.dtype
    cores = [xH, yH, lay.isf_c, volH, vxH, b11H, b12H, b21H, b22H,
             lay.wvx_c, lay.wbot_c, lay.wtop_c]
    kernel = functools.partial(_shear_kernel, spec=spec, R=R, L=L,
                               n_groups=n_groups, nyp=nyp)
    params = jnp.stack([jnp.asarray(mu, dtype),
                        jnp.asarray(wall_visc_factor, dtype)]).reshape(1, 2)
    tb, tt = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
                  + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((n_groups, L), dtype)] * 2,
        scratch_shapes=(
            [pltpu.VMEM((9 * spec.K, L), dtype) for _ in range(7)]
            + [pltpu.VMEM((spec.K, L), dtype) for _ in range(5)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*cores, lay.occ, params)
    return -jnp.sum(tb) / spec.DL, -jnp.sum(tt) / spec.DL


def fused_wall_shear(spec: GridSpec, lay: FusedLayout, x, y, vx, vol,
                     b11, b12, b21, b22, mu, wall_visc_factor: float = 4.0):
    """Per-particle wrapper of ``fused_wall_shear_cores``."""
    xH = make_core(spec, lay.pidx, x, fill=_BIG_X, xshift=spec.DL)
    yH, volH, vxH, b11H, b12H, b21H, b22H = (
        make_core(spec, lay.pidx, v)
        for v in (y, vol, vx, b11, b12, b21, b22))
    return fused_wall_shear_cores(
        spec, lay, xH, yH, vxH, volH, b11H, b12H, b21H, b22H, mu,
        wall_visc_factor)
