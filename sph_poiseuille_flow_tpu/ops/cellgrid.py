"""Cell-layout engine: the gather-free formulation of the SPH step.

The packed-gather engine (ops/neighbors.py + stepper) still spends most of
its time in 4 general gathers per step — XLA TPU lowers any general gather
to serialized scalar loads. This module removes general gathers from the
hot path entirely by changing the DATA LAYOUT instead of the access
pattern:

* at each candidate rebuild, every particle is assigned a slot in a padded
  ``(ny, nx, K)`` cell grid (K = per-cell capacity, sentinel slots empty);
* per step, carried per-particle state is scattered ONCE (packed) into the
  core layout; everything else happens per-slot;
* the 3x3 neighborhood of every cell is materialized by PURE STATIC
  SLICING: an x-halo (periodic wrap -> copy first/last cell columns, the
  layout-level equivalent of the reference's ghost entries,
  sph_neighbor_search_mex.c:267-295) plus shifted concatenations in x and
  y produce a ``(ny, nx, 9K)`` neighbor view per field — contiguous
  vectorized copies, no index lookups;
* all pair physics is elementwise over ``(S, K, 9K)`` blocks (S = ny*nx)
  with masked reductions over the last axis — the dense row-sum semantics
  of the reference's pair loops, identical to ops/{density,...}.py;
* per-slot results are collected back to particle order with ONE packed
  take at slot indices at the end of the step.

Self-pairs and halo self-images cancel automatically: a particle's own
halo copy sits at minimum-image distance 0 and is excluded by the r^2
lower bound; particle identity (pid) excludes the true self-pair.

The physics formulas are the same as the row-math ops (each cites the
reference); an equivalence test (tests/test_cellgrid.py) checks this
engine step-for-step against the gather engine.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .kernels import cubic_spline, w0
from .neighbors import GridSpec, _cell_coords
from .density import EPS_REG


class CellLayout(NamedTuple):
    """Per-rebuild slot assignment + static per-slot fields."""

    slot: jnp.ndarray       # (n_total,) int32 core slot id (cell*K + rank)
    pid_v: jnp.ndarray      # (S, 9K) neighbor-view particle ids (-1 empty)
    pid_a: jnp.ndarray      # (S, K) slot-side particle ids (-1 empty)
    valid_v: jnp.ndarray    # (S, 9K) f32 occupancy of the neighbor view
    isf_v: jnp.ndarray      # (S, 9K) f32 1.0 where neighbor is fluid
    mass_v: jnp.ndarray     # (S, 9K) neighbor mass
    wvx_v: jnp.ndarray      # (S, 9K) neighbor prescribed wall velocity
    wvy_v: jnp.ndarray
    wbot_v: jnp.ndarray     # (S, 9K) bottom-wall neighbor mask
    wtop_v: jnp.ndarray     # (S, 9K) top-wall neighbor mask
    a_fluid: jnp.ndarray    # (S, K) f32 1.0 where the slot holds a fluid
    a_valid: jnp.ndarray    # (S, K) f32 slot occupancy
    mass_a: jnp.ndarray     # (S, K) slot-side mass (1.0 in empty slots)
    ref_x: jnp.ndarray      # (n_total,) positions at rebuild (skin guard)
    ref_y: jnp.ndarray
    overflow: jnp.ndarray   # bool


def _core(spec: GridSpec, slot, arrays: Sequence[jnp.ndarray], fill=0.0,
          dtype=None):
    """Packed scatter of per-particle arrays into the (ny, nx, K, F) core."""
    F = len(arrays)
    pack = jnp.stack(arrays, axis=-1)
    if dtype is not None:
        pack = pack.astype(dtype)
    flat = jnp.full((spec.n_cells * spec.K, F), fill, pack.dtype)
    flat = flat.at[slot].set(pack, mode="drop")
    return flat.reshape(spec.ny, spec.nx, spec.K * F)


def _nview(spec: GridSpec, core):
    """(ny, nx, K*F) core -> (S, 9K*F) neighbor view via halo + shifted
    concatenation (static slices only).

    For tiny domains (nx < 3) the wrapped halo columns would revisit a cell
    the interior window already covers (nx=2: each cell sees the other via
    both the halo and the interior shift; nx=1: the cell sees itself via
    both halos), silently double-counting every cross-seam pair. Zero the
    halo columns there — the interior shifts alone already cover every
    cell, mirroring GridSpec.x_offsets' static dedup (the reference dedups
    dynamically via its seen_neighbor stamp,
    sph_neighbor_search_mex.c:298-303)."""
    ny, nx = spec.ny, spec.nx
    if nx >= 3:
        left, right = core[:, -1:], core[:, :1]
    else:
        left = right = jnp.zeros_like(core[:, :1])
    h = jnp.concatenate([left, core, right], axis=1)
    rows = jnp.concatenate([h[:, i:i + nx] for i in range(3)], axis=2)
    zrow = jnp.zeros_like(rows[:1])
    rp = jnp.concatenate([zrow, rows, zrow], axis=0)
    out = jnp.concatenate([rp[i:i + ny] for i in range(3)], axis=2)
    return out.reshape(ny * nx, -1)


def _unpack(view, F):
    """(S, 9K*F) -> tuple of F arrays (S, 9K) (fields interleaved per slot)."""
    S = view.shape[0]
    v = view.reshape(S, -1, F)
    return tuple(v[:, :, k] for k in range(F))


def _apack(core, F):
    """(ny, nx, K*F) core -> tuple of F arrays (S, K)."""
    s = core.shape[0] * core.shape[1]
    v = core.reshape(s, -1, F)
    return tuple(v[:, :, k] for k in range(F))


def assign_slots(spec: GridSpec, x, y):
    """Stable sort by cell id + rank-in-cell -> (slot, overflow). Shared by
    the XLA and Pallas layouts (the reference's linked-cell insert,
    sph_neighbor_search_mex.c:69-113, as a static-shape scatter)."""
    n = spec.n_total
    cx, cy = _cell_coords(spec, x, y)
    cid = cy * spec.nx + cx
    order = jnp.argsort(cid, stable=True).astype(jnp.int32)
    cid_sorted = cid[order]
    counts = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cid,
                                 num_segments=spec.n_cells)
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(n, dtype=jnp.int32) - starts[cid_sorted]
    overflow = jnp.max(counts) > spec.K
    slot_sorted = jnp.where(rank < spec.K, cid_sorted * spec.K + rank,
                            spec.n_cells * spec.K)
    # slot per particle (invert the sort)
    slot = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    return slot, overflow


def build_layout(spec: GridSpec, x, y, mass, wall_vx, wall_vy,
                 wall_y) -> CellLayout:
    """Assign slots (stable sort by cell + rank) and precompute the static
    per-slot/per-view fields."""
    n = spec.n_total
    slot, overflow = assign_slots(spec, x, y)

    fdtype = x.dtype
    is_fluid = (jnp.arange(n) < spec.n_fluid).astype(fdtype)
    ones = jnp.ones((n,), fdtype)
    is_wall = 1.0 - is_fluid
    core_static = _core(spec, slot, (
        ones, is_fluid, mass, wall_vx, wall_vy,
        is_wall * (wall_y <= 0.0), is_wall * (wall_y >= spec.DH)))
    valid_v, isf_v, mass_v, wvx_v, wvy_v, wbot_v, wtop_v = _unpack(
        _nview(spec, core_static), 7)

    pid = jnp.arange(n, dtype=jnp.int32)
    pid_core = _core(spec, slot, (pid,), fill=-1, dtype=jnp.int32)
    (pid_v,) = _unpack(_nview(spec, pid_core), 1)
    (pid_a,) = _apack(pid_core, 1)
    statics_a = _apack(core_static, 7)
    a_valid, a_fluid = statics_a[0], statics_a[1]
    mass_a = jnp.where(a_valid > 0, statics_a[2], 1.0)

    return CellLayout(
        slot=slot, pid_v=pid_v, pid_a=pid_a, valid_v=valid_v, isf_v=isf_v,
        mass_v=mass_v, wvx_v=wvx_v, wvy_v=wvy_v, wbot_v=wbot_v,
        wtop_v=wtop_v, a_fluid=a_fluid, a_valid=a_valid, mass_a=mass_a,
        ref_x=x, ref_y=y, overflow=overflow)


class CellGeometry(NamedTuple):
    """Per-step pair geometry, slimmed to the irreducible 3 fields.

    The step is HBM-bound on the while-carry of these pair blocks;
    everything else is VPU-cheap to rederive — validity = rm > 0, safe
    r = where(valid, rm, 1), W/dW = cubic_spline(r), masks = validity x
    the layout's static fluid/wall view flags, dx = r*ex, dy = r*ey
    (``derive_pair_terms``).

    Measured note (v5e, dp=0.025): carrying these FLAT (1-D) to dodge the
    (18, 162) -> (24, 256) tile padding was 1.7x SLOWER than shaped —
    the flat->shaped reshape materializes as a physical layout-change copy
    per consumer fusion. Shaped carry is the fastest XLA form found."""

    rm: jnp.ndarray   # (S, K, 9K) r where the pair is valid, 0 elsewhere
    ex: jnp.ndarray   # (S, K, 9K) dx/r, 0 where invalid
    ey: jnp.ndarray   # (S, K, 9K) dy/r, 0 where invalid


def pair_view(spec: GridSpec, a):
    """(S, K, 9K) pair-block passthrough (kept for callers that accept
    either the flat or shaped carry form)."""
    return a.reshape(spec.n_cells, spec.K, -1)


def derive_pair_terms(spec: GridSpec, lay: CellLayout, geom: CellGeometry):
    """Rederive the full per-pair term set from the slim geometry:
    (r_safe, ex, ey, wk, dwk, mask_f, mask_w), each (S, K, 9K)."""
    rm = pair_view(spec, geom.rm)
    ex = pair_view(spec, geom.ex)
    ey = pair_view(spec, geom.ey)
    fvalid = (rm > 0).astype(rm.dtype)
    r = jnp.where(rm > 0, rm, 1.0)
    wk, dwk = cubic_spline(r, spec.h)
    mask_f = fvalid * lay.isf_v[:, None, :]
    mask_w = fvalid * (1.0 - lay.isf_v[:, None, :])
    return r, ex, ey, wk * fvalid, dwk * fvalid, mask_f, mask_w


def compute_geometry(spec: GridSpec, lay: CellLayout, x, y) -> CellGeometry:
    core_xy = _core(spec, lay.slot, (x, y))
    xa, ya = _apack(core_xy, 2)
    xv, yv = _unpack(_nview(spec, core_xy), 2)

    dx = xa[:, :, None] - xv[:, None, :]
    dx = dx - spec.DL * jnp.round(dx / spec.DL)
    dy = ya[:, :, None] - yv[:, None, :]
    r2 = dx * dx + dy * dy
    valid = ((lay.valid_v[:, None, :] > 0)
             & (lay.pid_a[:, :, None] != lay.pid_v[:, None, :])
             & (r2 < spec.cutoff * spec.cutoff) & (r2 > 1e-24))
    r = jnp.sqrt(jnp.where(valid, r2, 1.0))
    fvalid = valid.astype(x.dtype)
    inv_r = 1.0 / r
    return CellGeometry(
        rm=r * fvalid,
        ex=dx * inv_r * fvalid,
        ey=dy * inv_r * fvalid)


def displacement_exceeded(spec: GridSpec, lay: CellLayout, x, y):
    if spec.skin <= 0.0:
        return jnp.asarray(False)
    ddx = x - lay.ref_x
    ddx = ddx - spec.DL * jnp.round(ddx / spec.DL)
    ddy = y - lay.ref_y
    return jnp.max(ddx * ddx + ddy * ddy) > (0.5 * spec.skin) ** 2


def count_pairs(lay: CellLayout, geom: CellGeometry):
    """Reference-convention pair count over FLUID-rooted pairs only (wall
    particles also occupy slots, so the masks alone overcount)."""
    S, nine_k = lay.valid_v.shape
    rm = geom.rm.reshape(S, -1, nine_k)
    fvalid = (rm > 0).astype(rm.dtype)
    mask_f = fvalid * lay.isf_v[:, None, :]
    mask_w = fvalid * (1.0 - lay.isf_v[:, None, :])
    af = lay.a_fluid[:, :, None]
    n_ff_directed = jnp.sum(mask_f * af)
    n_fw = jnp.sum(mask_w * af)
    return (n_ff_directed / 2 + n_fw).astype(jnp.int32)


def cell_step(spec: GridSpec, lay: CellLayout, geom: CellGeometry,
              mass, x, y, vx, vy, drho_dt, dt,
              rho0: float, p0: float, c_f: float, inv_sigma0: float,
              transport_coeff: float, g, mu, wall_visc_factor: float = 4.0):
    """One full physics step in cell layout: density+KGC -> viscous(+g) ->
    shifting -> Verlet (stage1 force, kick, stage2, finalize) -> wall-shear
    sums. Same operator order and formulas as Engine._step / the reference
    inner loop (SPH_Poiseuille.m:254-283).

    Inputs are per-particle; outputs are per-particle (one packed collect),
    positions are returned pre-wrap. Returns a dict of updated fields plus
    (tau_bottom, tau_top).
    """
    nf = spec.n_fluid
    h = spec.h
    af = lay.a_fluid  # (S, K) 1.0 for fluid-occupied slots
    # rederive all per-pair terms from the slim flat geometry carry (W, dW
    # and the masks are VPU-cheap to recompute vs their HBM round-trips)
    r, ex, ey, wk, dwk, m1, mw = derive_pair_terms(spec, lay, geom)

    # carried state into layout (one packed scatter); mass is static
    # per rebuild and lives in the layout
    core_state = _core(spec, lay.slot, (vx, vy, drho_dt))
    vxa, vya, drho_a = _apack(core_state, 3)
    vxv, vyv, _ = _unpack(_nview(spec, core_state), 3)
    mass_a = lay.mass_a

    # ---- density summation (sph_physics_mex.c:178-234) ----
    sigma_inner = w0(h) + jnp.sum(wk * m1, axis=2)
    sigma_contact = jnp.sum(wk * (lay.mass_v[:, None, :] / rho0) * mw,
                            axis=2)
    mass_a_safe = mass_a  # already 1.0 in empty slots
    rho_a = (sigma_inner * rho0 * inv_sigma0
             + sigma_contact * rho0 * rho0 * inv_sigma0 / mass_a_safe)
    rho_a = jnp.where(rho_a <= 1e-12, rho0, rho_a)
    rho_a = jnp.where(af > 0, rho_a, rho0)          # walls keep rho0
    vol_a = mass_a_safe / rho_a

    # neighbor-side volume: vol_a is already slot-ordered, so broadcasting
    # it through the neighbor view needs no scatter at all
    (vol_v,) = _unpack(
        _nview(spec, vol_a.reshape(spec.ny, spec.nx, spec.K)), 1)
    vol_vb = vol_v[:, None, :]

    # ---- kernel gradient correction (sph_physics_mex.c:239-365) ----
    # dx = r*ex, dy = r*ey, so A = -sum r*f*(e (x) e) is symmetric and the
    # off-diagonal is accumulated once (the reference computes dx*f*ey and
    # dy*f*ex separately, sph_physics_mex.c:286-297 — analytically equal)
    rf = r * dwk * vol_vb * (m1 + mw)
    a11 = -jnp.sum(rf * ex * ex, axis=2)
    a12 = -jnp.sum(rf * ex * ey, axis=2)
    a21 = a12
    a22 = -jnp.sum(rf * ey * ey, axis=2)
    ata11 = a11 * a11 + a21 * a21 + EPS_REG
    ata12 = a11 * a12 + a21 * a22
    ata22 = a12 * a12 + a22 * a22 + EPS_REG
    det_m = ata11 * ata22 - ata12 * ata12
    degenerate = jnp.abs(det_m) < 1e-20
    det_m_safe = jnp.where(degenerate, 1.0, det_m)
    im11 = ata22 / det_m_safe
    im12 = -ata12 / det_m_safe
    im22 = ata11 / det_m_safe
    p11 = jnp.where(degenerate, 1.0, im11 * a11 + im12 * a12)
    p12 = jnp.where(degenerate, 0.0, im11 * a21 + im12 * a22)
    p21 = jnp.where(degenerate, 0.0, im12 * a11 + im22 * a12)
    p22 = jnp.where(degenerate, 1.0, im12 * a21 + im22 * a22)
    det_a = a11 * a22 - a12 * a21
    det_sqr = jnp.maximum(1.0 - det_a, 0.0)
    denom = det_a + det_sqr
    small = jnp.abs(denom) < 1e-12
    denom_safe = jnp.where(small, 1.0, denom)
    w1 = jnp.where(small, 0.0, det_a / denom_safe)
    w2 = jnp.where(small, 1.0, det_sqr / denom_safe)
    b11_a = jnp.where(af > 0, w1 * p11 + w2, 1.0)
    b12_a = jnp.where(af > 0, w1 * p12, 0.0)
    b21_a = jnp.where(af > 0, w1 * p21, 0.0)
    b22_a = jnp.where(af > 0, w1 * p22 + w2, 1.0)

    # stage-1 density half-kick + EOS per slot (fluid only)
    rho_half_a = jnp.where(af > 0,
                           jnp.where(rho_a + 0.5 * dt * drho_a < 1e-10,
                                     rho0, rho_a + 0.5 * dt * drho_a),
                           rho_a)
    p_half_a = jnp.where(af > 0, p0 * (rho_half_a / rho0 - 1.0), 0.0)

    # broadcast per-slot results through the neighbor view (slicing only)
    def view_of(*slot_arrays):
        F = len(slot_arrays)
        core = jnp.stack(slot_arrays, axis=-1).reshape(
            spec.ny, spec.nx, spec.K * F)
        return _unpack(_nview(spec, core), F)

    b11_v, b12_v, b21_v, b22_v, rho_half_v, p_half_v = view_of(
        b11_a, b12_a, b21_a, b22_a, rho_half_a, p_half_a)

    b11a = b11_a[:, :, None]
    b12a = b12_a[:, :, None]
    b21a = b21_a[:, :, None]
    b22a = b22_a[:, :, None]
    b11v = b11_v[:, None, :]
    b12v = b12_v[:, None, :]
    b21v = b21_v[:, None, :]
    b22v = b22_v[:, None, :]
    vxa_c = vxa[:, :, None]
    vya_c = vya[:, :, None]
    vxv_b = vxv[:, None, :]
    vyv_b = vyv[:, None, :]

    # ---- viscous force (sph_physics_mex.c:466-545) ----
    denom_r = r + 0.01 * h
    ebe_f = (ex * ((b11a + b11v) * ex + (b12a + b12v) * ey)
             + ey * ((b21a + b21v) * ex + (b22a + b22v) * ey))
    ebe_w = ex * (b11a * ex + b12a * ey) + ey * (b21a * ex + b22a * ey)
    coeff_f = ebe_f * mu * dwk * vol_vb / denom_r * m1
    coeff_w = wall_visc_factor * ebe_w * mu * dwk * vol_vb / denom_r * mw
    wvx_b = lay.wvx_v[:, None, :]
    wvy_b = lay.wvy_v[:, None, :]
    acc_x = jnp.sum(coeff_f * (vxa_c - vxv_b) + coeff_w * (vxa_c - wvx_b),
                    axis=2)
    acc_y = jnp.sum(coeff_f * (vya_c - vyv_b) + coeff_w * (vya_c - wvy_b),
                    axis=2)
    fpx_a = jnp.where(af > 0, acc_x * vol_a + mass_a * g, 0.0)
    fpy_a = jnp.where(af > 0, acc_y * vol_a, 0.0)

    # ---- transport (shifting) correction (sph_physics_mex.c:633-709) ----
    tx_f = (b11a + b11v) * ex + (b12a + b12v) * ey
    ty_f = (b21a + b21v) * ex + (b22a + b22v) * ey
    tx_w = b11a * ex + b12a * ey
    ty_w = b21a * ex + b22a * ey
    c_f_pair = -dwk * vol_vb * m1
    c_w_pair = -2.0 * dwk * vol_vb * mw
    inc_x = jnp.sum(c_f_pair * tx_f + c_w_pair * tx_w, axis=2)
    inc_y = jnp.sum(c_f_pair * ty_f + c_w_pair * ty_w, axis=2)
    limiter = jnp.clip(100.0 * (inc_x * inc_x + inc_y * inc_y) / (h * h),
                       0.0, 1.0)
    shift_scale = transport_coeff * h * h * limiter * af
    dx_shift_a = shift_scale * inc_x
    dy_shift_a = shift_scale * inc_y

    # ---- stage-1 Riemann pressure force (sph_physics_mex.c:867-957) ----
    rho_half_c = rho_half_a[:, :, None]
    p_half_c = p_half_a[:, :, None]
    rho_bar = 0.5 * (rho_half_c + rho_half_v[:, None, :])
    un_l = vxa_c * ex + vya_c * ey
    un_r = vxv_b * ex + vyv_b * ey
    beta = jnp.minimum(3.0 * jnp.maximum(un_l - un_r, 0.0), c_f)
    p_avg = 0.5 * (p_half_c + p_half_v[:, None, :])
    p_star = p_avg + 0.5 * beta * rho_bar * (un_l - un_r)
    p_face = 0.5 * (p_avg + p_star)
    ptx_f = p_face * ((b11a + b11v) * ex + (b12a + b12v) * ey)
    pty_f = p_face * ((b21a + b21v) * ex + (b22a + b22v) * ey)
    ax_prior = fpx_a / mass_a_safe
    ay_prior = fpy_a / mass_a_safe
    face_acc = -(ax_prior[:, :, None] * ex + ay_prior[:, :, None] * ey)
    p_wall = p_half_c + rho_half_c * r * jnp.maximum(0.0, face_acc)
    ptx_w = (p_half_c + p_wall) * (b11a * ex + b12a * ey)
    pty_w = (p_half_c + p_wall) * (b21a * ex + b22a * ey)
    dwv = dwk * vol_vb
    pacc_x = -jnp.sum((ptx_f * m1 + ptx_w * mw) * dwv, axis=2)
    pacc_y = -jnp.sum((pty_f * m1 + pty_w * mw) * dwv, axis=2)
    fx_a = jnp.where(af > 0, pacc_x * vol_a, 0.0)
    fy_a = jnp.where(af > 0, pacc_y * vol_a, 0.0)

    # ---- kick (sph_physics_mex.c:1388-1409) ----
    inv_m = 1.0 / mass_a_safe
    vx2_a = jnp.where(af > 0, vxa + (fpx_a + fx_a) * inv_m * dt, 0.0)
    vy2_a = jnp.where(af > 0, vya + (fpy_a + fy_a) * inv_m * dt, 0.0)

    # ---- stage-2 continuity (sph_physics_mex.c:1073-1116) ----
    vx2_v, vy2_v = view_of(vx2_a, vy2_a)
    vx2c = vx2_a[:, :, None]
    vy2c = vy2_a[:, :, None]
    u_jump_f = (vx2c - vx2_v[:, None, :]) * ex \
        + (vy2c - vy2_v[:, None, :]) * ey
    u_jump_w = 2.0 * ((vx2c - wvx_b) * ex + (vy2c - wvy_b) * ey)
    rate = jnp.sum((u_jump_f * m1 + u_jump_w * mw) * dwv, axis=2)
    drho_new_a = jnp.where(af > 0, rate * rho_half_a, 0.0)

    # ---- finalize density + EOS (sph_physics_mex.c:1440-1450) ----
    rho_new_a = rho_half_a + 0.5 * dt * drho_new_a
    rho_new_a = jnp.where(rho_new_a < 1e-10, rho0, rho_new_a)
    rho_new_a = jnp.where(af > 0, rho_new_a, rho_half_a)
    p_new_a = jnp.where(af > 0, p0 * (rho_new_a / rho0 - 1.0), 0.0)

    # ---- collect per-slot results back to particle order (one take) ----
    per_slot = [rho_new_a, p_new_a, drho_new_a, vx2_a, vy2_a, fx_a, fy_a,
                fpx_a, fpy_a, vol_a, b11_a, b12_a, b21_a, b22_a,
                dx_shift_a, dy_shift_a]
    pack = jnp.stack([a.reshape(-1) for a in per_slot], axis=-1)
    got = pack[lay.slot]
    (rho_p, p_p, drho_p, vx2_p, vy2_p, fx_p, fy_p, fpx_p, fpy_p, vol_p,
     b11_p, b12_p, b21_p, b22_p, dxs_p, dys_p) = (
        got[:, k] for k in range(len(per_slot)))

    # ---- position update per particle: shifting + two half drifts ----
    # (order preserved: shift happens before stage-1 drift on the SAME
    # stale geometry; drifts use pre-kick and post-kick velocities)
    x2 = x + dxs_p + 0.5 * dt * vx + 0.5 * dt * vx2_p
    y2 = y + dys_p + 0.5 * dt * vy + 0.5 * dt * vy2_p
    fluid_mask = (jnp.arange(spec.n_total) < nf).astype(x.dtype)
    x2 = x * (1 - fluid_mask) + x2 * fluid_mask
    y2 = y * (1 - fluid_mask) + y2 * fluid_mask

    return dict(rho=rho_p, p=p_p, drho_dt=drho_p, vx=vx2_p, vy=vy2_p,
                fx=fx_p, fy=fy_p, fpx=fpx_p, fpy=fpy_p, vol=vol_p,
                b11=b11_p, b12=b12_p, b21=b21_p, b22=b22_p,
                x=x2, y=y2)


def cell_wall_shear(spec: GridSpec, lay: CellLayout, geom: CellGeometry,
                    vx, vol, b11, b12, b21, b22, mu,
                    wall_visc_factor: float = 4.0):
    """Wall-shear monitor on the (freshly rebuilt) layout with the current
    step's vol/B and post-kick velocities — the reference's exact ordering
    (wall_shear_monitor runs AFTER the neighbor rebuild,
    SPH_Poiseuille.m:280-283; formula sph_physics_mex.c:1713-1742)."""
    core = _core(spec, lay.slot, (vx, vol, b11, b12, b21, b22))
    vxa, vol_a, b11_a, b12_a, b21_a, b22_a = _apack(core, 6)
    vol_v = _unpack(_nview(spec, core), 6)[1]

    r, ex, ey, _, dwk, _, mask_w = derive_pair_terms(spec, lay, geom)
    ebe = (ex * (b11_a[:, :, None] * ex + b12_a[:, :, None] * ey)
           + ey * (b21_a[:, :, None] * ex + b22_a[:, :, None] * ey))
    dv_x = vxa[:, :, None] - lay.wvx_v[:, None, :]
    f_pair = (wall_visc_factor * mu * ebe * dwk * vol_v[:, None, :] * dv_x
              / (r + 0.01 * spec.h)
              * vol_a[:, :, None]) * mask_w
    tau_bottom = -jnp.sum(f_pair * lay.wbot_v[:, None, :]) / spec.DL
    tau_top = -jnp.sum(f_pair * lay.wtop_v[:, None, :]) / spec.DL
    return tau_bottom, tau_top
