"""Consolidated Pallas TPU kernels for the cell-layout pair phases.

Round-1 lesson (VERDICT.md weak #1): feeding kernels pre-materialized
(S, 9K) neighbor VIEWS from HBM makes Pallas slower than XLA — the views
ARE the HBM traffic. This redesign eliminates block-sized HBM traffic
entirely:

* per-field data travels as tiny HALO'D CORES — (ny+2, K, nx_pad+2) for
  the neighbor side ("kx" layout: K on sublanes, x on lanes) and
  (ny, nx_pad*K) for the slot side ("2d" layout) — each ~n_slots floats,
  VMEM-resident for the whole kernel;
* each program handles one cell row x one x-chunk of BX cells and builds
  the candidate matrix IN VMEM: nine (K, BX) window slices -> concat ->
  (9K, BX) -> lane-repeat K -> (9K, BX*K). Pair temps are (9K, BX*K):
  sublanes 162->168 (1.04x pad), lanes BX*K a multiple of 8*K — the only
  shape found where neither axis fights the (8, 128) f32 tile;
* pair geometry (min-image dx, r, W, dW, masks) is recomputed per phase
  from the position cores — VPU-cheap vs any HBM round-trip;
* reductions run over the CANDIDATE axis (sublanes) and emit (1, BX*K)
  slot rows, written directly to a (ny, nx_pad*K) output — no relayouts.

The x-axis is padded to nx_pad = ceil(nx/BX)*BX dead cells AFTER the
periodic halo columns, so the wrap stays physically adjacent; dead-cell
outputs are computed and discarded (their pid is -1, so they never
contaminate real cells' candidate sets).

Self-pair exclusion uses float-encoded particle ids (exact below 2^24).
Validity and fluid/wall masks derive from the pid core alone
(pid >= 0 occupied; pid < n_fluid fluid). Kernels run under
``interpret=True`` automatically off-TPU so the suite tests them on CPU.

Formulas are identical to ops/cellgrid.py (each cites the reference);
equivalence vs the XLA engine is enforced by tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbors import GridSpec


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def block_x(spec: GridSpec) -> int:
    """Cells per x-chunk: bound pair-temp VMEM to ~(168, BX*K) f32 per
    buffer while keeping the grid coarse."""
    target = max(1, 4096 // spec.K)   # ~4k slot lanes per program
    return min(spec.nx, target)


def nx_pad(spec: GridSpec) -> int:
    bx = block_x(spec)
    return ((spec.nx + bx - 1) // bx) * bx


class CellCores(NamedTuple):
    """One field's halo'd cores (see module docstring).

    Slot lanes use the K-MAJOR ordering ``lane = (chunk, k*BX + c)``: the
    candidate matrix is then a plain lane-tiling of the (9K, BX) window
    matrix (``jnp.concatenate([v]*K, axis=1)``) — the only slot-lane
    ordering whose in-kernel expansion needs no Mosaic relayout (both
    broadcast+reshape and slot-major interleaving are unsupported shape
    casts)."""

    kx: jnp.ndarray    # (ny+2, K, nx_pad+2) neighbor-side layout
    a_km: jnp.ndarray  # (ny, nxc*K*BX) slot-side rows, k-major per chunk


def make_cores(spec: GridSpec, per_slot, fill: float = 0.0) -> CellCores:
    """(S, K) per-slot array -> halo'd cores.

    x halo = wrapped first/last cell columns (the layout-level ghost
    entries, sph_neighbor_search_mex.c:267-295), zeroed for nx < 3 where
    the interior window already covers every cell (see cellgrid._nview);
    y halo and the x dead-pad are ``fill`` (use -1 for the pid core so
    dead slots can never alias particle 0)."""
    ny, nx, K = spec.ny, spec.nx, spec.K
    npad = nx_pad(spec)
    bx = block_x(spec)
    nxc = npad // bx
    c3 = per_slot.reshape(ny, nx, K)
    dtype = c3.dtype

    kx = jnp.transpose(c3, (0, 2, 1))                  # (ny, K, nx)
    if nx >= 3:
        left, right = kx[:, :, -1:], kx[:, :, :1]
    else:
        left = right = jnp.full_like(kx[:, :, :1], fill)
    pad_x = jnp.full((ny, K, npad - nx), fill, dtype)
    kx = jnp.concatenate([left, kx, right, pad_x], axis=2)
    pad_y = jnp.full((1, K, npad + 2), fill, dtype)
    kx = jnp.concatenate([pad_y, kx, pad_y], axis=0)   # (ny+2, K, npad+2)

    cp = jnp.concatenate(
        [c3, jnp.full((ny, npad - nx, K), fill, dtype)], axis=1)
    a_km = cp.reshape(ny, nxc, bx, K).transpose(0, 1, 3, 2).reshape(
        ny, nxc * K * bx)
    return CellCores(kx=kx, a_km=a_km)


def collect(spec: GridSpec, out_km) -> jnp.ndarray:
    """Kernel output (ny, nxc*K*BX, k-major) -> per-slot (S, K)."""
    ny, nx, K = spec.ny, spec.nx, spec.K
    npad = nx_pad(spec)
    bx = block_x(spec)
    nxc = npad // bx
    o = out_km.reshape(ny, nxc, K, bx).transpose(0, 1, 3, 2).reshape(
        ny, npad, K)
    return o[:, :nx].reshape(ny * nx, K)


def _tile_matrix(spec: GridSpec, bx: int, dtype):
    """(BX, K*BX) one-hot lane-tiling matrix: E[c, k*BX+c] = 1."""
    K = spec.K
    lane = jax.lax.broadcasted_iota(jnp.int32, (bx, K * bx), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (bx, K * bx), 0)
    return (lane % bx == col).astype(dtype)


def _expand(v, E):
    """(9K, BX) window matrix -> (9K, K*BX) candidate matrix: lane k*BX+c
    holds window column c (every slot of a cell shares its cell's
    candidates). Lane-tiling via a one-hot matmul rides the otherwise-idle
    MXU; a K-way lane concat of 35-wide pieces costs ~8 shift/select ops
    per output vreg on the VPU.

    precision=HIGHEST is LOAD-BEARING: the TPU MXU multiplies in bf16 by
    default, which would round every candidate value (positions, float
    pids) to 8 mantissa bits — ~0.4% position error that corrupts every
    pair distance (and pid equality) while the one-hot structure makes the
    math LOOK exact. HIGHEST selects the 3-pass bf16 decomposition, exact
    to f32 rounding; with the one-hot E each output is then the original
    f32 value. (CPU interpret runs hide this: XLA CPU f32 dots are exact,
    so only TPU execution exposes the default-precision rounding.)"""
    return jnp.dot(v, E, preferred_element_type=v.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def _views(refs, scrs, p, j0, spec, bx, n_fields):
    """For each field ref (kx layout), build the (9K, K*BX) candidate
    matrix of cell row ``p`` (0-based real row, dynamic), x-chunk starting
    at cell ``j0`` (STATIC — Mosaic requires lane-dim slice offsets to be
    static or 128-aligned). Window order (dy, dx) matches cellgrid._nview.

    The nine window slabs carry different vector-layout offsets (their
    lane starts differ by dx), which tpu.concatenate rejects; staging them
    through a VMEM scratch normalizes the layout — ref stores relayout for
    free, and the re-read window is one canonical vector."""
    K = spec.K
    E = _tile_matrix(spec, bx, refs[0].dtype)
    outs = []
    for f in range(n_fields):
        ref, scr = refs[f], scrs[f]
        b = 0
        for dy in range(3):
            for dx in range(3):
                scr[b * K:(b + 1) * K, :] = ref[p + dy, :,
                                                j0 + dx:j0 + dx + bx]
                b += 1
        outs.append(_expand(scr[:, :], E))
    return outs


def _aside(refs, p, j, spec, bx, n_fields):
    """Slot-side rows: (1, K*BX) each (static lane offsets, dynamic row)."""
    K = spec.K
    return [refs[f][pl.ds(p, 1), j * K * bx:(j + 1) * K * bx]
            for f in range(n_fields)]


def _geometry(spec: GridSpec, xa, ya, pida, xv, yv, pidv):
    """Masked pair geometry on (9K, BX*K) blocks. Returns
    (r_safe, ex, ey, w, dw, mask_f, mask_w); formulas cite
    sph_neighbor_search_mex.c:115-133 (spline), :359-363 (min-image)."""
    dx = xa - xv
    dx = dx - spec.DL * jnp.round(dx / spec.DL)
    dy = ya - yv
    r2 = dx * dx + dy * dy
    valid = ((pidv >= 0) & (pida != pidv)
             & (r2 < spec.cutoff * spec.cutoff) & (r2 > 1e-24))
    r = jnp.sqrt(jnp.where(valid, r2, 1.0))
    sigma = 10.0 / (7.0 * math.pi * spec.h * spec.h)
    q = r / spec.h
    tq = 2.0 - q
    w = jnp.where(q < 1.0, sigma * (1.0 - 1.5 * q * q + 0.75 * q ** 3),
                  jnp.where(q < 2.0, sigma * 0.25 * tq ** 3, 0.0))
    dw = jnp.where(q < 1.0, sigma * (-3.0 * q + 2.25 * q * q) / spec.h,
                   jnp.where(q < 2.0, -sigma * 0.75 * tq * tq / spec.h,
                             0.0))
    fvalid = valid.astype(xa.dtype)
    inv_r = 1.0 / r
    is_fluid_v = fvalid * (pidv < spec.n_fluid).astype(xa.dtype)
    return (r, dx * inv_r * fvalid, dy * inv_r * fvalid, w * fvalid,
            dw * fvalid, is_fluid_v, fvalid - is_fluid_v)


def _phase_call(body, spec: GridSpec, view_cores: Sequence[jnp.ndarray],
                a_cores: Sequence[jnp.ndarray], n_out: int, scalars=()):
    """Shared pallas_call wrapper. ``view_cores`` are kx-layout halo'd
    cores; ``a_cores`` are 2d-layout slot cores. Outputs are
    (ny, nx_pad*K) slot grids (pass through ``collect``)."""
    for s in scalars:
        if isinstance(s, jax.core.Tracer):
            raise TypeError(
                "pallas_cell kernels take config scalars as Python floats; "
                "traced (g, mu) sweeps must use the XLA cellgrid engine")
    ny, K = spec.ny, spec.K
    bx = block_x(spec)
    npad = nx_pad(spec)
    nxc = npad // bx
    dtype = view_cores[0].dtype

    kernel = functools.partial(body, spec=spec, bx=bx,
                               n_view=len(view_cores), n_a=len(a_cores),
                               n_out=n_out, scalars=scalars)

    # outputs are whole-array VMEM refs (a (1, BX*K) output block would
    # violate Mosaic's sublane-divisibility rule); each program writes its
    # own disjoint (1, BX*K) row slice — TPU grid iterations are
    # sequential on one core, so the writes never race
    outs = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.VMEM)]
                  * (len(view_cores) + len(a_cores))),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ny, npad * K), dtype)] * n_out,
        scratch_shapes=[pltpu.VMEM((9 * K, bx), dtype)
                        for _ in view_cores],
        interpret=_interpret(),
    )(*view_cores, *a_cores)
    return tuple(outs)


def _chunks(refs, spec, bx, n_view, n_a, n_out):
    """Yield (emit, views, asides) per x-chunk of this program's cell row.

    The x-chunk loop is a STATIC python unroll (Mosaic needs static lane
    offsets); the row index is the dynamic grid id. ``refs`` layout:
    [view cores | a cores | outputs | per-view scratches]."""
    p = pl.program_id(0)
    K = spec.K
    scrs = refs[n_view + n_a + n_out:]
    for j in range(nx_pad(spec) // bx):
        views = _views(refs, scrs, p, j * bx, spec, bx, n_view)
        asides = _aside(refs[n_view:], p, j, spec, bx, n_a)

        def emit(out_ref, value, j=j):
            out_ref[pl.ds(p, 1), j * K * bx:(j + 1) * K * bx] = value

        yield emit, views, asides


# ---------------------------------------------------------------------------
# phase 1: kernel-summation density (sph_physics_mex.c:178-212)
# view fields: x, y, pidf, mass ; a fields: x, y, pidf
# ---------------------------------------------------------------------------

def _density_body(*refs, spec, bx, n_view, n_a, n_out, scalars):
    rho0 = scalars[0]
    out = refs[n_view + n_a:n_view + n_a + n_out]
    for emit, (xv, yv, pidv, massv), (xa, ya, pida) in _chunks(
            refs, spec, bx, n_view, n_a, n_out):
        r, ex, ey, w, dw, m1, mw = _geometry(spec, xa, ya, pida,
                                             xv, yv, pidv)
        emit(out[0], jnp.sum(w * m1, axis=0, keepdims=True))
        emit(out[1], jnp.sum(w * (massv / rho0) * mw, axis=0,
                             keepdims=True))
        emit(out[2], jnp.sum(m1, axis=0, keepdims=True))
        emit(out[3], jnp.sum(mw, axis=0, keepdims=True))


def density_phase(spec, x_cores, y_cores, pid_cores, mass_cores,
                  rho0: float):
    """Returns per-slot (S, K): (sigma_inner_pairsum, sigma_contact,
    cnt_fluid, cnt_wall). The W(0) self term is the caller's."""
    outs = _phase_call(
        _density_body, spec,
        (x_cores.kx, y_cores.kx, pid_cores.kx, mass_cores.kx),
        (x_cores.a_km, y_cores.a_km, pid_cores.a_km), 4, scalars=(rho0,))
    return tuple(collect(spec, o) for o in outs)


# ---------------------------------------------------------------------------
# phase 2: KGC A-matrix accumulation (sph_physics_mex.c:239-312)
# A is symmetric (dx*ey == dy*ex identically), so emit (a11, a12, a22)
# view fields: x, y, pidf, vol ; a fields: x, y, pidf
# ---------------------------------------------------------------------------

def _kgc_body(*refs, spec, bx, n_view, n_a, n_out, scalars):
    out = refs[n_view + n_a:n_view + n_a + n_out]
    for emit, (xv, yv, pidv, volv), (xa, ya, pida) in _chunks(
            refs, spec, bx, n_view, n_a, n_out):
        r, ex, ey, w, dw, m1, mw = _geometry(spec, xa, ya, pida,
                                             xv, yv, pidv)
        rf = r * dw * volv * (m1 + mw)
        emit(out[0], -jnp.sum(rf * ex * ex, axis=0, keepdims=True))
        emit(out[1], -jnp.sum(rf * ex * ey, axis=0, keepdims=True))
        emit(out[2], -jnp.sum(rf * ey * ey, axis=0, keepdims=True))


def kgc_phase(spec, x_cores, y_cores, pid_cores, vol_cores):
    outs = _phase_call(
        _kgc_body, spec,
        (x_cores.kx, y_cores.kx, pid_cores.kx, vol_cores.kx),
        (x_cores.a_km, y_cores.a_km, pid_cores.a_km), 3)
    return tuple(collect(spec, o) for o in outs)


# ---------------------------------------------------------------------------
# phase 3: fused viscous + shifting + Riemann pressure
# (sph_physics_mex.c:466-545, 633-709, 867-957)
# view fields: x, y, pidf, b11, b12, b21, b22, vx, vy, rhoh, ph, vol,
#              wvx, wvy
# a fields:    x, y, pidf, b11, b12, b21, b22, vx, vy, rhoh, ph, vol, mass
# ---------------------------------------------------------------------------

def _forces_body(*refs, spec, bx, n_view, n_a, n_out, scalars):
    out = refs[n_view + n_a:n_view + n_a + n_out]
    for (emit,
         (xv, yv, pidv, b11v, b12v, b21v, b22v, vxv, vyv, rhohv, phv, volv,
          wvxv, wvyv),
         (xa, ya, pida, b11a, b12a, b21a, b22a, vxa, vya, rhoha, pha, vola,
          massa)) in _chunks(refs, spec, bx, n_view, n_a, n_out):
        _forces_chunk(out, emit, spec, scalars, xv, yv, pidv, b11v, b12v,
                      b21v, b22v, vxv, vyv, rhohv, phv, volv, wvxv, wvyv,
                      xa, ya, pida, b11a, b12a, b21a, b22a, vxa, vya,
                      rhoha, pha, vola, massa)


def _forces_chunk(out, emit, spec, scalars, xv, yv, pidv, b11v, b12v, b21v,
                  b22v, vxv, vyv, rhohv, phv, volv, wvxv, wvyv,
                  xa, ya, pida, b11a, b12a, b21a, b22a, vxa, vya, rhoha,
                  pha, vola, massa):
    mu, rho0, c_f, g, wf = scalars
    h = spec.h
    r, ex, ey, w, dw, m1, mw = _geometry(spec, xa, ya, pida, xv, yv, pidv)
    dwv = dw * volv

    b11s = b11a + b11v
    b12s = b12a + b12v
    b21s = b21a + b21v
    b22s = b22a + b22v
    ebe_f = ex * (b11s * ex + b12s * ey) + ey * (b21s * ex + b22s * ey)
    ebe_w = ex * (b11a * ex + b12a * ey) + ey * (b21a * ex + b22a * ey)
    inv_denom = 1.0 / (r + 0.01 * h)

    # viscous (c:466-545)
    cf_pair = ebe_f * mu * dwv * inv_denom * m1
    cw_pair = wf * ebe_w * mu * dwv * inv_denom * mw
    acc_x = jnp.sum(cf_pair * (vxa - vxv) + cw_pair * (vxa - wvxv),
                    axis=0, keepdims=True)
    acc_y = jnp.sum(cf_pair * (vya - vyv) + cw_pair * (vya - wvyv),
                    axis=0, keepdims=True)

    # prior acceleration for the virtual wall pressure (fluid slots only;
    # c:931-934): a = (acc*Vol + m*g)/m
    af = ((pida >= 0) & (pida < spec.n_fluid)).astype(xa.dtype)
    mass_safe = jnp.where(massa > 0, massa, 1.0)
    apx = (acc_x * vola + massa * g) / mass_safe * af
    apy = acc_y * vola / mass_safe * af

    # shifting increment (c:633-709)
    tx_f = b11s * ex + b12s * ey
    ty_f = b21s * ex + b22s * ey
    tx_w = b11a * ex + b12a * ey
    ty_w = b21a * ex + b22a * ey
    emit(out[2], jnp.sum(-dwv * m1 * tx_f - 2.0 * dwv * mw * tx_w,
                         axis=0, keepdims=True))
    emit(out[3], jnp.sum(-dwv * m1 * ty_f - 2.0 * dwv * mw * ty_w,
                         axis=0, keepdims=True))

    # Riemann pressure force (c:867-957)
    rho_bar = 0.5 * (rhoha + rhohv)
    un_l = vxa * ex + vya * ey
    un_r = vxv * ex + vyv * ey
    beta = jnp.minimum(3.0 * jnp.maximum(un_l - un_r, 0.0), c_f)
    p_avg = 0.5 * (pha + phv)
    p_star = p_avg + 0.5 * beta * rho_bar * (un_l - un_r)
    p_face = 0.5 * (p_avg + p_star)
    face_acc = -(apx * ex + apy * ey)
    p_wall = pha + rhoha * r * jnp.maximum(0.0, face_acc)
    emit(out[4], -jnp.sum((p_face * tx_f * m1
                           + (pha + p_wall) * tx_w * mw) * dwv,
                          axis=0, keepdims=True))
    emit(out[5], -jnp.sum((p_face * ty_f * m1
                           + (pha + p_wall) * ty_w * mw) * dwv,
                          axis=0, keepdims=True))
    emit(out[0], acc_x)
    emit(out[1], acc_y)


def forces_phase(spec, view_cores, a_cores, mu: float, rho0: float,
                 c_f: float, g: float, wall_visc_factor: float = 4.0):
    """view_cores: kx cores (x, y, pidf, b11, b12, b21, b22, vx, vy, rhoh,
    ph, vol, wvx, wvy); a_cores: 2d cores (x, y, pidf, b11, b12, b21, b22,
    vx, vy, rhoh, ph, vol, mass).
    Returns (acc_x, acc_y, inc_x, inc_y, pacc_x, pacc_y), each (S, K)."""
    outs = _phase_call(_forces_body, spec, view_cores, a_cores, 6,
                       scalars=(mu, rho0, c_f, g, wall_visc_factor))
    return tuple(collect(spec, o) for o in outs)


# ---------------------------------------------------------------------------
# phase 4: continuity rate (sph_physics_mex.c:1073-1109)
# view fields: x, y, pidf, vol, vx2, vy2, wvx, wvy
# a fields:    x, y, pidf, vx2, vy2
# ---------------------------------------------------------------------------

def _continuity_body(*refs, spec, bx, n_view, n_a, n_out, scalars):
    out = refs[n_view + n_a:n_view + n_a + n_out]
    for (emit, (xv, yv, pidv, volv, vxv, vyv, wvxv, wvyv),
         (xa, ya, pida, vxa, vya)) in _chunks(refs, spec, bx, n_view, n_a, n_out):
        r, ex, ey, w, dw, m1, mw = _geometry(spec, xa, ya, pida,
                                             xv, yv, pidv)
        dwv = dw * volv
        u_jump_f = (vxa - vxv) * ex + (vya - vyv) * ey
        u_jump_w = 2.0 * ((vxa - wvxv) * ex + (vya - wvyv) * ey)
        emit(out[0], jnp.sum((u_jump_f * m1 + u_jump_w * mw) * dwv,
                             axis=0, keepdims=True))


def continuity_phase(spec, view_cores, a_cores):
    (o,) = _phase_call(_continuity_body, spec, view_cores, a_cores, 1)
    return collect(spec, o)


# ---------------------------------------------------------------------------
# phase 5: wall-shear monitor sums (sph_physics_mex.c:1713-1742)
# view fields: x, y, pidf, vol, wvx, wbot, wtop
# a fields:    x, y, pidf, vx, vol, b11, b12, b21, b22
# ---------------------------------------------------------------------------

def _wallshear_body(*refs, spec, bx, n_view, n_a, n_out, scalars):
    mu, wf = scalars
    out = refs[n_view + n_a:n_view + n_a + n_out]
    for (emit, (xv, yv, pidv, volv, wvxv, wbotv, wtopv),
         (xa, ya, pida, vxa, vola, b11a, b12a, b21a, b22a)) in _chunks(
            refs, spec, bx, n_view, n_a, n_out):
        r, ex, ey, w, dw, m1, mw = _geometry(spec, xa, ya, pida,
                                             xv, yv, pidv)
        ebe = ex * (b11a * ex + b12a * ey) + ey * (b21a * ex + b22a * ey)
        f_pair = (wf * mu * ebe * dw * volv * (vxa - wvxv)
                  / (r + 0.01 * spec.h) * vola) * mw
        emit(out[0], jnp.sum(f_pair * wbotv, axis=0, keepdims=True))
        emit(out[1], jnp.sum(f_pair * wtopv, axis=0, keepdims=True))


def wallshear_phase(spec, view_cores, a_cores, mu: float,
                    wall_visc_factor: float = 4.0):
    """Returns per-slot partial sums (tau_bot_sum, tau_top_sum), (S, K);
    tau = -sum(...)/DL on the caller."""
    outs = _phase_call(_wallshear_body, spec, view_cores, a_cores, 2,
                       scalars=(mu, wall_visc_factor))
    return tuple(collect(spec, o) for o in outs)


# ---------------------------------------------------------------------------
# Pallas engine layout + full-step XLA glue
# ---------------------------------------------------------------------------

class PallasLayout(NamedTuple):
    """Per-rebuild state of the Pallas cell engine: slot assignment, the
    static halo'd cores, and the skin-guard reference positions."""

    slot: jnp.ndarray       # (n_total,) int32 core slot id
    a_fluid: jnp.ndarray    # (S, K) 1.0 where the slot holds a fluid
    mass_a: jnp.ndarray     # (S, K) slot mass (1.0 in empty slots)
    pid: CellCores          # float-encoded particle id, fill -1
    massc: CellCores        # mass, fill 0
    wvx: CellCores          # prescribed wall velocity
    wvy: CellCores
    wbot: CellCores         # bottom/top wall membership masks
    wtop: CellCores
    ref_x: jnp.ndarray
    ref_y: jnp.ndarray
    overflow: jnp.ndarray


def build_pallas_layout(spec: GridSpec, x, y, mass, wall_vx, wall_vy,
                        wall_y) -> PallasLayout:
    from .cellgrid import _apack, _core, assign_slots

    n = spec.n_total
    slot, overflow = assign_slots(spec, x, y)
    fdtype = x.dtype
    pid = jnp.arange(n, dtype=fdtype)
    is_fluid = (jnp.arange(n) < spec.n_fluid).astype(fdtype)
    is_wall = 1.0 - is_fluid
    core = _core(spec, slot, (
        pid, mass, wall_vx, wall_vy,
        is_wall * (wall_y <= 0.0), is_wall * (wall_y >= spec.DH),
        jnp.ones((n,), fdtype)))
    pid_a, mass_s, wvx_a, wvy_a, wbot_a, wtop_a, valid_a = _apack(core, 7)
    # pid core needs fill -1 (0 would alias particle 0); rebuild it from
    # the packed scatter's slot arrays
    pid_a = jnp.where(valid_a > 0, pid_a, -1.0)
    a_fluid = valid_a * (pid_a < spec.n_fluid).astype(fdtype)
    return PallasLayout(
        slot=slot,
        a_fluid=a_fluid,
        mass_a=jnp.where(valid_a > 0, mass_s, 1.0),
        pid=make_cores(spec, pid_a, fill=-1.0),
        massc=make_cores(spec, mass_s),
        wvx=make_cores(spec, wvx_a), wvy=make_cores(spec, wvy_a),
        wbot=make_cores(spec, wbot_a), wtop=make_cores(spec, wtop_a),
        ref_x=x, ref_y=y, overflow=overflow)


def pallas_cell_step(spec: GridSpec, lay: PallasLayout, x, y, vx, vy,
                     drho_dt, dt, rho0: float, p0: float, c_f: float,
                     inv_sigma0: float, transport_coeff: float, g, mu,
                     wall_visc_factor: float = 4.0):
    """One full physics step: density+KGC -> viscous(+g) -> shifting ->
    Verlet (stage1 force, kick, stage2, finalize). Same operator order and
    formulas as cellgrid.cell_step / the reference inner loop
    (SPH_Poiseuille.m:254-283); all pair passes run as Pallas kernels over
    halo'd cores, all per-slot algebra stays in XLA.

    Returns the per-particle dict of cell_step plus ``n_pairs``."""
    from .cellgrid import EPS_REG, _apack, _core
    from .kernels import w0

    nf = spec.n_fluid
    h = spec.h
    af = lay.a_fluid
    mass_a = lay.mass_a

    core5 = _core(spec, lay.slot, (x, y, vx, vy, drho_dt))
    xa, ya, vxa, vya, drho_a = _apack(core5, 5)
    cx = make_cores(spec, xa)
    cy = make_cores(spec, ya)
    cvx = make_cores(spec, vxa)
    cvy = make_cores(spec, vya)

    # ---- phase 1: density sums (sph_physics_mex.c:178-234) ----
    sig_pair, sig_contact, cnt_f, cnt_w = density_phase(
        spec, cx, cy, lay.pid, lay.massc, rho0)
    sigma_inner = w0(h) + sig_pair
    rho_a = (sigma_inner * rho0 * inv_sigma0
             + sig_contact * rho0 * rho0 * inv_sigma0 / mass_a)
    rho_a = jnp.where(rho_a <= 1e-12, rho0, rho_a)
    rho_a = jnp.where(af > 0, rho_a, rho0)
    vol_a = mass_a / rho_a
    n_pairs = (jnp.sum(cnt_f * af) / 2 + jnp.sum(cnt_w * af)).astype(
        jnp.int32)
    cvol = make_cores(spec, vol_a)

    # ---- phase 2: KGC accumulation + blend (c:239-365) ----
    a11, a12, a22 = kgc_phase(spec, cx, cy, lay.pid, cvol)
    a21 = a12
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

    # stage-1 density half-kick + EOS per slot (fluid only, c:857-865)
    rho_half_a = jnp.where(af > 0,
                           jnp.where(rho_a + 0.5 * dt * drho_a < 1e-10,
                                     rho0, rho_a + 0.5 * dt * drho_a),
                           rho_a)
    p_half_a = jnp.where(af > 0, p0 * (rho_half_a / rho0 - 1.0), 0.0)

    cb11 = make_cores(spec, b11_a)
    cb12 = make_cores(spec, b12_a)
    cb21 = make_cores(spec, b21_a)
    cb22 = make_cores(spec, b22_a)
    crh = make_cores(spec, rho_half_a)
    cph = make_cores(spec, p_half_a)

    # ---- phase 3: fused viscous + shifting + pressure (one kernel) ----
    acc_x, acc_y, inc_x, inc_y, pacc_x, pacc_y = forces_phase(
        spec,
        (cx.kx, cy.kx, lay.pid.kx, cb11.kx, cb12.kx, cb21.kx, cb22.kx,
         cvx.kx, cvy.kx, crh.kx, cph.kx, cvol.kx, lay.wvx.kx, lay.wvy.kx),
        (cx.a_km, cy.a_km, lay.pid.a_km, cb11.a_km, cb12.a_km, cb21.a_km,
         cb22.a_km, cvx.a_km, cvy.a_km, crh.a_km, cph.a_km, cvol.a_km,
         lay.massc.a_km),
        mu, rho0, c_f, g, wall_visc_factor)
    fpx_a = jnp.where(af > 0, acc_x * vol_a + mass_a * g, 0.0)
    fpy_a = jnp.where(af > 0, acc_y * vol_a, 0.0)
    limiter = jnp.clip(100.0 * (inc_x * inc_x + inc_y * inc_y) / (h * h),
                       0.0, 1.0)
    shift_scale = transport_coeff * h * h * limiter * af
    dx_shift_a = shift_scale * inc_x
    dy_shift_a = shift_scale * inc_y
    fx_a = jnp.where(af > 0, pacc_x * vol_a, 0.0)
    fy_a = jnp.where(af > 0, pacc_y * vol_a, 0.0)

    # ---- kick (c:1388-1409) ----
    inv_m = 1.0 / mass_a
    vx2_a = jnp.where(af > 0, vxa + (fpx_a + fx_a) * inv_m * dt, 0.0)
    vy2_a = jnp.where(af > 0, vya + (fpy_a + fy_a) * inv_m * dt, 0.0)
    cvx2 = make_cores(spec, vx2_a)
    cvy2 = make_cores(spec, vy2_a)

    # ---- phase 4: continuity (c:1073-1116) ----
    rate = continuity_phase(
        spec,
        (cx.kx, cy.kx, lay.pid.kx, cvol.kx, cvx2.kx, cvy2.kx,
         lay.wvx.kx, lay.wvy.kx),
        (cx.a_km, cy.a_km, lay.pid.a_km, cvx2.a_km, cvy2.a_km))
    drho_new_a = jnp.where(af > 0, rate * rho_half_a, 0.0)

    # ---- finalize density + EOS (c:1440-1450) ----
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

    x2 = x + dxs_p + 0.5 * dt * vx + 0.5 * dt * vx2_p
    y2 = y + dys_p + 0.5 * dt * vy + 0.5 * dt * vy2_p
    fluid_mask = (jnp.arange(spec.n_total) < nf).astype(x.dtype)
    x2 = x * (1 - fluid_mask) + x2 * fluid_mask
    y2 = y * (1 - fluid_mask) + y2 * fluid_mask

    return dict(rho=rho_p, p=p_p, drho_dt=drho_p, vx=vx2_p, vy=vy2_p,
                fx=fx_p, fy=fy_p, fpx=fpx_p, fpy=fpy_p, vol=vol_p,
                b11=b11_p, b12=b12_p, b21=b21_p, b22=b22_p,
                x=x2, y=y2, n_pairs=n_pairs)


def pallas_wall_shear(spec: GridSpec, lay: PallasLayout, x, y, vx, vol,
                      b11, b12, b21, b22, mu,
                      wall_visc_factor: float = 4.0):
    """Wall-shear monitor on the (freshly rebuilt) layout — ordering as
    the reference (after the rebuild, SPH_Poiseuille.m:280-283; formula
    sph_physics_mex.c:1713-1742)."""
    from .cellgrid import _apack, _core

    core = _core(spec, lay.slot, (x, y, vx, vol, b11, b12, b21, b22))
    xa, ya, vxa, vol_a, b11_a, b12_a, b21_a, b22_a = _apack(core, 8)
    cx = make_cores(spec, xa)
    cy = make_cores(spec, ya)
    cvol = make_cores(spec, vol_a)
    a_km = [make_cores(spec, v).a_km
            for v in (vxa, b11_a, b12_a, b21_a, b22_a)]
    tb, tt = wallshear_phase(
        spec,
        (cx.kx, cy.kx, lay.pid.kx, cvol.kx, lay.wvx.kx, lay.wbot.kx,
         lay.wtop.kx),
        (cx.a_km, cy.a_km, lay.pid.a_km, a_km[0], cvol.a_km, a_km[1],
         a_km[2], a_km[3], a_km[4]),
        mu, wall_visc_factor)
    return -jnp.sum(tb) / spec.DL, -jnp.sum(tt) / spec.DL
