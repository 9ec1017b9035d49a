"""Pallas TPU kernels for the cell-layout pair phases.

The cellgrid engine's pair work is elementwise math over (S, K, 9K) blocks
followed by reductions over the last axis. The XLA path materializes some
of those intermediates in HBM; these Pallas kernels fuse each PHASE of the
step (density sums, KGC accumulation, forces, continuity rate, wall shear)
into a single VMEM-resident computation per block of cells:

* every per-slot A-side field arrives as its own (S, K) array and every
  neighbor-view field as its own (S, 9K) array (produced by the same
  halo/shift concatenations as the XLA path) — one ref per field, no
  in-kernel reshapes, Mosaic-friendly tiles,
* pair geometry (min-image dx, r, W, dW, masks) is recomputed INSIDE each
  kernel from the positions — recomputation is VPU-cheap and saves a full
  (S, K, 9K, 6) round-trip to HBM per phase,
* each kernel emits only per-slot (S, K) reductions.

Self-pair exclusion uses float-encoded particle ids (exact for
n_total < 2^24). Kernels run under ``interpret=True`` automatically on
non-TPU backends, so the same code is unit-tested on CPU.

Formulas are identical to ops/cellgrid.py (each cites the reference);
equivalence is enforced by tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .neighbors import GridSpec


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_s(S: int) -> int:
    """Cells per kernel block: Mosaic needs the block sublane count to be a
    multiple of 8 (the engine pads S accordingly); keep (BS*K, 9K) pair
    temps comfortably in VMEM while amortizing grid overhead."""
    for bs in (32, 16, 8):
        if S % bs == 0:
            return bs
    if jax.default_backend() == "tpu":
        raise ValueError(
            f"cell count S={S} must be divisible by 8 for the Pallas "
            "engine (use PallasCellEngine, which pads the grid)")
    for bs in (4, 2):
        if S % bs == 0:
            return bs
    return 1


def _pair_geometry(spec: GridSpec, xa, ya, pida, xv, yv, pidv, validv):
    """(BS, K, 1) x (BS, 1, 9K) -> masked pair geometry, kernel-side."""
    dx = xa[:, :, None] - xv[:, None, :]
    dx = dx - spec.DL * jnp.round(dx / spec.DL)
    dy = ya[:, :, None] - yv[:, None, :]
    r2 = dx * dx + dy * dy
    valid = ((validv[:, None, :] > 0)
             & (pida[:, :, None] != pidv[:, None, :])
             & (r2 < spec.cutoff * spec.cutoff) & (r2 > 1e-24))
    r = jnp.sqrt(jnp.where(valid, r2, 1.0))
    # cubic spline (sph_neighbor_search_mex.c:115-133)
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
    return (dx * fvalid, dy * fvalid, r, dx * inv_r * fvalid,
            dy * inv_r * fvalid, w * fvalid, dw * fvalid, fvalid)


def _phase_call(kernel_body, spec: GridSpec, a_fields, v_fields, n_out,
                scalars=()):
    """Shared pallas_call wrapper: grid over cell blocks; one VMEM tile per
    field; (S, K) outputs."""
    S = spec.n_cells
    K = spec.K
    BS = _block_s(S)
    W = v_fields[0].shape[1]
    Fa = len(a_fields)

    body = functools.partial(kernel_body, spec=spec, n_a=Fa,
                             scalars=scalars)
    outs = pl.pallas_call(
        body,
        grid=(S // BS,),
        in_specs=([pl.BlockSpec((BS, K), lambda i: (i, 0))] * Fa
                  + [pl.BlockSpec((BS, W), lambda i: (i, 0))]
                  * len(v_fields)),
        out_specs=[pl.BlockSpec((BS, K), lambda i: (i, 0))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((S, K), a_fields[0].dtype)] * n_out,
        interpret=_interpret(),
    )(*a_fields, *v_fields)
    return tuple(outs)


# ---------------------------------------------------------------------------
# phase 1: kernel-summation density (sph_physics_mex.c:178-212)
# ---------------------------------------------------------------------------

def _density_body(*refs, spec, n_a, scalars):
    rho0 = scalars[0]
    xa, ya, pida = (r[...] for r in refs[:3])
    xv, yv, pidv, validv, isfv, massv = (r[...] for r in refs[3:9])
    o_si, o_sc, o_cf, o_cw = refs[9:]
    (_, _, _, _, _, w, _, fvalid) = _pair_geometry(
        spec, xa, ya, pida, xv, yv, pidv, validv)
    mask_f = fvalid * isfv[:, None, :]
    mask_w = fvalid * (1.0 - isfv[:, None, :]) * validv[:, None, :]
    o_si[...] = jnp.sum(w * mask_f, axis=2)
    o_sc[...] = jnp.sum(w * (massv[:, None, :] / rho0) * mask_w, axis=2)
    o_cf[...] = jnp.sum(mask_f, axis=2)
    o_cw[...] = jnp.sum(mask_w, axis=2)


def density_phase(spec: GridSpec, xa, ya, pida, xv, yv, pidv, validv, isfv,
                  massv, rho0: float):
    """Returns (sigma_inner_pairsum, sigma_contact, cnt_fluid, cnt_wall),
    each (S, K). The W(0) self term is added by the caller; the counts feed
    the reference-convention pair-count log."""
    return _phase_call(_density_body, spec, (xa, ya, pida),
                       (xv, yv, pidv, validv, isfv, massv), 4,
                       scalars=(rho0,))


# ---------------------------------------------------------------------------
# phase 2: KGC A-matrix accumulation (sph_physics_mex.c:239-312)
# ---------------------------------------------------------------------------

def _kgc_body(*refs, spec, n_a, scalars):
    xa, ya, pida = (r[...] for r in refs[:3])
    xv, yv, pidv, validv, volv = (r[...] for r in refs[3:8])
    o11, o12, o21, o22 = refs[8:]
    (dx, dy, _, ex, ey, _, dw, fvalid) = _pair_geometry(
        spec, xa, ya, pida, xv, yv, pidv, validv)
    f = dw * volv[:, None, :] * fvalid
    o11[...] = -jnp.sum(dx * f * ex, axis=2)
    o12[...] = -jnp.sum(dx * f * ey, axis=2)
    o21[...] = -jnp.sum(dy * f * ex, axis=2)
    o22[...] = -jnp.sum(dy * f * ey, axis=2)


def kgc_phase(spec: GridSpec, xa, ya, pida, xv, yv, pidv, validv, volv):
    """Returns (a11, a12, a21, a22), each (S, K). (Fluid and wall neighbors
    contribute with the same formula, sph_physics_mex.c:253-311.)"""
    return _phase_call(_kgc_body, spec, (xa, ya, pida),
                       (xv, yv, pidv, validv, volv), 4)


# ---------------------------------------------------------------------------
# phase 3: fused viscous + shifting + Riemann pressure accumulation
# (sph_physics_mex.c:466-545, 633-709, 867-957)
# ---------------------------------------------------------------------------

def _forces_body(*refs, spec, n_a, scalars):
    """The virtual-wall-pressure term needs the A-particle's COMPLETED
    prior acceleration (viscous + gravity, sph_physics_mex.c:931-934) —
    computed in-kernel from the viscous reduction before the pressure pair
    terms."""
    mu, rho0, c_f, g, wf = scalars
    h = spec.h
    (xa, ya, pida, b11a, b12a, b21a, b22a, vxa, vya, rhoha, pha, vola,
     massa) = (r[...] for r in refs[:13])
    (xv, yv, pidv, validv, isfv, volv, b11v, b12v, b21v, b22v, vxv, vyv,
     rhohv, phv, wvxv, wvyv) = (r[...] for r in refs[13:29])
    o_ax, o_ay, o_ix, o_iy, o_px, o_py = refs[29:]

    (dx, dy, r, ex, ey, w, dw, fvalid) = _pair_geometry(
        spec, xa, ya, pida, xv, yv, pidv, validv)
    m1 = fvalid * isfv[:, None, :]
    mw = fvalid * (1.0 - isfv[:, None, :]) * validv[:, None, :]
    vol_b = volv[:, None, :]
    dwv = dw * vol_b

    b11s = b11a[:, :, None] + b11v[:, None, :]
    b12s = b12a[:, :, None] + b12v[:, None, :]
    b21s = b21a[:, :, None] + b21v[:, None, :]
    b22s = b22a[:, :, None] + b22v[:, None, :]
    ebe_f = ex * (b11s * ex + b12s * ey) + ey * (b21s * ex + b22s * ey)
    ebe_w = (ex * (b11a[:, :, None] * ex + b12a[:, :, None] * ey)
             + ey * (b21a[:, :, None] * ex + b22a[:, :, None] * ey))
    denom_r = r + 0.01 * h

    # viscous (c:466-545)
    vxc = vxa[:, :, None]
    vyc = vya[:, :, None]
    cf_pair = ebe_f * mu * dw * vol_b / denom_r * m1
    cw_pair = wf * ebe_w * mu * dw * vol_b / denom_r * mw
    acc_x = jnp.sum(cf_pair * (vxc - vxv[:, None, :])
                    + cw_pair * (vxc - wvxv[:, None, :]), axis=2)
    acc_y = jnp.sum(cf_pair * (vyc - vyv[:, None, :])
                    + cw_pair * (vyc - wvyv[:, None, :]), axis=2)

    # prior acceleration for the virtual wall pressure (fluid slots only)
    af = ((pida >= 0) & (pida < spec.n_fluid)).astype(xa.dtype)
    mass_safe = jnp.where(massa > 0, massa, 1.0)
    apx = (acc_x * vola + massa * g) / mass_safe * af
    apy = acc_y * vola / mass_safe * af

    # shifting increment (c:633-709)
    tx_f = b11s * ex + b12s * ey
    ty_f = b21s * ex + b22s * ey
    tx_w = b11a[:, :, None] * ex + b12a[:, :, None] * ey
    ty_w = b21a[:, :, None] * ex + b22a[:, :, None] * ey
    o_ix[...] = jnp.sum(-dwv * m1 * tx_f - 2.0 * dwv * mw * tx_w, axis=2)
    o_iy[...] = jnp.sum(-dwv * m1 * ty_f - 2.0 * dwv * mw * ty_w, axis=2)

    # Riemann pressure force (c:867-957)
    rhc = rhoha[:, :, None]
    phc = pha[:, :, None]
    rho_bar = 0.5 * (rhc + rhohv[:, None, :])
    un_l = vxc * ex + vyc * ey
    un_r = vxv[:, None, :] * ex + vyv[:, None, :] * ey
    beta = jnp.minimum(3.0 * jnp.maximum(un_l - un_r, 0.0), c_f)
    p_avg = 0.5 * (phc + phv[:, None, :])
    p_star = p_avg + 0.5 * beta * rho_bar * (un_l - un_r)
    p_face = 0.5 * (p_avg + p_star)
    face_acc = -(apx[:, :, None] * ex + apy[:, :, None] * ey)
    p_wall = phc + rhc * r * jnp.maximum(0.0, face_acc)
    o_px[...] = -jnp.sum((p_face * tx_f * m1
                          + (phc + p_wall) * tx_w * mw) * dwv, axis=2)
    o_py[...] = -jnp.sum((p_face * ty_f * m1
                          + (phc + p_wall) * ty_w * mw) * dwv, axis=2)
    o_ax[...] = acc_x
    o_ay[...] = acc_y


def forces_phase(spec: GridSpec, a_fields, v_fields, mu, rho0: float,
                 c_f: float, g, wall_visc_factor: float = 4.0):
    """a_fields = (xa, ya, pida, b11a, b12a, b21a, b22a, vxa, vya, rho_half,
    p_half, vol_a, mass_a); v_fields = (xv, yv, pidv, validv, isfv, volv,
    b11v..b22v, vxv, vyv, rho_half_v, p_half_v, wvxv, wvyv).
    Returns (acc_x, acc_y, inc_x, inc_y, pacc_x, pacc_y), each (S, K)."""
    return _phase_call(_forces_body, spec, a_fields, v_fields, 6,
                       scalars=(mu, rho0, c_f, g, wall_visc_factor))


# ---------------------------------------------------------------------------
# phase 4: continuity rate (sph_physics_mex.c:1073-1109)
# ---------------------------------------------------------------------------

def _continuity_body(*refs, spec, n_a, scalars):
    xa, ya, pida, vxa, vya = (r[...] for r in refs[:5])
    xv, yv, pidv, validv, isfv, volv, vxv, vyv, wvxv, wvyv = (
        r[...] for r in refs[5:15])
    (o_rate,) = refs[15:]
    (_, _, _, ex, ey, _, dw, fvalid) = _pair_geometry(
        spec, xa, ya, pida, xv, yv, pidv, validv)
    m1 = fvalid * isfv[:, None, :]
    mw = fvalid * (1.0 - isfv[:, None, :]) * validv[:, None, :]
    dwv = dw * volv[:, None, :]
    vxc = vxa[:, :, None]
    vyc = vya[:, :, None]
    u_jump_f = (vxc - vxv[:, None, :]) * ex + (vyc - vyv[:, None, :]) * ey
    u_jump_w = 2.0 * ((vxc - wvxv[:, None, :]) * ex
                      + (vyc - wvyv[:, None, :]) * ey)
    o_rate[...] = jnp.sum((u_jump_f * m1 + u_jump_w * mw) * dwv, axis=2)


def continuity_phase(spec: GridSpec, a_fields, v_fields):
    """a_fields = (xa, ya, pida, vx2a, vy2a); v_fields = (xv, yv, pidv,
    validv, isfv, volv, vx2v, vy2v, wvxv, wvyv). Returns (rate,) (S, K)."""
    return _phase_call(_continuity_body, spec, a_fields, v_fields, 1)


# ---------------------------------------------------------------------------
# phase 5: wall-shear monitor sums (sph_physics_mex.c:1713-1742)
# ---------------------------------------------------------------------------

def _wallshear_body(*refs, spec, n_a, scalars):
    mu, wf = scalars
    xa, ya, pida, vxa, vola, b11a, b12a, b21a, b22a = (
        r[...] for r in refs[:9])
    (xv, yv, pidv, validv, isfv, volv, wvxv, wbotv, wtopv) = (
        r[...] for r in refs[9:18])
    o_tb, o_tt = refs[18:]
    (_, _, r, ex, ey, _, dw, fvalid) = _pair_geometry(
        spec, xa, ya, pida, xv, yv, pidv, validv)
    mw = fvalid * (1.0 - isfv[:, None, :]) * validv[:, None, :]
    ebe = (ex * (b11a[:, :, None] * ex + b12a[:, :, None] * ey)
           + ey * (b21a[:, :, None] * ex + b22a[:, :, None] * ey))
    dv_x = vxa[:, :, None] - wvxv[:, None, :]
    f_pair = (wf * mu * ebe * dw * volv[:, None, :] * dv_x
              / (r + 0.01 * spec.h) * vola[:, :, None]) * mw
    o_tb[...] = jnp.sum(f_pair * wbotv[:, None, :], axis=2)
    o_tt[...] = jnp.sum(f_pair * wtopv[:, None, :], axis=2)


def wallshear_phase(spec: GridSpec, a_fields, v_fields, mu,
                    wall_visc_factor: float = 4.0):
    """a_fields = (xa, ya, pida, vxa, vola, b11a..b22a); v_fields = (xv, yv,
    pidv, validv, isfv, volv, wvxv, wbotv, wtopv). Returns per-slot partial
    sums (tau_bot_sum, tau_top_sum); tau = -sum(...)/DL on the caller."""
    return _phase_call(_wallshear_body, spec, a_fields, v_fields, 2,
                       scalars=(mu, wall_visc_factor))
