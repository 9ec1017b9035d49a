"""Runtime diagnostics: wall-shear monitor and mid-channel velocity profile.

* ``wall_shear``: TPU-native re-expression of the reference's read-only
  ``wall_shear_monitor`` mode (sph_physics_mex.c:1653-1743) — sums the
  viscous x-force of fluid-wall pairs (same formula as the viscous operator
  including the 4.0 one-sided factor), split by wall side via the
  rebuild-static wall masks, tau = -sum/DL. Uses the Geometry's own
  gathered vol_j — no extra gather.
* ``mid_channel_profile``: device-side equivalent of
  SPH_Poiseuille.m:579-605 — mean u_x binned by y over a periodic slice
  around x = DL/2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .neighbors import Candidates, Geometry, GridSpec


def wall_shear(spec: GridSpec, geom: Geometry, cands: Candidates,
               vx, vol, b11, b12, b21, b22, DL: float,
               mu, h: float, wall_visc_factor: float = 4.0):
    """Returns (tau_bottom, tau_top) scalars."""
    nf = spec.n_fluid
    ex, ey = geom.ex, geom.ey
    ebe = (ex * (b11[:nf][:, None] * ex + b12[:nf][:, None] * ey)
           + ey * (b21[:nf][:, None] * ex + b22[:nf][:, None] * ey))
    dv_x = vx[:nf][:, None] - cands.wvx_j
    f_pair = (wall_visc_factor * mu * ebe * geom.dw * geom.vol_j * dv_x
              / (geom.r + 0.01 * h) * vol[:nf][:, None]) * geom.mask_w
    tau_bottom = -jnp.sum(f_pair * cands.wall_bot) / DL
    tau_top = -jnp.sum(f_pair * cands.wall_top) / DL
    return tau_bottom, tau_top


def binned_profile_mean(y_values, u_values, weights, y_min: float,
                        y_max: float, n_bins: int):
    """Mean of u per y-bin (reference: SPH_Poiseuille.m:579-590). ``weights``
    selects which samples participate (1.0/0.0). Returns (y_mid, u_mean)
    with NaN for empty bins."""
    edges_step = (y_max - y_min) / n_bins
    y_mid = y_min + (jnp.arange(n_bins) + 0.5) * edges_step
    in_range = (y_values >= y_min) & (y_values <= y_max)
    w = weights * in_range
    bin_id = jnp.clip(((y_values - y_min) / edges_step).astype(jnp.int32),
                      0, n_bins - 1)
    sum_u = jax.ops.segment_sum(u_values * w, bin_id, num_segments=n_bins)
    cnt = jax.ops.segment_sum(w, bin_id, num_segments=n_bins)
    u_mean = jnp.where(cnt > 0, sum_u / jnp.maximum(cnt, 1.0), jnp.nan)
    return y_mid, u_mean


def mid_channel_profile(spec: GridSpec, x, y, vx, DL: float, DH: float,
                        mid_x: float, half_width: float, n_bins: int):
    """u(y) profile in the periodic slice |x - mid_x| <= half_width
    (reference: SPH_Poiseuille.m:592-605)."""
    nf = spec.n_fluid
    x_wrap = jnp.mod(x[:nf], DL)
    dx_mid = jnp.abs(x_wrap - mid_x)
    dx_mid = jnp.minimum(dx_mid, DL - dx_mid)
    is_mid = (dx_mid <= half_width).astype(x.dtype)
    return binned_profile_mean(y[:nf], vx[:nf], is_mid, 0.0, DH, n_bins)
