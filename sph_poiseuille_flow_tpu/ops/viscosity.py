"""Morris-type laminar viscous force with corrected kernel gradients.

TPU-native re-expression of the reference's ``viscous_force`` mode
(sph_physics_mex.c:396-550). Pure row-math: the caller supplies gathered
neighbor values from one packed gather.

* fluid-fluid: coeff = e^T(B_i+B_j)e * mu * dW * Vol_j / (r + 0.01h),
  accumulated antisymmetrically on (v_i - v_j) (c:489-520). In the dense
  per-particle form each direction of a pair is evaluated once on its own
  row, identical to the reference's store-once + two-sided scatter (e and
  dW are direction-invariant in the quadratic form).
* fluid-wall: no-slip against the prescribed wall velocity with a 4.0
  factor compensating one-sided integration (c:521-535, doc c:383-388),
  using B_i only.
* Returned force = acc * Vol_i for fluid, zero for walls (c:538-545).
"""

from __future__ import annotations

import jax.numpy as jnp

from .neighbors import Candidates, Geometry, GridSpec


def viscous_force(spec: GridSpec, geom: Geometry, cands: Candidates,
                  vx, vy, vol, b11, b12, b21, b22,
                  vol_j, b11_j, b12_j, b21_j, b22_j, vx_j, vy_j,
                  mu, h: float, wall_visc_factor: float = 4.0):
    """Returns (fx, fy), shape (n_total,); wall rows are zero."""
    nf = spec.n_fluid
    n_wall = spec.n_total - nf
    ex, ey = geom.ex, geom.ey
    denom = geom.r + 0.01 * h

    b11i = b11[:nf][:, None]
    b12i = b12[:nf][:, None]
    b21i = b21[:nf][:, None]
    b22i = b22[:nf][:, None]
    vxi = vx[:nf][:, None]
    vyi = vy[:nf][:, None]

    # fluid-fluid: symmetric B sum
    bs11 = b11i + b11_j
    bs12 = b12i + b12_j
    bs21 = b21i + b21_j
    bs22 = b22i + b22_j
    ebe_f = ex * (bs11 * ex + bs12 * ey) + ey * (bs21 * ex + bs22 * ey)
    coeff_f = ebe_f * mu * geom.dw * vol_j / denom * geom.mask_f

    # fluid-wall: one-sided, B_i only, 4x no-slip factor
    ebe_w = ex * (b11i * ex + b12i * ey) + ey * (b21i * ex + b22i * ey)
    coeff_w = (wall_visc_factor * ebe_w * mu * geom.dw * vol_j / denom
               * geom.mask_w)

    acc_x = jnp.sum(coeff_f * (vxi - vx_j) + coeff_w * (vxi - cands.wvx_j),
                    axis=1)
    acc_y = jnp.sum(coeff_f * (vyi - vy_j) + coeff_w * (vyi - cands.wvy_j),
                    axis=1)

    zeros_w = jnp.zeros((n_wall,), acc_x.dtype)
    fx = jnp.concatenate([acc_x * vol[:nf], zeros_w])
    fy = jnp.concatenate([acc_y * vol[:nf], zeros_w])
    return fx, fy
