"""Morris-type laminar viscous force with corrected kernel gradients.

TPU-native re-expression of the reference's ``viscous_force`` mode
(sph_physics_mex.c:396-550):

* fluid-fluid: coeff = e^T(B_i+B_j)e * mu * dW * Vol_j / (r + 0.01h),
  accumulated antisymmetrically on (v_i - v_j) (c:489-520). In the dense
  per-particle form each direction of a pair is evaluated once on its own
  row, which is identical to the reference's store-once + two-sided
  scatter (e and dW are direction-invariant in the quadratic form).
* fluid-wall: no-slip against the prescribed wall velocity with a 4.0
  factor compensating one-sided integration (c:521-535, doc c:383-388),
  using B_i only.
* Returned force = acc * Vol_i for fluid, zero for walls (c:538-545).
"""

from __future__ import annotations

import jax.numpy as jnp

from .neighbors import GridSpec, NeighborCache


def viscous_force(spec: GridSpec, cache: NeighborCache, vx, vy, vol,
                  b11, b12, b21, b22, wall_vx, wall_vy,
                  mu: float, h: float):
    """Returns (fx, fy), shape (n_total,); wall rows are zero."""
    nf = spec.n_fluid
    n_wall = spec.n_total - nf
    j = cache.jsafe
    ex = cache.dx / cache.r
    ey = cache.dy / cache.r
    denom = cache.r + 0.01 * h
    vol_j = vol[j]

    b11i = b11[:nf][:, None]
    b12i = b12[:nf][:, None]
    b21i = b21[:nf][:, None]
    b22i = b22[:nf][:, None]
    vxi = vx[:nf][:, None]
    vyi = vy[:nf][:, None]

    # fluid-fluid: symmetric B sum
    bs11 = b11i + b11[j]
    bs12 = b12i + b12[j]
    bs21 = b21i + b21[j]
    bs22 = b22i + b22[j]
    ebe_f = ex * (bs11 * ex + bs12 * ey) + ey * (bs21 * ex + bs22 * ey)
    coeff_f = ebe_f * mu * cache.dw * vol_j / denom * cache.mask_f
    dvx_f = vxi - vx[j]
    dvy_f = vyi - vy[j]

    # fluid-wall: one-sided, B_i only, 4x no-slip factor
    ebe_w = ex * (b11i * ex + b12i * ey) + ey * (b21i * ex + b22i * ey)
    coeff_w = 4.0 * ebe_w * mu * cache.dw * vol_j / denom * cache.mask_w
    dvx_w = vxi - wall_vx[j]
    dvy_w = vyi - wall_vy[j]

    acc_x = jnp.sum(coeff_f * dvx_f + coeff_w * dvx_w, axis=1)
    acc_y = jnp.sum(coeff_f * dvy_f + coeff_w * dvy_w, axis=1)

    zeros_w = jnp.zeros((n_wall,), acc_x.dtype)
    fx = jnp.concatenate([acc_x * vol[:nf], zeros_w])
    fy = jnp.concatenate([acc_y * vol[:nf], zeros_w])
    return fx, fy
