"""Transport-velocity correction (particle shifting).

TPU-native re-expression of the reference's ``transport_correction`` mode
(sph_physics_mex.c:569-714). Pure row-math over caller-gathered neighbor
values.

* fluid-fluid: inc_i += -dW * Vol_j * (B_i+B_j)e (c:656-685; the j-side
  accumulation in the reference equals this row's own term under e -> -e).
* fluid-wall: inc_i += -2 * dW * Vol_j * B_i e (mirror symmetry, c:686-699).
* limiter = clamp(100*|inc|^2/h^2, 0, 1); pos += coeff*h^2*limiter*inc
  (c:702-709). Positions only — velocities untouched (doc c:554-567).

The driver passes transport_coeff = 0.30 (SPH_Poiseuille.m:77).
"""

from __future__ import annotations

import jax.numpy as jnp

from .neighbors import Geometry, GridSpec


def transport_correction(spec: GridSpec, geom: Geometry, x, y,
                         b11, b12, b21, b22,
                         vol_j, b11_j, b12_j, b21_j, b22_j,
                         h: float, transport_coeff: float):
    """Returns (x, y) with shifted fluid positions; walls unchanged."""
    nf = spec.n_fluid
    ex, ey = geom.ex, geom.ey

    b11i = b11[:nf][:, None]
    b12i = b12[:nf][:, None]
    b21i = b21[:nf][:, None]
    b22i = b22[:nf][:, None]

    tx_f = (b11i + b11_j) * ex + (b12i + b12_j) * ey
    ty_f = (b21i + b21_j) * ex + (b22i + b22_j) * ey
    coeff_f = -geom.dw * vol_j * geom.mask_f

    tx_w = b11i * ex + b12i * ey
    ty_w = b21i * ex + b22i * ey
    coeff_w = -2.0 * geom.dw * vol_j * geom.mask_w

    inc_x = jnp.sum(coeff_f * tx_f + coeff_w * tx_w, axis=1)
    inc_y = jnp.sum(coeff_f * ty_f + coeff_w * ty_w, axis=1)

    n2 = inc_x * inc_x + inc_y * inc_y
    limiter = jnp.clip(100.0 * n2 / (h * h), 0.0, 1.0)
    scale = transport_coeff * h * h * limiter

    x = jnp.asarray(x).at[:nf].add(scale * inc_x)
    y = jnp.asarray(y).at[:nf].add(scale * inc_y)
    return x, y
