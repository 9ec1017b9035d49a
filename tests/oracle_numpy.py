"""Independent float64 NumPy oracle for all SPH operators.

Implements the reference's EXACT pair-list semantics — fluid-fluid pairs
stored ONCE with two-sided scatter-adds, fluid-wall pairs one-sided — as
documented in SURVEY.md section 2 (sph_physics_mex.c). This is a second,
structurally different implementation used to validate the dense-matrix JAX
operators: if the row-sum reformulation is wrong anywhere, it cannot agree
with this oracle on jittered configurations.

Pure NumPy, float64, no JAX.
"""

import math

import numpy as np


def cubic_kernel(r, h):
    sigma = 10.0 / (7.0 * math.pi * h * h)
    q = r / h
    if q < 1.0:
        return (sigma * (1 - 1.5 * q * q + 0.75 * q ** 3),
                sigma * (-3 * q + 2.25 * q * q) / h)
    if q < 2.0:
        tq = 2.0 - q
        return sigma * 0.25 * tq ** 3, -sigma * 0.75 * tq * tq / h
    return 0.0, 0.0


def build_pairs(x, y, n_fluid, DL, h):
    """Store-once pair list: fluid-fluid with i<j, fluid-wall from the fluid
    side (sph_neighbor_search_mex.c:353-376)."""
    n = x.size
    cutoff = 2.0 * h
    pi, pj, pdx, pdy, pr, pw, pdw = [], [], [], [], [], [], []
    for i in range(n_fluid):
        for j in range(n):
            if j == i or (j < n_fluid and j < i):
                continue
            dx = x[i] - x[j]
            dx -= DL * np.round(dx / DL)
            dy = y[i] - y[j]
            r2 = dx * dx + dy * dy
            if not (1e-24 < r2 < cutoff * cutoff):
                continue
            r = math.sqrt(r2)
            w, dw = cubic_kernel(r, h)
            if w > 0.0 or abs(dw) > 0.0:
                pi.append(i); pj.append(j)
                pdx.append(dx); pdy.append(dy); pr.append(r)
                pw.append(w); pdw.append(dw)
    return (np.array(pi, int), np.array(pj, int), np.array(pdx),
            np.array(pdy), np.array(pr), np.array(pw), np.array(pdw))


def density_correction(pairs, mass, n_fluid, n_total, rho0, h, inv_sigma0):
    pi, pj, dx, dy, r, W, dW = pairs
    sigma_inner = np.zeros(n_fluid)
    sigma_contact = np.zeros(n_fluid)
    W0 = 10.0 / (7.0 * math.pi * h * h)
    sigma_inner += W0
    for k in range(pi.size):
        i, j = pi[k], pj[k]
        if j < n_fluid:
            sigma_inner[i] += W[k]
            sigma_inner[j] += W[k]
        else:
            sigma_contact[i] += W[k] * (mass[j] / rho0)

    rho = np.full(n_total, rho0)
    for i in range(n_fluid):
        rhoi = sigma_inner[i] * rho0 * inv_sigma0
        rhoi += sigma_contact[i] * rho0 * rho0 * inv_sigma0 / mass[i]
        rho[i] = rho0 if rhoi <= 1e-12 else rhoi
    vol = mass / rho

    A = np.zeros((n_fluid, 4))  # a11 a12 a21 a22
    for k in range(pi.size):
        i, j = pi[k], pj[k]
        if r[k] <= 1e-12:
            continue
        ex, ey = dx[k] / r[k], dy[k] / r[k]
        fxj = dW[k] * vol[j]
        A[i, 0] -= dx[k] * fxj * ex
        A[i, 1] -= dx[k] * fxj * ey
        A[i, 2] -= dy[k] * fxj * ex
        A[i, 3] -= dy[k] * fxj * ey
        if j < n_fluid:
            fxi = dW[k] * vol[i]
            A[j, 0] -= dx[k] * fxi * ex
            A[j, 1] -= dx[k] * fxi * ey
            A[j, 2] -= dy[k] * fxi * ex
            A[j, 3] -= dy[k] * fxi * ey

    B = np.zeros((n_total, 4))
    B[:, 0] = 1.0
    B[:, 3] = 1.0
    eps = 1e-8
    for i in range(n_fluid):
        a11, a12, a21, a22 = A[i]
        ata11 = a11 * a11 + a21 * a21 + eps
        ata12 = a11 * a12 + a21 * a22
        ata22 = a12 * a12 + a22 * a22 + eps
        det_m = ata11 * ata22 - ata12 * ata12
        if abs(det_m) < 1e-20:
            p11, p12, p21, p22 = 1.0, 0.0, 0.0, 1.0
        else:
            im11 = ata22 / det_m
            im12 = -ata12 / det_m
            im22 = ata11 / det_m
            p11 = im11 * a11 + im12 * a12
            p12 = im11 * a21 + im12 * a22
            p21 = im12 * a11 + im22 * a12
            p22 = im12 * a21 + im22 * a22
        det_a = a11 * a22 - a12 * a21
        det_sqr = max(1.0 - det_a, 0.0)
        denom = det_a + det_sqr
        if abs(denom) < 1e-12:
            w1, w2 = 0.0, 1.0
        else:
            w1, w2 = det_a / denom, det_sqr / denom
        B[i] = [w1 * p11 + w2, w1 * p12, w1 * p21, w1 * p22 + w2]
    return rho, vol, B


def viscous_force(pairs, vel, vol, B, mu, h, n_fluid, n_total, wall_vel):
    pi, pj, dx, dy, r, W, dW = pairs
    acc = np.zeros((n_total, 2))
    for k in range(pi.size):
        i, j = pi[k], pj[k]
        if r[k] <= 1e-12:
            continue
        ex, ey = dx[k] / r[k], dy[k] / r[k]
        denom = r[k] + 0.01 * h
        if j < n_fluid:
            bs = B[i] + B[j]
            ebe = (ex * (bs[0] * ex + bs[1] * ey)
                   + ey * (bs[2] * ex + bs[3] * ey))
            dv = vel[i] - vel[j]
            acc[i] += ebe * mu * dW[k] * vol[j] / denom * dv
            acc[j] -= ebe * mu * dW[k] * vol[i] / denom * dv
        else:
            b = B[i]
            ebe = (ex * (b[0] * ex + b[1] * ey)
                   + ey * (b[2] * ex + b[3] * ey))
            dv = vel[i] - wall_vel[j]
            acc[i] += 4.0 * ebe * mu * dW[k] * vol[j] / denom * dv
    force = np.zeros((n_total, 2))
    force[:n_fluid] = acc[:n_fluid] * vol[:n_fluid, None]
    return force


def transport_correction(pairs, vol, B, pos, h, n_fluid, n_total, coeff):
    pi, pj, dx, dy, r, W, dW = pairs
    inc = np.zeros((n_total, 2))
    for k in range(pi.size):
        i, j = pi[k], pj[k]
        if r[k] <= 1e-12:
            continue
        ex, ey = dx[k] / r[k], dy[k] / r[k]
        if j < n_fluid:
            bs = B[i] + B[j]
            t = np.array([bs[0] * ex + bs[1] * ey, bs[2] * ex + bs[3] * ey])
            inc[i] += -dW[k] * vol[j] * t
            inc[j] += dW[k] * vol[i] * t
        else:
            b = B[i]
            t = np.array([b[0] * ex + b[1] * ey, b[2] * ex + b[3] * ey])
            inc[i] += -2.0 * dW[k] * vol[j] * t
    pos_out = pos.copy()
    for i in range(n_fluid):
        n2 = inc[i] @ inc[i]
        limiter = min(100.0 * n2 / (h * h), 1.0)
        pos_out[i] += coeff * h * h * limiter * inc[i]
    return pos_out


def riemann_beta(un_l, un_r, c_f):
    compression = max(un_l - un_r, 0.0)
    return min(3.0 * compression, c_f)


def integration_first(pairs, vol, B, rho_in, mass, pos, vel, drho_in,
                      force_prior, dt, n_fluid, n_total, rho0, p0, c_f):
    pi, pj, dx, dy, r, W, dW = pairs
    rho = rho_in.copy()
    p = np.zeros(n_total)
    pos_out = pos.copy()
    for i in range(n_fluid):
        rho[i] += 0.5 * dt * drho_in[i]
        if rho[i] < 1e-10:
            rho[i] = rho0
        p[i] = p0 * (rho[i] / rho0 - 1.0)
        pos_out[i] += 0.5 * dt * vel[i]

    force = np.zeros((n_total, 2))
    diss = np.zeros(n_total)
    for k in range(pi.size):
        i, j = pi[k], pj[k]
        if r[k] <= 1e-12:
            continue
        ex, ey = dx[k] / r[k], dy[k] / r[k]
        if j < n_fluid:
            p_i, p_j = p[i], p[j]
            rho_bar = 0.5 * (rho[i] + rho[j])
            un_l = vel[i, 0] * ex + vel[i, 1] * ey
            un_r = vel[j, 0] * ex + vel[j, 1] * ey
            beta = riemann_beta(un_l, un_r, c_f)
            p_star = 0.5 * (p_i + p_j) + 0.5 * beta * rho_bar * (un_l - un_r)
            p_face = 0.5 * (0.5 * (p_i + p_j) + p_star)
            bs = B[i] + B[j]
            tx = p_face * (bs[0] * ex + bs[1] * ey)
            ty = p_face * (bs[2] * ex + bs[3] * ey)
            dWVj = dW[k] * vol[j]
            dWVi = dW[k] * vol[i]
            force[i] -= [tx * dWVj, ty * dWVj]
            force[j] += [tx * dWVi, ty * dWVi]
            p_diff = p_i - p_j
            diss[i] += (p_diff / (rho0 * c_f)) * dWVj
            diss[j] += (-p_diff / (rho0 * c_f)) * dWVi
        else:
            p_i = p[i]
            b = B[i]
            dWVj = dW[k] * vol[j]
            a = force_prior[i] / mass[i]
            face_acc = -(a[0] * ex + a[1] * ey)
            p_wall = p_i + rho[i] * r[k] * max(0.0, face_acc)
            tx = b[0] * ex + b[1] * ey
            ty = b[2] * ex + b[3] * ey
            force[i] -= [(p_i + p_wall) * dWVj * tx,
                         (p_i + p_wall) * dWVj * ty]
            diss[i] += ((p_i - p_wall) / (rho0 * c_f)) * dWVj

    drho = np.zeros(n_total)
    for i in range(n_fluid):
        force[i] *= vol[i]
        drho[i] = diss[i] * rho[i]
    force[n_fluid:] = 0.0
    return rho, p, pos_out, force, drho


def integration_second(pairs, vol, rho, pos, vel, dt, n_fluid, n_total,
                       wall_vel):
    pi, pj, dx, dy, r, W, dW = pairs
    pos_out = pos.copy()
    pos_out[:n_fluid] += 0.5 * dt * vel[:n_fluid]
    rate = np.zeros(n_total)
    for k in range(pi.size):
        i, j = pi[k], pj[k]
        if r[k] <= 1e-12:
            continue
        ex, ey = dx[k] / r[k], dy[k] / r[k]
        if j < n_fluid:
            u_jump = ((vel[i, 0] - vel[j, 0]) * ex
                      + (vel[i, 1] - vel[j, 1]) * ey)
            rate[i] += u_jump * dW[k] * vol[j]
            rate[j] += u_jump * dW[k] * vol[i]
        else:
            vjm = 2.0 * wall_vel[j] - vel[i]
            jump = (vel[i, 0] - vjm[0]) * ex + (vel[i, 1] - vjm[1]) * ey
            rate[i] += jump * dW[k] * vol[j]
    drho = np.zeros(n_total)
    drho[:n_fluid] = rate[:n_fluid] * rho[:n_fluid]
    return pos_out, drho


def integration_verlet(pairs, vol, B, rho, mass, pos, vel, drho_in,
                       force_prior, dt, n_fluid, n_total, rho0, p0, c_f,
                       wall_vel):
    rho1, p1, pos1, force, _ = integration_first(
        pairs, vol, B, rho, mass, pos, vel, drho_in, force_prior, dt,
        n_fluid, n_total, rho0, p0, c_f)
    vel2 = vel.copy()
    vel2[:n_fluid] += (force_prior[:n_fluid] + force[:n_fluid]) \
        / mass[:n_fluid, None] * dt
    vel2[n_fluid:] = 0.0
    pos2, drho2 = integration_second(
        pairs, vol, rho1, pos1, vel2, dt, n_fluid, n_total, wall_vel)
    rho2 = rho1.copy()
    p2 = np.zeros(n_total)
    for i in range(n_fluid):
        rho2[i] += drho2[i] * 0.5 * dt
        if rho2[i] < 1e-10:
            rho2[i] = rho0
        p2[i] = p0 * (rho2[i] / rho0 - 1.0)
    return rho2, p2, pos2, vel2, drho2, force


def wall_shear_monitor(pairs, pos, vel, wall_vel, vol, B, n_fluid, DL, DH,
                       mu, h):
    pi, pj, dx, dy, r, W, dW = pairs
    tau_bottom = 0.0
    tau_top = 0.0
    for k in range(pi.size):
        i, j = pi[k], pj[k]
        if j < n_fluid or r[k] <= 1e-12:
            continue
        ex, ey = dx[k] / r[k], dy[k] / r[k]
        b = B[i]
        ebe = ex * (b[0] * ex + b[1] * ey) + ey * (b[2] * ex + b[3] * ey)
        dv_x = vel[i, 0] - wall_vel[j, 0]
        f_pair = (4.0 * mu * ebe * dW[k] * vol[j] * dv_x
                  / (r[k] + 0.01 * h) * vol[i])
        if pos[j, 1] <= 0.0:
            tau_bottom += f_pair
        elif pos[j, 1] >= DH:
            tau_top += f_pair
    return -tau_bottom / DL, -tau_top / DL
