// sph_oracle.cpp — native host-side reference executor for the TPU SPH
// engine.
//
// Implements the full operator suite (pair search, density reinit + kernel
// gradient correction, Morris viscosity, transport correction, two-stage
// Verlet, wall shear) in double precision, serial, with the store-once
// pair-list semantics documented in SURVEY.md section 2 (the reference's
// sph_physics_mex.c operator contracts). Exposed as a C ABI for ctypes.
//
// Role in the framework:
//   * independent golden oracle for the JAX operators (three-way check
//     together with tests/oracle_numpy.py),
//   * fast CPU fallback executor for environments without an accelerator.
//
// This is a clean-room implementation from the documented operator
// formulas; it shares no code with the reference MEX sources.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr double kEpsReg = 1e-8;

struct Kernel {
  double sigma;
  double h;
  explicit Kernel(double h_) : sigma(10.0 / (7.0 * kPi * h_ * h_)), h(h_) {}
  void eval(double r, double* w, double* dw) const {
    const double q = r / h;
    if (q < 1.0) {
      *w = sigma * (1.0 - 1.5 * q * q + 0.75 * q * q * q);
      *dw = sigma * (-3.0 * q + 2.25 * q * q) / h;
    } else if (q < 2.0) {
      const double tq = 2.0 - q;
      *w = sigma * 0.25 * tq * tq * tq;
      *dw = -sigma * 0.75 * tq * tq / h;
    } else {
      *w = 0.0;
      *dw = 0.0;
    }
  }
  double w0() const { return sigma; }
};

inline double min_image(double dx, double DL) {
  return dx - DL * std::round(dx / DL);
}

}  // namespace

extern "C" {

// Cell-list periodic pair search. Fluid-fluid pairs emitted once (i < j),
// fluid-wall pairs from the fluid side. Returns the pair count, or -1 when
// max_pairs is insufficient. Output indices are 0-based.
int64_t sph_build_pairs(const double* x, const double* y, int64_t n_fluid,
                        int64_t n_total, double h, double DL,
                        int64_t max_pairs, int32_t* out_i, int32_t* out_j,
                        double* out_dx, double* out_dy, double* out_r,
                        double* out_w, double* out_dw) {
  const double cutoff = 2.0 * h;
  const double cut2 = cutoff * cutoff;
  Kernel kern(h);

  // grid: x-cells wrap periodically; width DL/nx >= cutoff so a 3x3 walk
  // always covers the seam (no ghost entries needed with minimum-image dx)
  int64_t nx = std::max<int64_t>(1, (int64_t)std::floor(DL / cutoff));
  const double cell_x = DL / (double)nx;
  double y_min = y[0], y_max = y[0];
  for (int64_t i = 1; i < n_total; ++i) {
    y_min = std::min(y_min, y[i]);
    y_max = std::max(y_max, y[i]);
  }
  const double cell_y = cutoff;
  int64_t ny = (int64_t)std::ceil((y_max - y_min + 1e-12) / cell_y) + 1;

  std::vector<int32_t> head((size_t)(nx * ny), -1);
  std::vector<int32_t> next((size_t)n_total, -1);
  std::vector<int32_t> cxs((size_t)n_total), cys((size_t)n_total);
  for (int64_t i = 0; i < n_total; ++i) {
    double xw = x[i] - std::floor(x[i] / DL) * DL;
    int64_t cx = (int64_t)std::floor(xw / cell_x);
    cx = std::min(std::max<int64_t>(cx, 0), nx - 1);
    int64_t cy = (int64_t)std::floor((y[i] - y_min) / cell_y);
    cy = std::min(std::max<int64_t>(cy, 0), ny - 1);
    cxs[(size_t)i] = (int32_t)cx;
    cys[(size_t)i] = (int32_t)cy;
    const size_t cid = (size_t)(cy * nx + cx);
    next[(size_t)i] = head[cid];
    head[cid] = (int32_t)i;
  }

  int64_t count = 0;
  for (int64_t i = 0; i < n_fluid; ++i) {
    for (int dy_c = -1; dy_c <= 1; ++dy_c) {
      const int64_t cy = cys[(size_t)i] + dy_c;
      if (cy < 0 || cy >= ny) continue;
      for (int dx_c = -1; dx_c <= 1; ++dx_c) {
        int64_t cx = cxs[(size_t)i] + dx_c;
        if (nx >= 3) {
          cx = (cx % nx + nx) % nx;
        } else if (cx < 0 || cx >= nx) {
          continue;  // tiny domains: every column already visited once
        }
        // avoid double-visiting a wrapped column when nx == 3 and dx_c
        // walks both -1 and +1 onto the same cell? nx>=3 keeps columns
        // distinct for offsets {-1,0,1}, so no dedup is needed.
        for (int32_t j = head[(size_t)(cy * nx + cx)]; j >= 0;
             j = next[(size_t)j]) {
          if (j == i) continue;
          if (j < n_fluid && j < i) continue;  // store once
          const double ddx = min_image(x[i] - x[j], DL);
          const double ddy = y[i] - y[j];
          const double r2 = ddx * ddx + ddy * ddy;
          if (r2 <= 1e-24 || r2 >= cut2) continue;
          const double r = std::sqrt(r2);
          double w, dw;
          kern.eval(r, &w, &dw);
          if (w <= 0.0 && std::fabs(dw) <= 0.0) continue;
          if (count >= max_pairs) return -1;
          out_i[count] = (int32_t)i;
          out_j[count] = (int32_t)j;
          out_dx[count] = ddx;
          out_dy[count] = ddy;
          out_r[count] = r;
          out_w[count] = w;
          out_dw[count] = dw;
          ++count;
        }
      }
    }
  }
  return count;
}

// Density reinitialization + kernel gradient correction.
// B layout: row-major [b11, b12, b21, b22] per particle.
void sph_density_correction(const int32_t* pi, const int32_t* pj,
                            const double* dx, const double* dy,
                            const double* r, const double* w,
                            const double* dw, int64_t n_pairs,
                            const double* mass, int64_t n_fluid,
                            int64_t n_total, double rho0, double h,
                            double inv_sigma0, double* rho_out,
                            double* vol_out, double* b_out) {
  Kernel kern(h);
  std::vector<double> sig_in((size_t)n_fluid, kern.w0());
  std::vector<double> sig_ct((size_t)n_fluid, 0.0);
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int32_t i = pi[k], j = pj[k];
    if (j < n_fluid) {
      sig_in[(size_t)i] += w[k];
      sig_in[(size_t)j] += w[k];
    } else {
      sig_ct[(size_t)i] += w[k] * (mass[j] / rho0);
    }
  }
  for (int64_t i = 0; i < n_total; ++i) rho_out[i] = rho0;
  for (int64_t i = 0; i < n_fluid; ++i) {
    double rhoi = sig_in[(size_t)i] * rho0 * inv_sigma0 +
                  sig_ct[(size_t)i] * rho0 * rho0 * inv_sigma0 / mass[i];
    rho_out[i] = (rhoi <= 1e-12) ? rho0 : rhoi;
  }
  for (int64_t i = 0; i < n_total; ++i) vol_out[i] = mass[i] / rho_out[i];

  std::vector<double> A((size_t)n_fluid * 4, 0.0);
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int32_t i = pi[k], j = pj[k];
    if (r[k] <= 1e-12) continue;
    const double ex = dx[k] / r[k], ey = dy[k] / r[k];
    const double fj = dw[k] * vol_out[j];
    double* Ai = &A[(size_t)i * 4];
    Ai[0] -= dx[k] * fj * ex;
    Ai[1] -= dx[k] * fj * ey;
    Ai[2] -= dy[k] * fj * ex;
    Ai[3] -= dy[k] * fj * ey;
    if (j < n_fluid) {
      const double fi = dw[k] * vol_out[i];
      double* Aj = &A[(size_t)j * 4];
      Aj[0] -= dx[k] * fi * ex;
      Aj[1] -= dx[k] * fi * ey;
      Aj[2] -= dy[k] * fi * ex;
      Aj[3] -= dy[k] * fi * ey;
    }
  }

  for (int64_t i = 0; i < n_total; ++i) {
    b_out[i * 4 + 0] = 1.0;
    b_out[i * 4 + 1] = 0.0;
    b_out[i * 4 + 2] = 0.0;
    b_out[i * 4 + 3] = 1.0;
  }
  for (int64_t i = 0; i < n_fluid; ++i) {
    const double a11 = A[(size_t)i * 4 + 0], a12 = A[(size_t)i * 4 + 1];
    const double a21 = A[(size_t)i * 4 + 2], a22 = A[(size_t)i * 4 + 3];
    const double ata11 = a11 * a11 + a21 * a21 + kEpsReg;
    const double ata12 = a11 * a12 + a21 * a22;
    const double ata22 = a12 * a12 + a22 * a22 + kEpsReg;
    const double det_m = ata11 * ata22 - ata12 * ata12;
    double p11 = 1.0, p12 = 0.0, p21 = 0.0, p22 = 1.0;
    if (std::fabs(det_m) >= 1e-20) {
      const double im11 = ata22 / det_m;
      const double im12 = -ata12 / det_m;
      const double im22 = ata11 / det_m;
      p11 = im11 * a11 + im12 * a12;
      p12 = im11 * a21 + im12 * a22;
      p21 = im12 * a11 + im22 * a12;
      p22 = im12 * a21 + im22 * a22;
    }
    const double det_a = a11 * a22 - a12 * a21;
    const double det_sqr = std::max(1.0 - det_a, 0.0);
    const double denom = det_a + det_sqr;
    double w1 = 0.0, w2 = 1.0;
    if (std::fabs(denom) >= 1e-12) {
      w1 = det_a / denom;
      w2 = det_sqr / denom;
    }
    b_out[i * 4 + 0] = w1 * p11 + w2;
    b_out[i * 4 + 1] = w1 * p12;
    b_out[i * 4 + 2] = w1 * p21;
    b_out[i * 4 + 3] = w1 * p22 + w2;
  }
}

// Morris laminar viscous force; vel/wall_vel/force laid out as [vx, vy]
// interleaved per particle (row-major n_total x 2).
void sph_viscous_force(const int32_t* pi, const int32_t* pj,
                       const double* dx, const double* dy, const double* r,
                       const double* dw, int64_t n_pairs, const double* vel,
                       const double* vol, const double* b, double mu,
                       double h, int64_t n_fluid, int64_t n_total,
                       const double* wall_vel, double* force_out) {
  std::vector<double> acc((size_t)n_total * 2, 0.0);
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int32_t i = pi[k], j = pj[k];
    if (r[k] <= 1e-12) continue;
    const double ex = dx[k] / r[k], ey = dy[k] / r[k];
    const double denom = r[k] + 0.01 * h;
    if (j < n_fluid) {
      const double bs11 = b[i * 4 + 0] + b[j * 4 + 0];
      const double bs12 = b[i * 4 + 1] + b[j * 4 + 1];
      const double bs21 = b[i * 4 + 2] + b[j * 4 + 2];
      const double bs22 = b[i * 4 + 3] + b[j * 4 + 3];
      const double ebe =
          ex * (bs11 * ex + bs12 * ey) + ey * (bs21 * ex + bs22 * ey);
      const double dvx = vel[i * 2] - vel[j * 2];
      const double dvy = vel[i * 2 + 1] - vel[j * 2 + 1];
      const double ci = ebe * mu * dw[k] * vol[j] / denom;
      const double cj = ebe * mu * dw[k] * vol[i] / denom;
      acc[(size_t)i * 2] += ci * dvx;
      acc[(size_t)i * 2 + 1] += ci * dvy;
      acc[(size_t)j * 2] -= cj * dvx;
      acc[(size_t)j * 2 + 1] -= cj * dvy;
    } else {
      const double ebe =
          ex * (b[i * 4 + 0] * ex + b[i * 4 + 1] * ey) +
          ey * (b[i * 4 + 2] * ex + b[i * 4 + 3] * ey);
      const double dvx = vel[i * 2] - wall_vel[j * 2];
      const double dvy = vel[i * 2 + 1] - wall_vel[j * 2 + 1];
      const double c = 4.0 * ebe * mu * dw[k] * vol[j] / denom;
      acc[(size_t)i * 2] += c * dvx;
      acc[(size_t)i * 2 + 1] += c * dvy;
    }
  }
  for (int64_t i = 0; i < n_fluid; ++i) {
    force_out[i * 2] = acc[(size_t)i * 2] * vol[i];
    force_out[i * 2 + 1] = acc[(size_t)i * 2 + 1] * vol[i];
  }
  for (int64_t i = n_fluid; i < n_total; ++i) {
    force_out[i * 2] = 0.0;
    force_out[i * 2 + 1] = 0.0;
  }
}

// Transport-velocity (shifting) correction; pos is row-major n_total x 2
// and modified in place for fluid rows.
void sph_transport_correction(const int32_t* pi, const int32_t* pj,
                              const double* dx, const double* dy,
                              const double* r, const double* dw,
                              int64_t n_pairs, const double* vol,
                              const double* b, double h, int64_t n_fluid,
                              int64_t n_total, double coeff, double* pos) {
  std::vector<double> inc((size_t)n_total * 2, 0.0);
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int32_t i = pi[k], j = pj[k];
    if (r[k] <= 1e-12) continue;
    const double ex = dx[k] / r[k], ey = dy[k] / r[k];
    if (j < n_fluid) {
      const double bs11 = b[i * 4 + 0] + b[j * 4 + 0];
      const double bs12 = b[i * 4 + 1] + b[j * 4 + 1];
      const double bs21 = b[i * 4 + 2] + b[j * 4 + 2];
      const double bs22 = b[i * 4 + 3] + b[j * 4 + 3];
      const double tx = bs11 * ex + bs12 * ey;
      const double ty = bs21 * ex + bs22 * ey;
      inc[(size_t)i * 2] += -dw[k] * vol[j] * tx;
      inc[(size_t)i * 2 + 1] += -dw[k] * vol[j] * ty;
      inc[(size_t)j * 2] += dw[k] * vol[i] * tx;
      inc[(size_t)j * 2 + 1] += dw[k] * vol[i] * ty;
    } else {
      const double tx = b[i * 4 + 0] * ex + b[i * 4 + 1] * ey;
      const double ty = b[i * 4 + 2] * ex + b[i * 4 + 3] * ey;
      inc[(size_t)i * 2] += -2.0 * dw[k] * vol[j] * tx;
      inc[(size_t)i * 2 + 1] += -2.0 * dw[k] * vol[j] * ty;
    }
  }
  for (int64_t i = 0; i < n_fluid; ++i) {
    const double ix = inc[(size_t)i * 2], iy = inc[(size_t)i * 2 + 1];
    double limiter = 100.0 * (ix * ix + iy * iy) / (h * h);
    limiter = std::min(std::max(limiter, 0.0), 1.0);
    pos[i * 2] += coeff * h * h * limiter * ix;
    pos[i * 2 + 1] += coeff * h * h * limiter * iy;
  }
}

// Composite single-step Verlet advance (5-step kick-drift-kick). All
// two-column arrays row-major n_total x 2; updates rho/p/pos/vel/drho in
// place and writes the pressure force to force_out.
void sph_integration_verlet(const int32_t* pi, const int32_t* pj,
                            const double* dx, const double* dy,
                            const double* r, const double* dw,
                            int64_t n_pairs, const double* vol,
                            const double* b, const double* mass, double dt,
                            int64_t n_fluid, int64_t n_total, double rho0,
                            double p0, double c_f, const double* wall_vel,
                            const double* force_prior, double* rho,
                            double* p, double* pos, double* vel,
                            double* drho, double* force_out) {
  // --- stage 1: half-kick density, EOS, half-drift ---
  for (int64_t i = 0; i < n_fluid; ++i) {
    rho[i] += 0.5 * dt * drho[i];
    if (rho[i] < 1e-10) rho[i] = rho0;
    p[i] = p0 * (rho[i] / rho0 - 1.0);
    pos[i * 2] += 0.5 * dt * vel[i * 2];
    pos[i * 2 + 1] += 0.5 * dt * vel[i * 2 + 1];
  }
  for (int64_t i = n_fluid; i < n_total; ++i) p[i] = 0.0;

  // --- stage 1: Riemann pressure force + dissipation ---
  std::vector<double> diss((size_t)n_total, 0.0);
  std::memset(force_out, 0, sizeof(double) * (size_t)n_total * 2);
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int32_t i = pi[k], j = pj[k];
    if (r[k] <= 1e-12) continue;
    const double ex = dx[k] / r[k], ey = dy[k] / r[k];
    if (j < n_fluid) {
      const double rho_bar = 0.5 * (rho[i] + rho[j]);
      const double un_l = vel[i * 2] * ex + vel[i * 2 + 1] * ey;
      const double un_r = vel[j * 2] * ex + vel[j * 2 + 1] * ey;
      double beta = std::max(un_l - un_r, 0.0) * 3.0;
      beta = std::min(beta, c_f);
      const double p_avg = 0.5 * (p[i] + p[j]);
      const double p_star = p_avg + 0.5 * beta * rho_bar * (un_l - un_r);
      const double p_face = 0.5 * (p_avg + p_star);
      const double tx = p_face * ((b[i * 4 + 0] + b[j * 4 + 0]) * ex +
                                  (b[i * 4 + 1] + b[j * 4 + 1]) * ey);
      const double ty = p_face * ((b[i * 4 + 2] + b[j * 4 + 2]) * ex +
                                  (b[i * 4 + 3] + b[j * 4 + 3]) * ey);
      const double dwvj = dw[k] * vol[j];
      const double dwvi = dw[k] * vol[i];
      force_out[i * 2] -= tx * dwvj;
      force_out[i * 2 + 1] -= ty * dwvj;
      force_out[j * 2] += tx * dwvi;
      force_out[j * 2 + 1] += ty * dwvi;
      const double pd = p[i] - p[j];
      diss[(size_t)i] += (pd / (rho0 * c_f)) * dwvj;
      diss[(size_t)j] += (-pd / (rho0 * c_f)) * dwvi;
    } else {
      const double ax = force_prior[i * 2] / mass[i];
      const double ay = force_prior[i * 2 + 1] / mass[i];
      const double face_acc = -(ax * ex + ay * ey);
      const double p_wall = p[i] + rho[i] * r[k] * std::max(0.0, face_acc);
      const double tx = b[i * 4 + 0] * ex + b[i * 4 + 1] * ey;
      const double ty = b[i * 4 + 2] * ex + b[i * 4 + 3] * ey;
      const double dwvj = dw[k] * vol[j];
      force_out[i * 2] -= (p[i] + p_wall) * dwvj * tx;
      force_out[i * 2 + 1] -= (p[i] + p_wall) * dwvj * ty;
      diss[(size_t)i] += ((p[i] - p_wall) / (rho0 * c_f)) * dwvj;
    }
  }
  for (int64_t i = 0; i < n_fluid; ++i) {
    force_out[i * 2] *= vol[i];
    force_out[i * 2 + 1] *= vol[i];
  }
  for (int64_t i = n_fluid; i < n_total; ++i) {
    force_out[i * 2] = 0.0;
    force_out[i * 2 + 1] = 0.0;
  }

  // --- full-step kick; walls pinned ---
  for (int64_t i = 0; i < n_fluid; ++i) {
    const double inv_m = 1.0 / mass[i];
    vel[i * 2] += (force_prior[i * 2] + force_out[i * 2]) * inv_m * dt;
    vel[i * 2 + 1] +=
        (force_prior[i * 2 + 1] + force_out[i * 2 + 1]) * inv_m * dt;
  }
  for (int64_t i = n_fluid; i < n_total; ++i) {
    vel[i * 2] = 0.0;
    vel[i * 2 + 1] = 0.0;
  }

  // --- stage 2: second half-drift + continuity rate ---
  for (int64_t i = 0; i < n_fluid; ++i) {
    pos[i * 2] += 0.5 * dt * vel[i * 2];
    pos[i * 2 + 1] += 0.5 * dt * vel[i * 2 + 1];
  }
  std::vector<double> rate((size_t)n_total, 0.0);
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int32_t i = pi[k], j = pj[k];
    if (r[k] <= 1e-12) continue;
    const double ex = dx[k] / r[k], ey = dy[k] / r[k];
    if (j < n_fluid) {
      const double ujump = (vel[i * 2] - vel[j * 2]) * ex +
                           (vel[i * 2 + 1] - vel[j * 2 + 1]) * ey;
      rate[(size_t)i] += ujump * dw[k] * vol[j];
      rate[(size_t)j] += ujump * dw[k] * vol[i];
    } else {
      const double jump = 2.0 * ((vel[i * 2] - wall_vel[j * 2]) * ex +
                                 (vel[i * 2 + 1] - wall_vel[j * 2 + 1]) * ey);
      rate[(size_t)i] += jump * dw[k] * vol[j];
    }
  }
  for (int64_t i = 0; i < n_fluid; ++i) {
    drho[i] = rate[(size_t)i] * rho[i];
    rho[i] += 0.5 * dt * drho[i];
    if (rho[i] < 1e-10) rho[i] = rho0;
    p[i] = p0 * (rho[i] / rho0 - 1.0);
  }
  for (int64_t i = n_fluid; i < n_total; ++i) drho[i] = 0.0;
}

// Wall shear monitor: tau = -sum(f_pair)/DL per wall side.
void sph_wall_shear(const int32_t* pi, const int32_t* pj, const double* dx,
                    const double* dy, const double* r, const double* dw,
                    int64_t n_pairs, const double* pos, const double* vel,
                    const double* wall_vel, const double* vol,
                    const double* b, int64_t n_fluid, double DL, double DH,
                    double mu, double h, double* tau_bottom,
                    double* tau_top) {
  double bot = 0.0, top = 0.0;
  for (int64_t k = 0; k < n_pairs; ++k) {
    const int32_t i = pi[k], j = pj[k];
    if (j < n_fluid || r[k] <= 1e-12) continue;
    const double ex = dx[k] / r[k], ey = dy[k] / r[k];
    const double ebe = ex * (b[i * 4 + 0] * ex + b[i * 4 + 1] * ey) +
                       ey * (b[i * 4 + 2] * ex + b[i * 4 + 3] * ey);
    const double dvx = vel[i * 2] - wall_vel[j * 2];
    const double f = 4.0 * mu * ebe * dw[k] * vol[j] * dvx /
                     (r[k] + 0.01 * h) * vol[i];
    if (pos[j * 2 + 1] <= 0.0) {
      bot += f;
    } else if (pos[j * 2 + 1] >= DH) {
      top += f;
    }
  }
  *tau_bottom = -bot / DL;
  *tau_top = -top / DL;
}

}  // extern "C"
