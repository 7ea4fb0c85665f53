// L-BFGS-B core in C++ — the native host/CPU execution backend.
//
// Role parity with the reference: the Rust crate's only native algorithmic
// core is the Fortran `setulb_` reached by FFI
// (/root/reference/src/quasi_newton/lbfgsb.rs:36-57).  This is a clean-room
// C++ implementation of the same algorithm (Byrd, Lu, Nocedal, Zhu, "A
// limited memory algorithm for bound constrained optimization", SIAM J.
// Sci. Comput. 16(5), 1995): limited-memory compact representation,
// generalized Cauchy point, direct primal subspace minimization, and a
// More-Thuente (MINPACK-2 dcsrch-style) strong-Wolfe line search.  Instead
// of the Fortran's reverse-communication protocol the oracle is a plain
// callback, matching the closure seam of the Rust crate and the Python
// bindings (ctypes CFUNCTYPE).
//
// The same algorithm, batched and device-resident, lives in
// optimization_solvers_tpu/solvers/lbfgsb.py; this backend serves hosts
// without an accelerator and doubles as an independent cross-check.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();
constexpr double kEps = 2.220446049250313e-16;

using Vec = std::vector<double>;

double dot(const Vec& a, const Vec& b) {
  return std::inner_product(a.begin(), a.end(), b.begin(), 0.0);
}

double nrm_inf(const Vec& a) {
  double m = 0.0;
  for (double v : a) m = std::max(m, std::fabs(v));
  return m;
}

// ---------------------------------------------------------------------------
// Small dense SPD helpers (matrices stored row-major, dimension mm <= 2m).

bool cholesky(std::vector<double>& a, int mm) {  // in-place lower factor
  for (int j = 0; j < mm; ++j) {
    double d = a[j * mm + j];
    for (int k = 0; k < j; ++k) d -= a[j * mm + k] * a[j * mm + k];
    if (d <= 0.0 || !std::isfinite(d)) return false;
    const double lj = std::sqrt(d);
    a[j * mm + j] = lj;
    for (int i = j + 1; i < mm; ++i) {
      double s = a[i * mm + j];
      for (int k = 0; k < j; ++k) s -= a[i * mm + k] * a[j * mm + k];
      a[i * mm + j] = s / lj;
    }
  }
  return true;
}

void chol_solve(const std::vector<double>& L, int mm, double* b) {
  for (int i = 0; i < mm; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i * mm + k] * b[k];
    b[i] = s / L[i * mm + i];
  }
  for (int i = mm - 1; i >= 0; --i) {
    double s = b[i];
    for (int k = i + 1; k < mm; ++k) s -= L[k * mm + i] * b[k];
    b[i] = s / L[i * mm + i];
  }
}

// ---------------------------------------------------------------------------

struct Middle {
  // Solves with MM = [[-D, L^T],[L, theta S S^T]] via the SPD Schur
  // complement (the factorization the Fortran formk maintains).
  int m;
  Vec D;            // diag of first block (patched to 1 on invalid slots)
  Vec L;            // (m, m) strictly lower s_i . y_j
  std::vector<double> schur_chol;  // (m, m) lower factor of theta SS^T + L D^-1 L^T

  void solve(const double* ab, double* out) const {
    // u = D^{-1}(L^T v - a); (Schur) v = b + L D^{-1} a
    Vec rhs(m);
    for (int i = 0; i < m; ++i) {
      double s = ab[m + i];
      for (int k = 0; k < i; ++k) s += L[i * m + k] * ab[k] / D[k];
      rhs[i] = s;
    }
    chol_solve(schur_chol, m, rhs.data());
    for (int i = 0; i < m; ++i) {
      double s = -ab[i];
      for (int k = i + 1; k < m; ++k) s += L[k * m + i] * rhs[k];
      out[i] = s / D[i];
    }
    std::memcpy(out + m, rhs.data(), m * sizeof(double));
  }
};

struct State {
  int n, m;
  std::vector<Vec> S, Y;  // chronological, oldest first, size <= m
  double theta = 1.0;

  int count() const { return static_cast<int>(S.size()); }

  // W rows: [y_0..y_{c-1}, theta s_0..theta s_{c-1}], each length n.
  double wrow_dot(int r, const Vec& v) const {
    const int c = count();
    if (r < c) return dot(Y[r], v);
    return theta * dot(S[r - c], v);
  }

  double wcol(int r, int j) const {  // W[j, r] (column j of W^T)
    const int c = count();
    if (r < c) return Y[r][j];
    return theta * S[r - c][j];
  }

  Middle factor() const {
    const int c = count();
    Middle mid;
    mid.m = c;
    mid.D.resize(c);
    mid.L.assign(c * c, 0.0);
    std::vector<double> schur(c * c, 0.0);
    for (int i = 0; i < c; ++i) {
      mid.D[i] = dot(S[i], Y[i]);
      for (int j = 0; j < i; ++j) mid.L[i * c + j] = dot(S[i], Y[j]);
    }
    for (int i = 0; i < c; ++i)
      for (int j = 0; j <= i; ++j) {
        double v = theta * dot(S[i], S[j]);
        for (int k = 0; k < std::min(i, j); ++k)
          v += mid.L[i * c + k] * mid.L[j * c + k] / mid.D[k];
        schur[i * c + j] = v;
        schur[j * c + i] = v;
      }
    mid.schur_chol = schur;
    cholesky(mid.schur_chol, c);
    return mid;
  }
};

// ---------------------------------------------------------------------------
// Generalized Cauchy point (paper alg. CP).

void cauchy_point(const State& st, const Vec& x, const Vec& g, const Vec& lo,
                  const Vec& up, const Middle& mid, Vec& xcp, Vec& c_out,
                  std::vector<char>& free_mask) {
  const int n = static_cast<int>(x.size());
  const int c = st.count();
  const int two = 2 * c;
  const double theta = st.theta;

  Vec t_break(n), d(n);
  for (int i = 0; i < n; ++i) {
    if (g[i] < 0.0)
      t_break[i] = (x[i] - up[i]) / g[i];
    else if (g[i] > 0.0)
      t_break[i] = (x[i] - lo[i]) / g[i];
    else
      t_break[i] = kInf;
    d[i] = (t_break[i] > 0.0) ? -g[i] : 0.0;
  }

  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    const double ta = t_break[a] > 0.0 ? t_break[a] : kInf;
    const double tb = t_break[b] > 0.0 ? t_break[b] : kInf;
    return ta < tb;
  });

  Vec p(two), cvec(two, 0.0), tmp(two);
  for (int r = 0; r < two; ++r) p[r] = st.wrow_dot(r, d);

  double f1 = -dot(d, d);
  double f2 = -theta * f1;
  if (two > 0) {
    mid.solve(p.data(), tmp.data());
    for (int r = 0; r < two; ++r) f2 -= p[r] * tmp[r];
  }
  auto seg_min = [](double f1v, double f2v) {
    if (f2v > 0.0) return -f1v / f2v;
    return f1v < 0.0 ? kInf : 0.0;
  };
  double dt_min = seg_min(f1, f2);
  double t_old = 0.0;

  xcp = x;
  std::vector<char> fixed(n, 0);

  for (int jj = 0; jj < n; ++jj) {
    const int b = order[jj];
    const double tb = t_break[b] > 0.0 ? t_break[b] : kInf;
    if (!std::isfinite(tb) || dt_min < tb - t_old) break;

    const double dt = tb - t_old;
    const double gb = g[b];
    const double bound_b = d[b] > 0.0 ? up[b] : lo[b];
    const double zb = bound_b - x[b];

    for (int r = 0; r < two; ++r) cvec[r] += dt * p[r];
    f1 += dt * f2 + gb * gb + theta * gb * zb;
    f2 -= theta * gb * gb;
    if (two > 0) {
      Vec wb(two);
      for (int r = 0; r < two; ++r) wb[r] = st.wcol(r, b);
      mid.solve(cvec.data(), tmp.data());
      for (int r = 0; r < two; ++r) f1 -= gb * wb[r] * tmp[r];
      mid.solve(p.data(), tmp.data());
      for (int r = 0; r < two; ++r) f2 -= 2.0 * gb * wb[r] * tmp[r];
      mid.solve(wb.data(), tmp.data());
      for (int r = 0; r < two; ++r) f2 -= gb * gb * wb[r] * tmp[r];
      for (int r = 0; r < two; ++r) p[r] += gb * wb[r];
    }
    d[b] = 0.0;
    xcp[b] = bound_b;
    fixed[b] = 1;
    dt_min = seg_min(f1, f2);
    t_old = tb;
  }

  dt_min = std::max(dt_min, 0.0);
  const double t_cp = t_old + dt_min;
  // dt_min can be +inf when the model minimizer lies beyond every
  // breakpoint; the remaining direction (and p) are exactly zero then, so
  // guard the inf * 0 = NaN products
  const double dt_fin = std::isfinite(dt_min) ? dt_min : 0.0;
  for (int r = 0; r < two; ++r) cvec[r] += dt_fin * p[r];
  for (int i = 0; i < n; ++i)
    if (!fixed[i]) xcp[i] = (d[i] == 0.0) ? x[i] : x[i] + t_cp * d[i];

  c_out = cvec;
  free_mask.assign(n, 0);
  for (int i = 0; i < n; ++i) free_mask[i] = (t_break[i] > 0.0 && !fixed[i]);
}

// ---------------------------------------------------------------------------
// Direct primal subspace minimization (paper §5.1) with the SMW identity
// (B_F)^{-1} r = r/theta + W_F (MM - W_F^T W_F/theta)^{-1} W_F^T r / theta^2,
// where the modified middle matrix is solved with the same Schur-complement
// block elimination, its blocks densified by the free-set projection.

void subspace_step(const State& st, const Vec& x, const Vec& g, const Vec& xcp,
                   const Vec& cvec, const std::vector<char>& free_mask,
                   const Vec& lo, const Vec& up, const Middle& mid,
                   Vec& xbar) {
  const int n = static_cast<int>(x.size());
  const int c = st.count();
  const int two = 2 * c;
  const double theta = st.theta;

  Vec r(n);
  Vec Mc(two);
  if (two > 0) mid.solve(cvec.data(), Mc.data());
  for (int i = 0; i < n; ++i) {
    double wMc = 0.0;
    for (int rr = 0; rr < two; ++rr) wMc += st.wcol(rr, i) * Mc[rr];
    r[i] = g[i] + theta * (xcp[i] - x[i]) - wMc;
    if (!free_mask[i]) r[i] = 0.0;
  }

  Vec du(n, 0.0);
  if (two == 0) {
    for (int i = 0; i < n; ++i)
      if (free_mask[i]) du[i] = -r[i] / theta;
  } else {
    // P = [[-E, G],[G^T, H]] with E = D + Y_F Y_F^T/theta,
    // G = L^T - Y_F S_F^T, H = theta S_A S_A^T  (A = active set).
    std::vector<double> E(c * c, 0.0), G(c * c, 0.0), H(c * c, 0.0);
    for (int i = 0; i < c; ++i)
      for (int j = 0; j < c; ++j) {
        double yy = 0.0, ys = 0.0, ssA = 0.0;
        for (int k = 0; k < n; ++k) {
          if (free_mask[k]) {
            yy += st.Y[i][k] * st.Y[j][k];
            ys += st.Y[i][k] * st.S[j][k];
          } else {
            ssA += st.S[i][k] * st.S[j][k];
          }
        }
        E[i * c + j] = yy / theta + (i == j ? mid.D[i] : 0.0);
        G[i * c + j] = (j > i ? mid.L[j * c + i] : 0.0) - ys;
        H[i * c + j] = theta * ssA;
      }
    std::vector<double> Ech = E;
    if (cholesky(Ech, c)) {
      // Schur2 = H + G^T E^{-1} G
      std::vector<double> EinvG(c * c);
      for (int j = 0; j < c; ++j) {
        Vec col(c);
        for (int i = 0; i < c; ++i) col[i] = G[i * c + j];
        chol_solve(Ech, c, col.data());
        for (int i = 0; i < c; ++i) EinvG[i * c + j] = col[i];
      }
      std::vector<double> schur2(c * c, 0.0);
      for (int i = 0; i < c; ++i)
        for (int j = 0; j < c; ++j) {
          double v = H[i * c + j];
          for (int k = 0; k < c; ++k) v += G[k * c + i] * EinvG[k * c + j];
          schur2[i * c + j] = v;
        }
      std::vector<double> sch = schur2;
      if (cholesky(sch, c)) {
        // u2 = W_F^T r
        Vec u2(two);
        for (int rr = 0; rr < two; ++rr) {
          double s = 0.0;
          for (int k = 0; k < n; ++k)
            if (free_mask[k]) s += st.wcol(rr, k) * r[k];
          u2[rr] = s;
        }
        // block solve of P v = u2
        Vec a(u2.begin(), u2.begin() + c), b(u2.begin() + c, u2.end());
        Vec Einv_a = a;
        chol_solve(Ech, c, Einv_a.data());
        Vec rhs(c);
        for (int i = 0; i < c; ++i) {
          double s = b[i];
          for (int k = 0; k < c; ++k) s += G[k * c + i] * Einv_a[k];
          rhs[i] = s;
        }
        chol_solve(sch, c, rhs.data());
        Vec u(c);
        for (int i = 0; i < c; ++i) {
          double s = -a[i];
          for (int k = 0; k < c; ++k) s += G[i * c + k] * rhs[k];
          u[i] = s;
        }
        chol_solve(Ech, c, u.data());
        Vec v(two);
        std::copy(u.begin(), u.end(), v.begin());
        std::copy(rhs.begin(), rhs.end(), v.begin() + c);
        for (int i = 0; i < n; ++i) {
          if (!free_mask[i]) continue;
          double wv = 0.0;
          for (int rr = 0; rr < two; ++rr) wv += st.wcol(rr, i) * v[rr];
          du[i] = -(r[i] / theta + wv / (theta * theta));
        }
      } else {
        for (int i = 0; i < n; ++i)
          if (free_mask[i]) du[i] = -r[i] / theta;
      }
    } else {
      for (int i = 0; i < n; ++i)
        if (free_mask[i]) du[i] = -r[i] / theta;
    }
  }

  double alpha = 1.0;
  for (int i = 0; i < n; ++i) {
    if (!free_mask[i] || du[i] == 0.0) continue;
    const double step =
        du[i] > 0.0 ? (up[i] - xcp[i]) / du[i] : (lo[i] - xcp[i]) / du[i];
    if (std::isfinite(step)) alpha = std::min(alpha, step);
  }
  alpha = std::max(alpha, 0.0);

  xbar = xcp;
  for (int i = 0; i < n; ++i)
    if (free_mask[i]) xbar[i] += alpha * du[i];
  // clip away rounding dust: an epsilon-outward component on a coordinate
  // sitting exactly on its bound collapses the line search's max feasible
  // step to -0.0 (mathematically xbar is already in the box)
  for (int i = 0; i < n; ++i)
    xbar[i] = std::min(std::max(xbar[i], lo[i]), up[i]);
}

// ---------------------------------------------------------------------------
// MINPACK-2 style dcstep / dcsrch strong-Wolfe line search on the segment
// [x, x + stpmax * dvec].

struct StepState {
  double stx = 0, fx = 0, dx = 0;
  double sty = 0, fy = 0, dy = 0;
  bool brackt = false;
};

double dcstep(StepState& s, double stp, double fp, double dp, double stmin,
              double stmax) {
  const double sgnd = dp * (s.dx >= 0 ? 1.0 : -1.0);
  double stpf;
  if (!(fp <= s.fx)) {  // NaN-safe: NaN trial counts as higher
    const double theta = 3.0 * (s.fx - fp) / (stp - s.stx) + s.dx + dp;
    const double sc = std::max({std::fabs(theta), std::fabs(s.dx), std::fabs(dp)});
    double gamma = sc * std::sqrt(std::max(
        0.0, (theta / sc) * (theta / sc) - (s.dx / sc) * (dp / sc)));
    if (stp < s.stx) gamma = -gamma;
    const double p = (gamma - s.dx) + theta;
    const double q = ((gamma - s.dx) + gamma) + dp;
    const double rr = p / q;
    const double stpc = s.stx + rr * (stp - s.stx);
    const double stpq =
        s.stx + ((s.dx / ((s.fx - fp) / (stp - s.stx) + s.dx)) / 2.0) * (stp - s.stx);
    stpf = (std::fabs(stpc - s.stx) < std::fabs(stpq - s.stx))
               ? stpc
               : stpc + (stpq - stpc) / 2.0;
    s.brackt = true;
  } else if (sgnd < 0.0) {
    const double theta = 3.0 * (s.fx - fp) / (stp - s.stx) + s.dx + dp;
    const double sc = std::max({std::fabs(theta), std::fabs(s.dx), std::fabs(dp)});
    double gamma = sc * std::sqrt(std::max(
        0.0, (theta / sc) * (theta / sc) - (s.dx / sc) * (dp / sc)));
    if (stp > s.stx) gamma = -gamma;
    const double p = (gamma - dp) + theta;
    const double q = ((gamma - dp) + gamma) + s.dx;
    const double rr = p / q;
    const double stpc = stp + rr * (s.stx - stp);
    const double stpq = stp + (dp / (dp - s.dx)) * (s.stx - stp);
    stpf = (std::fabs(stpc - stp) > std::fabs(stpq - stp)) ? stpc : stpq;
    s.brackt = true;
  } else if (std::fabs(dp) < std::fabs(s.dx)) {
    const double theta = 3.0 * (s.fx - fp) / (stp - s.stx) + s.dx + dp;
    const double sc = std::max({std::fabs(theta), std::fabs(s.dx), std::fabs(dp)});
    double gamma = sc * std::sqrt(std::max(
        0.0, (theta / sc) * (theta / sc) - (s.dx / sc) * (dp / sc)));
    if (stp > s.stx) gamma = -gamma;
    const double p = (gamma - dp) + theta;
    const double q = (gamma + (s.dx - dp)) + gamma;
    const double rr = p / q;
    double stpc;
    if (rr < 0.0 && gamma != 0.0)
      stpc = stp + rr * (s.stx - stp);
    else
      stpc = stp > s.stx ? stmax : stmin;
    const double stpq = stp + (dp / (dp - s.dx)) * (s.stx - stp);
    if (s.brackt) {
      stpf = (std::fabs(stpc - stp) < std::fabs(stpq - stp)) ? stpc : stpq;
      stpf = stp > s.stx ? std::min(stp + 0.66 * (s.sty - stp), stpf)
                         : std::max(stp + 0.66 * (s.sty - stp), stpf);
    } else {
      stpf = (std::fabs(stpc - stp) > std::fabs(stpq - stp)) ? stpc : stpq;
      stpf = std::clamp(stpf, stmin, stmax);
    }
  } else {
    if (s.brackt) {
      const double theta = 3.0 * (fp - s.fy) / (s.sty - stp) + s.dy + dp;
      const double sc = std::max({std::fabs(theta), std::fabs(s.dy), std::fabs(dp)});
      double gamma = sc * std::sqrt(std::max(
          0.0, (theta / sc) * (theta / sc) - (s.dy / sc) * (dp / sc)));
      if (stp > s.sty) gamma = -gamma;
      const double p = (gamma - dp) + theta;
      const double q = ((gamma - dp) + gamma) + s.dy;
      stpf = stp + (p / q) * (s.sty - stp);
    } else {
      stpf = stp > s.stx ? stmax : stmin;
    }
  }

  if (!(fp <= s.fx)) {  // NaN-safe: NaN trial counts as higher
    s.sty = stp; s.fy = fp; s.dy = dp;
  } else {
    if (sgnd < 0.0) { s.sty = s.stx; s.fy = s.fx; s.dy = s.dx; }
    s.stx = stp; s.fx = fp; s.dx = dp;
  }
  stpf = std::clamp(stpf, stmin, stmax);
  if (!std::isfinite(stpf))
    stpf = s.brackt ? s.stx + 0.5 * (s.sty - s.stx) : stmin;
  return stpf;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI.

extern "C" {

typedef void (*oracle_fn)(const double* x, int n, double* f, double* g,
                          void* user);

// Status codes match optimization_solvers_tpu.core.types.Status.
int ost_lbfgsb_minimize(int n, int m, double* x, const double* lower,
                        const double* upper, double factr, double pgtol,
                        int max_iter, int max_iter_ls, oracle_fn oracle,
                        void* user, double* out_f, int* out_iters) {
  Vec lo(lower, lower + n), up(upper, upper + n);
  Vec xk(x, x + n);
  for (int i = 0; i < n; ++i) xk[i] = std::clamp(xk[i], lo[i], up[i]);

  Vec g(n), g_new(n);
  double f;
  oracle(xk.data(), n, &f, g.data(), user);

  State st;
  st.n = n;
  st.m = m;

  const double f_rtol = factr * kEps;
  double f_prev = kInf;
  int k = 0;
  int status = 2;  // MAX_ITER_REACHED unless a stop fires

  Vec xcp, cvec, xbar, d(n), x_new(n);
  std::vector<char> free_mask;

  for (; k < max_iter; ++k) {
    if (!std::isfinite(f)) { status = 3; break; }  // OUT_OF_DOMAIN
    // projected-gradient + relative-decrease stopping (setulb semantics)
    double pg = 0.0;
    for (int i = 0; i < n; ++i)
      pg = std::max(pg, std::fabs(xk[i] - std::clamp(xk[i] - g[i], lo[i], up[i])));
    if (pg <= pgtol) { status = 1; break; }
    const double fmax = std::max({std::fabs(f), std::fabs(f_prev), 1.0});
    if (std::isfinite(f_prev) && (f_prev - f) <= f_rtol * fmax) {
      status = 1;
      break;
    }

    const Middle mid = st.factor();
    cauchy_point(st, xk, g, lo, up, mid, xcp, cvec, free_mask);
    subspace_step(st, xk, g, xcp, cvec, free_mask, lo, up, mid, xbar);
    for (int i = 0; i < n; ++i) d[i] = xbar[i] - xk[i];

    // feasible max step along d
    double stpmax = kInf;
    for (int i = 0; i < n; ++i) {
      if (d[i] > 0.0)
        stpmax = std::min(stpmax, (up[i] - xk[i]) / d[i]);
      else if (d[i] < 0.0)
        stpmax = std::min(stpmax, (lo[i] - xk[i]) / d[i]);
    }

    // dcsrch strong Wolfe (ftol=1e-3, gtol=0.9)
    const double c1 = 1e-3, c2 = 0.9, xtol = 0.1;
    const double g0d = dot(g, d);
    double stp = std::min(1.0, stpmax);
    StepState ss;
    ss.fx = ss.fy = f;
    ss.dx = ss.dy = g0d;
    double stmin = 0.0, stmax_i = stp + 4.0 * stp;
    double width = stpmax, width1 = 2.0 * stpmax;
    bool stage1 = true;
    double f_t = f, g_td = g0d;
    for (int ls = 0; ls < max_iter_ls; ++ls) {
      for (int i = 0; i < n; ++i) x_new[i] = xk[i] + stp * d[i];
      oracle(x_new.data(), n, &f_t, g_new.data(), user);
      g_td = dot(g_new, d);
      const double ftest = f + stp * c1 * g0d;
      if (stage1 && f_t <= ftest && g_td >= 0.0) stage1 = false;
      if (f_t <= ftest && std::fabs(g_td) <= c2 * (-g0d)) break;       // Wolfe
      if (ss.brackt && (stmax_i - stmin) <= xtol * stmax_i) break;
      if (stp == stpmax && f_t <= ftest && g_td <= c1 * g0d) break;
      if (stp == 0.0 && (f_t > ftest || g_td >= c1 * g0d)) break;

      double fp = f_t, dp = g_td;
      double fx_s = ss.fx, fy_s = ss.fy, dx_s = ss.dx, dy_s = ss.dy;
      const bool use_mod = stage1 && f_t <= ss.fx && f_t > ftest;
      if (use_mod) {
        const double gtest = c1 * g0d;
        fp -= stp * gtest;
        ss.fx -= ss.stx * gtest; ss.fy -= ss.sty * gtest;
        ss.dx -= gtest; ss.dy -= gtest;
        dp -= gtest;
      }
      stp = dcstep(ss, stp, fp, dp, stmin, stmax_i);
      if (use_mod) {
        const double gtest = c1 * g0d;
        ss.fx += ss.stx * gtest; ss.fy += ss.sty * gtest;
        ss.dx += gtest; ss.dy += gtest;
        (void)fx_s; (void)fy_s; (void)dx_s; (void)dy_s;
      }
      if (ss.brackt) {
        if (std::fabs(ss.sty - ss.stx) >= 0.66 * width1)
          stp = ss.stx + 0.5 * (ss.sty - ss.stx);
        width1 = width;
        width = std::fabs(ss.sty - ss.stx);
        stmin = std::min(ss.stx, ss.sty);
        stmax_i = std::max(ss.stx, ss.sty);
      } else {
        stmin = stp + 1.1 * (stp - ss.stx);
        stmax_i = stp + 4.0 * (stp - ss.stx);
      }
      stp = std::clamp(stp, 0.0, stpmax);
      if (stp <= 0.0) { stp = ss.stx; break; }
    }

    for (int i = 0; i < n; ++i) x_new[i] = xk[i] + stp * d[i];
    oracle(x_new.data(), n, &f_t, g_new.data(), user);

    // Fortran mainlb line-search-failure semantics (reference surfaces the
    // resulting task at lbfgsb.rs:76-84): a forced exit that accepted a
    // non-descent trial, a zero step, or a poisoned (non-finite) step
    // restores the previous iterate; with corrections present the history
    // is discarded and the iteration retried, otherwise ABNORMAL.
    bool no_move = true;
    for (int i = 0; i < n; ++i)
      if (x_new[i] != xk[i]) { no_move = false; break; }
    // failure = poisoned eval, accepted-worse trial, zero step, or a tiny
    // forced-exit step whose update underflowed (no representable progress)
    const bool ls_fail = !std::isfinite(f_t) || f_t > f || stp <= 0.0 ||
                         no_move;
    if (ls_fail) {
      bool had_hist = st.count() > 0;
      st.S.clear();
      st.Y.clear();
      st.theta = 1.0;
      if (!had_hist) { status = 5; break; }  // ABNORMAL
      f_prev = kInf;  // disable the stall exit for the retry iteration
      continue;
    }

    {
      Vec s_vec(n), y_vec(n);
      for (int i = 0; i < n; ++i) {
        s_vec[i] = x_new[i] - xk[i];
        y_vec[i] = g_new[i] - g[i];
      }
      const double sy = dot(s_vec, y_vec);
      const double yy = dot(y_vec, y_vec);
      if (sy > kEps * yy) {
        if (st.count() == m) {
          st.S.erase(st.S.begin());
          st.Y.erase(st.Y.begin());
        }
        st.S.push_back(std::move(s_vec));
        st.Y.push_back(std::move(y_vec));
        st.theta = yy / sy;
      }
      f_prev = f;
      xk = x_new;
      f = f_t;
      g = g_new;
    }
  }

  std::memcpy(x, xk.data(), n * sizeof(double));
  *out_f = f;
  *out_iters = k;
  return status;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Built-in Rosenbrock oracle + benchmark driver: measures the reference
// execution model (sequential native solves, analytic gradients, one CPU
// core — what the Rust crate + Fortran core would do) with zero
// cross-language callback overhead.

namespace {

void rosen_oracle(const double* x, int n, double* f, double* g, void*) {
  double fv = 0.0;
  for (int i = 0; i < n; ++i) g[i] = 0.0;
  for (int i = 0; i + 1 < n; ++i) {
    const double t = x[i + 1] - x[i] * x[i];
    const double u = 1.0 - x[i];
    fv += 100.0 * t * t + u * u;
    g[i] += -400.0 * x[i] * t - 2.0 * u;
    g[i + 1] += 200.0 * t;
  }
  *f = fv;
}

}  // namespace

extern "C" {

// Solves `count` Rosenbrock-n instances sequentially; x0s is (count, n)
// row-major and is overwritten with the minimizers.  Returns the number of
// converged instances; *out_fsum accumulates final objective values.
int ost_bench_rosenbrock(int count, int n, int m, double* x0s,
                         const double* lower, const double* upper,
                         double factr, double pgtol, int max_iter,
                         double* out_fsum) {
  int converged = 0;
  double fsum = 0.0;
  for (int i = 0; i < count; ++i) {
    double f = 0.0;
    int iters = 0;
    const int status = ost_lbfgsb_minimize(
        n, m, x0s + static_cast<long>(i) * n, lower, upper, factr, pgtol,
        max_iter, 20, rosen_oracle, nullptr, &f, &iters);
    if (status == 1) ++converged;
    fsum += f;
  }
  *out_fsum = fsum;
  return converged;
}

}  // extern "C"
