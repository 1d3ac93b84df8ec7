// Dense Riccati LQR reference solver (C++, host-side).
//
// Native test oracle for the framework's batched Riccati sweep
// (safe_mpc_tpu/ops/qp.py::_riccati_solve) — the equality-constrained core
// that HPIPM factorizes inside the reference's acados stack. Solves
//
//   min  sum_k 1/2 x'Q_k x + q_k'x + 1/2 u'R_k u + r_k'u + x'S_k u
//   s.t. x_{k+1} = A x_k + B u_k + c_k,   x_0 given
//
// by the backward Riccati recursion with cross terms and a forward rollout.
// Plain C99-compatible ABI (extern "C"), loaded via ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libriccati.so riccati.cc

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// Cholesky solve for small SPD systems: solves M x = b in place.
// Returns false if a non-positive pivot appears.
bool chol_solve(int n, const double* M, double* x, const double* b,
                int nrhs) {
  std::vector<double> L(n * n, 0.0);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = M[i * n + j];
      for (int k = 0; k < j; ++k) s -= L[i * n + k] * L[j * n + k];
      if (i == j) {
        if (s <= 0.0) return false;
        L[i * n + i] = std::sqrt(s);
      } else {
        L[i * n + j] = s / L[j * n + j];
      }
    }
  }
  for (int r = 0; r < nrhs; ++r) {
    const double* brhs = b + r * n;
    double* xr = x + r * n;
    std::vector<double> y(n);
    for (int i = 0; i < n; ++i) {
      double s = brhs[i];
      for (int k = 0; k < i; ++k) s -= L[i * n + k] * y[k];
      y[i] = s / L[i * n + i];
    }
    for (int i = n - 1; i >= 0; --i) {
      double s = y[i];
      for (int k = i + 1; k < n; ++k) s -= L[k * n + i] * xr[k];
      xr[i] = s / L[i * n + i];
    }
  }
  return true;
}

inline void matmul(int m, int k, int n, const double* A, const double* B,
                   double* C, bool transA = false) {
  // C (m x n) = op(A) (m x k) * B (k x n); A stored (k x m) when transA
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) {
      double s = 0.0;
      for (int l = 0; l < k; ++l)
        s += (transA ? A[l * m + i] : A[i * k + l]) * B[l * n + j];
      C[i * n + j] = s;
    }
}

}  // namespace

extern "C" int riccati_lqr(
    int N, int nx, int nu,
    const double* A,    // (nx, nx) row-major
    const double* B,    // (nx, nu)
    const double* c,    // (N, nx)
    const double* x0,   // (nx,)
    const double* Q,    // (N+1, nx, nx)
    const double* q,    // (N+1, nx)
    const double* R,    // (N, nu, nu)
    const double* r,    // (N, nu)
    const double* S,    // (N, nx, nu) cross terms
    double* xs,         // out (N+1, nx)
    double* us) {       // out (N, nu)
  const int nxx = nx * nx, nxu = nx * nu, nuu = nu * nu;
  std::vector<double> P(Q + N * nxx, Q + (N + 1) * nxx);
  std::vector<double> p(q + N * nx, q + (N + 1) * nx);
  std::vector<double> Ks(N * nu * nx), ks(N * nu);

  std::vector<double> PA(nxx), PB(nxu), Huu(nuu), Hux(nu * nx), hu(nu);
  std::vector<double> rhs(nu * (nx + 1)), sol(nu * (nx + 1));
  std::vector<double> tmp(nx);

  for (int k = N - 1; k >= 0; --k) {
    matmul(nx, nx, nx, P.data(), A, PA.data());
    matmul(nx, nx, nu, P.data(), B, PB.data());
    // Huu = R_k + B' P B
    matmul(nu, nx, nu, B, PB.data(), Huu.data(), /*transA=*/true);
    for (int i = 0; i < nuu; ++i) Huu[i] += R[k * nuu + i];
    // Hux = S_k' + B' P A
    matmul(nu, nx, nx, B, PA.data(), Hux.data(), /*transA=*/true);
    for (int i = 0; i < nu; ++i)
      for (int j = 0; j < nx; ++j)
        Hux[i * nx + j] += S[k * nxu + j * nu + i];
    // hu = r_k + B' (P c_k + p)
    for (int i = 0; i < nx; ++i) {
      double s = p[i];
      for (int j = 0; j < nx; ++j) s += P[i * nx + j] * c[k * nx + j];
      tmp[i] = s;
    }
    for (int i = 0; i < nu; ++i) {
      double s = r[k * nu + i];
      for (int j = 0; j < nx; ++j) s += B[j * nu + i] * tmp[j];
      hu[i] = s;
    }
    // solve Huu [K | kff] = -[Hux | hu]
    for (int col = 0; col < nx; ++col)
      for (int i = 0; i < nu; ++i) rhs[col * nu + i] = -Hux[i * nx + col];
    for (int i = 0; i < nu; ++i) rhs[nx * nu + i] = -hu[i];
    if (!chol_solve(nu, Huu.data(), sol.data(), rhs.data(), nx + 1))
      return 1;
    double* K = Ks.data() + k * nu * nx;
    double* kff = ks.data() + k * nu;
    for (int col = 0; col < nx; ++col)
      for (int i = 0; i < nu; ++i) K[i * nx + col] = sol[col * nu + i];
    std::memcpy(kff, sol.data() + nx * nu, nu * sizeof(double));
    // P_k = Q_k + A'PA + Hux'K  (symmetrized); p_k = q_k + A'(Pc+p) + Hux'kff
    std::vector<double> Pk(nxx), HK(nxx);
    matmul(nx, nx, nx, A, PA.data(), Pk.data(), /*transA=*/true);
    matmul(nx, nu, nx, Hux.data(), K, HK.data(), /*transA=*/true);
    for (int i = 0; i < nxx; ++i) Pk[i] += Q[k * nxx + i] + HK[i];
    for (int i = 0; i < nx; ++i)
      for (int j = 0; j < i; ++j) {
        double avg = 0.5 * (Pk[i * nx + j] + Pk[j * nx + i]);
        Pk[i * nx + j] = Pk[j * nx + i] = avg;
      }
    std::vector<double> pk(nx);
    for (int i = 0; i < nx; ++i) {
      double s = q[k * nx + i];
      for (int j = 0; j < nx; ++j) s += A[j * nx + i] * tmp[j];
      for (int j = 0; j < nu; ++j) s += Hux[j * nx + i] * kff[j];
      pk[i] = s;
    }
    P.assign(Pk.begin(), Pk.end());
    p.assign(pk.begin(), pk.end());
  }

  // forward rollout
  std::memcpy(xs, x0, nx * sizeof(double));
  for (int k = 0; k < N; ++k) {
    const double* K = Ks.data() + k * nu * nx;
    const double* kff = ks.data() + k * nu;
    const double* xk = xs + k * nx;
    double* uk = us + k * nu;
    for (int i = 0; i < nu; ++i) {
      double s = kff[i];
      for (int j = 0; j < nx; ++j) s += K[i * nx + j] * xk[j];
      uk[i] = s;
    }
    double* xn = xs + (k + 1) * nx;
    for (int i = 0; i < nx; ++i) {
      double s = c[k * nx + i];
      for (int j = 0; j < nx; ++j) s += A[i * nx + j] * xk[j];
      for (int j = 0; j < nu; ++j) s += B[i * nu + j] * uk[j];
      xn[i] = s;
    }
  }
  return 0;
}
