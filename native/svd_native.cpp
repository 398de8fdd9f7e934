// svd_native — host-side native runtime for svdsolver_tpu.
//
// Plays the role the reference's C++ host code plays around its CUDA kernels
// (svd_cpu.h: the CPU mirror used as sub-cutoff fallback and correctness
// oracle): a fast, dependency-free implementation of the full reduction
// ladder on flat row-major arrays, exported through a C ABI for ctypes.
//
// Independent implementation (LAPACK-style reflector conventions, matching
// svdsolver_tpu/ops/householder.py) — used by the Python tests as a
// differential oracle for every device path.
//
// Build: make -C native   (produces libsvd_native.so)

#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// Householder reflector: on exit x holds v (v[0] == 1 implied, stored),
// returns via out-params tau and beta with (I - tau v v^T) x = beta e_0.
// ---------------------------------------------------------------------------
template <typename T>
void make_reflector(T* x, long n, long stride, T* tau, T* beta) {
  if (n < 1) {
    *tau = 0;
    *beta = 0;
    return;
  }
  T alpha = x[0];
  T sigma2 = 0;
  for (long i = 1; i < n; ++i) {
    T v = x[i * stride];
    sigma2 += v * v;
  }
  if (sigma2 == 0) {
    *tau = 0;
    *beta = alpha;
    x[0] = 1;
    return;
  }
  T norm = std::sqrt(alpha * alpha + sigma2);
  T b = (alpha >= 0) ? -norm : norm;
  T denom = alpha - b;
  for (long i = 1; i < n; ++i) x[i * stride] /= denom;
  x[0] = 1;
  *tau = (b - alpha) / b;
  *beta = b;
}

// A[r0+i, j] -= tau * v[i] * (sum_k v[k] A[r0+k, j])  for j in [c0, c1)
template <typename T>
void apply_left(T* A, long lda, const T* v, long k, T tau, long r0, long c0,
                long c1) {
  if (tau == 0) return;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (c1 - c0 > 128)
#endif
  for (long j = c0; j < c1; ++j) {
    T w = 0;
    for (long i = 0; i < k; ++i) w += v[i] * A[(r0 + i) * lda + j];
    w *= tau;
    for (long i = 0; i < k; ++i) A[(r0 + i) * lda + j] -= v[i] * w;
  }
}

// A[i, c0+j] -= tau * (sum_k A[i, c0+k] v[k]) * v[j]  for i in [r0, r1)
template <typename T>
void apply_right(T* A, long lda, const T* v, long k, T tau, long c0, long r0,
                 long r1) {
  if (tau == 0) return;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (r1 - r0 > 128)
#endif
  for (long i = r0; i < r1; ++i) {
    T* row = A + i * lda + c0;
    T w = 0;
    for (long j = 0; j < k; ++j) w += row[j] * v[j];
    w *= tau;
    for (long j = 0; j < k; ++j) row[j] -= w * v[j];
  }
}

// ---------------------------------------------------------------------------
// Golub-Kahan bidiagonalization (parity: svd_serial.h:232 `brd`, but with
// rank-1 updates instead of materialized H matrices).
// ---------------------------------------------------------------------------
template <typename T>
void gk_brd(T* A, long m, long n, T* d, T* e) {
  std::vector<T> v(std::max(m, n));
  for (long j = 0; j < n; ++j) {
    long k = m - j;
    for (long i = 0; i < k; ++i) v[i] = A[(j + i) * n + j];
    T tau, beta;
    make_reflector(v.data(), k, 1, &tau, &beta);
    apply_left(A, n, v.data(), k, tau, j, j, n);
    d[j] = beta;
    A[j * n + j] = beta;
    for (long i = 1; i < k; ++i) A[(j + i) * n + j] = 0;
    if (j < n - 1) {
      long kr = n - j - 1;
      for (long i = 0; i < kr; ++i) v[i] = A[j * n + j + 1 + i];
      make_reflector(v.data(), kr, 1, &tau, &beta);
      apply_right(A, n, v.data(), kr, tau, j + 1, j, m);
      e[j] = beta;
      A[j * n + j + 1] = beta;
      for (long i = 1; i < kr; ++i) A[j * n + j + 1 + i] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Stage I: dense -> band (parity: svd_parallel.h:410 brd_p1 / svd_cuda_2.cu
// :1117 cuda_brd_p1).  Unblocked reflector-at-a-time form — same result as
// the panel/compact-WY form, used as the oracle for the device Stage I.
// ---------------------------------------------------------------------------
template <typename T>
void dense_to_band(T* A, long n, long b) {
  std::vector<T> v(n);
  for (long c = 0; c < n; c += b) {
    long ce = std::min(c + b, n);
    for (long j = c; j < ce; ++j) {  // QR: eliminate below diagonal
      long k = n - j;
      if (k <= 1) continue;
      for (long i = 0; i < k; ++i) v[i] = A[(j + i) * n + j];
      T tau, beta;
      make_reflector(v.data(), k, 1, &tau, &beta);
      apply_left(A, n, v.data(), k, tau, j, j, n);
      A[j * n + j] = beta;
      for (long i = 1; i < k; ++i) A[(j + i) * n + j] = 0;
    }
    for (long i = c; i < ce; ++i) {  // LQ: eliminate right of the band
      long p = i + b;                // pivot column for row i
      if (p >= n - 1) continue;
      long k = n - p;
      for (long t = 0; t < k; ++t) v[t] = A[i * n + p + t];
      T tau, beta;
      make_reflector(v.data(), k, 1, &tau, &beta);
      apply_right(A, n, v.data(), k, tau, p, i, n);
      A[i * n + p] = beta;
      for (long t = 1; t < k; ++t) A[i * n + p + t] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// Stage II: band -> bidiagonal bulge chase (parity: svd_parallel.h:639
// brd_p2 + band_rd_top/right/left), with edge windows clamped by min().
// ---------------------------------------------------------------------------
template <typename T>
void elim_right(T* A, long n, long r0, long c0, long wr, long wc,
                std::vector<T>& v) {
  // Householder on row r0 over cols [c0, c0+wc); applied to rows [r0, r0+wr)
  wr = std::min(wr, n - r0);
  wc = std::min(wc, n - c0);
  if (wc < 1 || wr < 1) return;
  for (long t = 0; t < wc; ++t) v[t] = A[r0 * n + c0 + t];
  T tau, beta;
  make_reflector(v.data(), wc, 1, &tau, &beta);
  apply_right(A, n, v.data(), wc, tau, c0, r0, r0 + wr);
  A[r0 * n + c0] = beta;
  for (long t = 1; t < wc; ++t) A[r0 * n + c0 + t] = 0;
}

template <typename T>
void elim_left(T* A, long n, long r0, long c0, long wr, long wc,
               std::vector<T>& v) {
  // Householder on col c0 over rows [r0, r0+wr); applied to cols [c0, c0+wc)
  wr = std::min(wr, n - r0);
  wc = std::min(wc, n - c0);
  if (wr < 1 || wc < 1) return;
  for (long t = 0; t < wr; ++t) v[t] = A[(r0 + t) * n + c0];
  T tau, beta;
  make_reflector(v.data(), wr, 1, &tau, &beta);
  apply_left(A, n, v.data(), wr, tau, r0, c0, c0 + wc);
  A[r0 * n + c0] = beta;
  for (long t = 1; t < wr; ++t) A[(r0 + t) * n + c0] = 0;
}

template <typename T>
void band_to_bidiag(T* A, long n, long b, T* d, T* e) {
  long w = b + 1;
  long step = w - 1;
  std::vector<T> v(2 * w + 2);
  for (long i = 0; i + 1 < n; ++i) {
    elim_right(A, n, i, i + 1, w, w - 1, v);
    elim_left(A, n, i + 1, i + 1, w - 1, 2 * w - 2, v);
    for (long r = i + 1, c = i + 1 + step; c < n; r += step, c += step) {
      elim_right(A, n, r, c, 2 * w - 2, w - 1, v);
      if (r + step < n) elim_left(A, n, r + step, c, w - 1, 2 * w - 2, v);
    }
  }
  for (long i = 0; i < n; ++i) d[i] = A[i * n + i];
  for (long i = 0; i + 1 < n; ++i) e[i] = A[i * n + i + 1];
}

// ---------------------------------------------------------------------------
// Diagonalization: Demmel-Kahan implicit zero-shift QR with deflation and
// LAPACK-style shifted sweeps (parity: svd_serial.h:314/:368).
// ---------------------------------------------------------------------------
template <typename T>
void givens(T f, T g, T* c, T* s, T* r) {
  if (f == 0) {
    *c = 0;
    *s = 1;
    *r = g;
  } else if (std::abs(f) > std::abs(g)) {
    T t = g / f, tt = std::sqrt(1 + t * t);
    *c = 1 / tt;
    *s = t / tt;
    *r = f * tt;
  } else {
    T t = f / g, tt = std::sqrt(1 + t * t);
    *c = t / tt;
    *s = 1 / tt;
    *r = g * tt;
  }
}

template <typename T>
void zero_shift_sweep(T* d, T* e, long lo, long hi) {
  T c = 1, c_ = 1, s_ = 0, r;
  for (long k = lo; k < hi; ++k) {
    T c1, s1, r1;
    givens(c * d[k], e[k], &c1, &s1, &r1);
    if (k > lo) e[k - 1] = r1 * s_;
    givens(c_ * r1, d[k + 1] * s1, &c_, &s_, &r);
    d[k] = r;
    c = c1;
  }
  T h = c * d[hi];
  e[hi - 1] = h * s_;
  d[hi] = h * c_;
}

template <typename T>
void shifted_sweep(T* d, T* e, long lo, long hi, T shift) {
  T dl = d[lo];
  T sgn = (dl >= 0) ? T(1) : T(-1);
  T f = (std::abs(dl) - shift) * (sgn + shift / (dl == 0 ? T(1) : dl));
  T g = e[lo];
  for (long i = lo; i < hi; ++i) {
    T cr, sr, r;
    givens(f, g, &cr, &sr, &r);
    if (i > lo) e[i - 1] = r;
    f = cr * d[i] + sr * e[i];
    e[i] = cr * e[i] - sr * d[i];
    g = sr * d[i + 1];
    d[i + 1] = cr * d[i + 1];
    T cl, sl;
    givens(f, g, &cl, &sl, &r);
    d[i] = r;
    f = cl * e[i] + sl * d[i + 1];
    d[i + 1] = cl * d[i + 1] - sl * e[i];
    if (i + 1 < hi) {
      g = sl * e[i + 1];
      e[i + 1] = cl * e[i + 1];
    }
  }
  e[hi - 1] = f;
}

template <typename T>
T sigma_min_2x2(T f, T g, T h) {  // smaller singular value of [[f,g],[0,h]]
  T fa = std::abs(f), ga = std::abs(g), ha = std::abs(h);
  T fhmn = std::min(fa, ha), fhmx = std::max(fa, ha);
  if (fhmn == 0) return 0;
  T as = 1 + fhmn / fhmx, at = (fhmx - fhmn) / fhmx;
  if (ga <= fhmx) {
    T au = (ga / fhmx) * (ga / fhmx);
    return fhmn * 2 / (std::sqrt(as * as + au) + std::sqrt(at * at + au));
  }
  T au = fhmx / ga;
  if (au == 0) return fhmn * fhmx / ga;
  return fhmn * 2 * au /
         (std::sqrt(1 + as * au * as * au) + std::sqrt(1 + at * au * at * au));
}

template <typename T>
long qrd(T* d, T* e, long n, long max_sweeps) {
  if (n < 2) {
    if (n == 1) d[0] = std::abs(d[0]);
    return 0;
  }
  T eps = std::numeric_limits<T>::epsilon();
  // Demmel-Kahan lower bound for the threshold
  T lbound = std::abs(d[n - 1]);
  {
    T lam = std::abs(d[n - 1]);
    for (long j = n - 2; j >= 0; --j) {
      lam = std::abs(d[j]) * lam / (lam + std::abs(e[j]));
      lbound = std::min(lbound, lam);
    }
    T mu = std::abs(d[0]);
    lbound = std::min(lbound, mu);
    for (long j = 0; j < n - 1; ++j) {
      mu = std::abs(d[j + 1]) * mu / (mu + std::abs(e[j]));
      lbound = std::min(lbound, mu);
    }
  }
  T thresh = std::max(T(100) * eps * lbound,
                      std::numeric_limits<T>::min());
  if (max_sweeps <= 0) max_sweeps = 30 * n;
  long sweeps = 0;
  for (; sweeps < max_sweeps; ++sweeps) {
    long hi_e = -1;
    for (long i = n - 2; i >= 0; --i) {
      if (std::abs(e[i]) > thresh) {
        hi_e = i;
        break;
      }
      e[i] = 0;
    }
    if (hi_e < 0) break;
    long lo = 0;
    for (long i = hi_e - 1; i >= 0; --i) {
      if (std::abs(e[i]) <= thresh) {
        e[i] = 0;
        lo = i + 1;
        break;
      }
    }
    long hi = hi_e + 1;
    T shift = sigma_min_2x2(d[hi - 1], e[hi - 1], d[hi]);
    T sll = std::abs(d[lo]);
    if (sll == 0 || (shift / sll) * (shift / sll) < eps)
      zero_shift_sweep(d, e, lo, hi);
    else
      shifted_sweep(d, e, lo, hi, shift);
  }
  for (long i = 0; i < n; ++i) d[i] = std::abs(d[i]);
  std::sort(d, d + n, std::greater<T>());
  return sweeps;
}

}  // namespace

extern "C" {

int svdn_gk_brd_f32(float* A, long m, long n, float* d, float* e) {
  gk_brd(A, m, n, d, e);
  return 0;
}
int svdn_gk_brd_f64(double* A, long m, long n, double* d, double* e) {
  gk_brd(A, m, n, d, e);
  return 0;
}

int svdn_dense_to_band_f32(float* A, long n, long b) {
  dense_to_band(A, n, b);
  return 0;
}
int svdn_dense_to_band_f64(double* A, long n, long b) {
  dense_to_band(A, n, b);
  return 0;
}

int svdn_band_to_bidiag_f32(float* A, long n, long b, float* d, float* e) {
  band_to_bidiag(A, n, b, d, e);
  return 0;
}
int svdn_band_to_bidiag_f64(double* A, long n, long b, double* d, double* e) {
  band_to_bidiag(A, n, b, d, e);
  return 0;
}

long svdn_qrd_f32(float* d, float* e, long n, long max_sweeps) {
  return qrd(d, e, n, max_sweeps);
}
long svdn_qrd_f64(double* d, double* e, long n, long max_sweeps) {
  return qrd(d, e, n, max_sweeps);
}

// full pipeline: dense -> band -> bidiagonal -> sorted singular values in d
long svdn_svdvals_f32(float* A, long n, long b, float* sigma) {
  std::vector<float> e(n > 1 ? n - 1 : 1);
  dense_to_band(A, n, b);
  band_to_bidiag(A, n, b, sigma, e.data());
  return qrd(sigma, e.data(), n, long(0));
}
long svdn_svdvals_f64(double* A, long n, long b, double* sigma) {
  std::vector<double> e(n > 1 ? n - 1 : 1);
  dense_to_band(A, n, b);
  band_to_bidiag(A, n, b, sigma, e.data());
  return qrd(sigma, e.data(), n, long(0));
}

}  // extern "C"
