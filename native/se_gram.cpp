// Native CPU kernels for the NumPy oracle baseline.
//
// The reference's only native component is kernels.pyx — Cython GP
// covariance/Gram routines (BASELINE.json:5; SURVEY.md §2.1 "SE-kernel Gram
// builder").  The TPU build's compute path uses Pallas/XLA instead
// (auxpm_tpu/ops); THIS file is the CPU-side counterpart so the oracle
// baseline (BASELINE Target 1's denominator) runs with native-kernel speed,
// like the reference's Cython path did.
//
// Exposed via ctypes (tests/oracle/native_kernels.py).  Build:
//   bash native/build.sh
//
// Semantics match auxpm_tpu.models.gp_classification exactly:
//   K = exp(2*log_sigma) * (exp(-0.5 * sqdist / exp(2*log_ell)) + jitter*I)

#include <cmath>
#include <cstddef>

extern "C" {

// Isotropic SE Gram from precomputed squared distances.
// sqdist: (n*n) row-major; out: (n*n) row-major.
void se_gram_iso(const double* sqdist, double* out, long n, double log_ell,
                 double log_sigma, double jitter) {
  const double s2 = std::exp(2.0 * log_sigma);
  const double inv2ell2 = 0.5 * std::exp(-2.0 * log_ell);
  for (long i = 0; i < n; ++i) {
    const double* row = sqdist + i * n;
    double* orow = out + i * n;
    for (long j = 0; j < n; ++j) {
      orow[j] = s2 * std::exp(-row[j] * inv2ell2);
    }
    orow[i] += s2 * jitter;
  }
}

// ARD SE Gram from raw features.  x: (n*d) row-major.
void se_gram_ard(const double* x, double* out, long n, long d,
                 const double* log_ells, double log_sigma, double jitter) {
  const double s2 = std::exp(2.0 * log_sigma);
  // scale factors 1/(ell_k)
  double inv_ell[64];
  for (long k = 0; k < d && k < 64; ++k) inv_ell[k] = std::exp(-log_ells[k]);
  for (long i = 0; i < n; ++i) {
    for (long j = 0; j <= i; ++j) {
      double acc = 0.0;
      for (long k = 0; k < d; ++k) {
        const double t = (x[i * d + k] - x[j * d + k]) * inv_ell[k];
        acc += t * t;
      }
      const double v = s2 * std::exp(-0.5 * acc);
      out[i * n + j] = v;
      out[j * n + i] = v;
    }
    out[i * n + i] += s2 * jitter;
  }
}

// In-place unblocked Cholesky (lower), row-major — the oracle's LAPACK-free
// fallback; NumPy's LAPACK is used by default, this exists for parity
// testing of the native path.
int chol_inplace(double* a, long n) {
  for (long j = 0; j < n; ++j) {
    double d = a[j * n + j];
    for (long k = 0; k < j; ++k) d -= a[j * n + k] * a[j * n + k];
    if (d <= 0.0) return 1;
    d = std::sqrt(d);
    a[j * n + j] = d;
    const double inv = 1.0 / d;
    for (long i = j + 1; i < n; ++i) {
      double s = a[i * n + j];
      for (long k = 0; k < j; ++k) s -= a[i * n + k] * a[j * n + k];
      a[i * n + j] = s * inv;
    }
    for (long i = 0; i < j; ++i) a[i * n + j] = 0.0;
  }
  return 0;
}

}  // extern "C"
