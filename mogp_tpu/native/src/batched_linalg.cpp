// Host-side batched dense linear algebra for mogp_tpu.
//
// Native counterpart of the role played by the reference's C++/CUDA
// linalg layer (mogp_gpu/src/densegp_gpu.hpp: cuSOLVER potrf + cuBLAS
// solves): a small OpenMP-parallel library for the *host* paths of the
// framework -- independent numerical oracles for the device kernels,
// fast batched factorizations when preparing data on CPU, and the
// MaxiMin design scorer.  Exposed to Python via ctypes (no pybind11
// dependency); all matrices are row-major, double precision.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC \
//            batched_linalg.cpp -o libmogp_native.so

#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// In-place lower Cholesky of B row-major n*n SPD matrices.
// Returns through `info`: info[b] = 0 on success, j+1 if the leading
// minor of order j+1 is not positive definite (LAPACK dpotrf contract).
// The strict upper triangle is zeroed on success.
void potrf_batched(double* A, int64_t B, int64_t n, int32_t* info) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t b = 0; b < B; ++b) {
        double* M = A + b * n * n;
        int32_t st = 0;
        for (int64_t j = 0; j < n && st == 0; ++j) {
            double d = M[j * n + j];
            for (int64_t k = 0; k < j; ++k) d -= M[j * n + k] * M[j * n + k];
            if (d <= 0.0 || !std::isfinite(d)) {
                st = (int32_t)(j + 1);
                break;
            }
            d = std::sqrt(d);
            M[j * n + j] = d;
            const double inv_d = 1.0 / d;
            for (int64_t i = j + 1; i < n; ++i) {
                double s = M[i * n + j];
                const double* Li = M + i * n;
                const double* Lj = M + j * n;
                for (int64_t k = 0; k < j; ++k) s -= Li[k] * Lj[k];
                M[i * n + j] = s * inv_d;
            }
        }
        if (st == 0) {
            for (int64_t i = 0; i < n; ++i)
                for (int64_t j2 = i + 1; j2 < n; ++j2) M[i * n + j2] = 0.0;
        }
        info[b] = st;
    }
}

// Solve L x = b (forward) and L^T x = b (backward) for B batched
// lower-triangular systems with m right-hand sides (row-major (n, m)).
void trsm_batched(const double* L, double* X, int64_t B, int64_t n,
                  int64_t m, int32_t transpose) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t b = 0; b < B; ++b) {
        const double* Lb = L + b * n * n;
        double* Xb = X + b * n * m;
        if (!transpose) {
            for (int64_t i = 0; i < n; ++i) {
                for (int64_t k = 0; k < i; ++k) {
                    const double lik = Lb[i * n + k];
                    for (int64_t c = 0; c < m; ++c)
                        Xb[i * m + c] -= lik * Xb[k * m + c];
                }
                const double inv = 1.0 / Lb[i * n + i];
                for (int64_t c = 0; c < m; ++c) Xb[i * m + c] *= inv;
            }
        } else {
            for (int64_t i = n - 1; i >= 0; --i) {
                for (int64_t k = i + 1; k < n; ++k) {
                    const double lki = Lb[k * n + i];
                    for (int64_t c = 0; c < m; ++c)
                        Xb[i * m + c] -= lki * Xb[k * m + c];
                }
                const double inv = 1.0 / Lb[i * n + i];
                for (int64_t c = 0; c < m; ++c) Xb[i * m + c] *= inv;
            }
        }
    }
}

// Minimum pairwise squared Euclidean distance for each of T candidate
// designs of shape (n, d) (the MaxiMin LHC scoring loop,
// ExperimentalDesign.py:663-668 in the reference).
void maximin_score(const double* designs, int64_t T, int64_t n, int64_t d,
                   double* out_min_sqdist) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t t = 0; t < T; ++t) {
        const double* D = designs + t * n * d;
        double best = std::numeric_limits<double>::infinity();
        for (int64_t i = 0; i < n; ++i) {
            for (int64_t j = i + 1; j < n; ++j) {
                double s = 0.0;
                for (int64_t k = 0; k < d; ++k) {
                    const double diff = D[i * d + k] - D[j * d + k];
                    s += diff * diff;
                }
                if (s < best) best = s;
            }
        }
        out_min_sqdist[t] = best;
    }
}

}  // extern "C"
