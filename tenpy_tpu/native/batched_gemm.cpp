// Batched small-GEMM executor for the host path of tenpy_tpu.
//
// The charge-block tensordot of np_conserved decomposes into thousands of
// small independent GEMMs with accumulation into shared output blocks
// (tenpy_tpu analogue of the reference's _npc_helper.pyx tensordot core).
// Looping them in Python costs ~1.3us per task in interpreter overhead; this
// translation unit does the same loop in C++, calling the *same* BLAS the
// Python process already uses (function pointers handed over from
// scipy.linalg.cython_blas), so there is nothing extra to link.
//
// All matrices are C-contiguous row-major; BLAS is Fortran column-major, so
// C = A @ B is computed as C^T = B^T A^T via dgemm('N','N', n, m, k, ...).

#include <cstdint>

extern "C" {

typedef void (*dgemm_t)(const char* transa, const char* transb,
                        const int* m, const int* n, const int* k,
                        const double* alpha, const double* a, const int* lda,
                        const double* b, const int* ldb, const double* beta,
                        double* c, const int* ldc);
// Both dgemm and zgemm match this shape: alpha/beta point to 1 (real) or
// 2 (complex) doubles; passing two doubles is safe for both.

// zgemm has the same signature with double interpreted as complex pairs.

// tasks: n_tasks entries; for task t:
//   a_ptrs[t] (m x k), b_ptrs[t] (k x n) row-major inputs,
//   c_ptrs[t] (m x n) row-major output buffer,
//   dims[3*t + 0..2] = m, k, n
//   betas[t] = 0.0 for the first write into c, 1.0 for accumulation
void batched_gemm(void* gemm_fn,
                  const double** a_ptrs, const double** b_ptrs,
                  double** c_ptrs,
                  const int32_t* dims, const double* betas,
                  int64_t n_tasks, int32_t is_complex) {
    dgemm_t gemm = reinterpret_cast<dgemm_t>(gemm_fn);
    // zgemm reads alpha/beta as complex*16: pass two doubles (re, im)
    const double one[2] = {1.0, 0.0};
    double beta[2] = {0.0, 0.0};
    for (int64_t t = 0; t < n_tasks; ++t) {
        const int m = dims[3 * t];
        const int k = dims[3 * t + 1];
        const int n = dims[3 * t + 2];
        beta[0] = betas[t];
        // row-major C = A B  <=>  col-major C' = B' A'
        gemm("N", "N", &n, &m, &k, one,
             b_ptrs[t], &n, a_ptrs[t], &k,
             beta, c_ptrs[t], &n);
    }
    (void)is_complex;
}

}  // extern "C"
