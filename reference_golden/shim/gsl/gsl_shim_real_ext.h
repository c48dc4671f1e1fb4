/* Real-typed extension of the GSL shim (same policy as gsl_shim_core.h:
 * written from the GSL reference manual's documented semantics, no GSL
 * source consulted; everything static inline).  Added for the round-3
 * golden long tail: the feature/sad/localization/tde/convolution/lms/
 * modal-beamformer/tracker TUs use the real (double/float) BLAS, LU/
 * Cholesky/SVD/symmetric-eigen routines and the radix-2 real/half-complex
 * FFTs that the core shim (complex-only) did not provide. */
#ifndef GSL_SHIM_REAL_EXT_H
#define GSL_SHIM_REAL_EXT_H

/* Included from the end of gsl_shim_core.h — all core types available. */

/* ------------------------------------------------------------------ */
/* real radix-2 FFT, GSL half-complex packing                          */
/*   forward: data[0]=Re0, data[k]=Re k (k<=n/2), data[n-k]=Im k       */
/* ------------------------------------------------------------------ */

static inline int gsl_fft_real_radix2_transform(double *data, size_t stride,
                                                size_t n) {
  double *tmp = (double *)malloc(2 * n * sizeof(double));
  for (size_t i = 0; i < n; i++) {
    tmp[2 * i] = data[i * stride];
    tmp[2 * i + 1] = 0.0;
  }
  gsl_shim_fft_radix2_(tmp, 1, n, -1);
  data[0] = tmp[0];
  if (n > 1) data[(n / 2) * stride] = tmp[2 * (n / 2)];
  for (size_t k = 1; k < n / 2; k++) {
    data[k * stride] = tmp[2 * k];
    data[(n - k) * stride] = tmp[2 * k + 1];
  }
  free(tmp);
  return GSL_SUCCESS;
}

static inline int gsl_fft_halfcomplex_radix2_inverse(double *data, size_t stride,
                                                     size_t n) {
  double *tmp = (double *)malloc(2 * n * sizeof(double));
  tmp[0] = data[0];
  tmp[1] = 0.0;
  if (n > 1) {
    tmp[2 * (n / 2)] = data[(n / 2) * stride];
    tmp[2 * (n / 2) + 1] = 0.0;
  }
  for (size_t k = 1; k < n / 2; k++) {
    tmp[2 * k] = data[k * stride];
    tmp[2 * k + 1] = data[(n - k) * stride];
    tmp[2 * (n - k)] = data[k * stride];
    tmp[2 * (n - k) + 1] = -data[(n - k) * stride];
  }
  gsl_shim_fft_radix2_(tmp, 1, n, +1);
  for (size_t i = 0; i < n; i++) data[i * stride] = tmp[2 * i] / (double)n;
  free(tmp);
  return GSL_SUCCESS;
}

static inline int gsl_fft_halfcomplex_radix2_backward(double *data,
                                                      size_t stride, size_t n) {
  gsl_fft_halfcomplex_radix2_inverse(data, stride, n);
  for (size_t i = 0; i < n; i++) data[i * stride] *= (double)n;
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* real matrix helpers                                                 */
/* ------------------------------------------------------------------ */

static inline gsl_matrix_view gsl_matrix_submatrix(gsl_matrix *m, size_t k1,
                                                   size_t k2, size_t n1,
                                                   size_t n2) {
  gsl_matrix_view v;
  v.matrix.size1 = n1;
  v.matrix.size2 = n2;
  v.matrix.tda = m->tda;
  v.matrix.data = m->data + k1 * m->tda + k2;
  v.matrix.block = NULL;
  v.matrix.owner = 0;
  return v;
}

static inline int gsl_matrix_scale(gsl_matrix *a, double x) {
  for (size_t i = 0; i < a->size1; i++)
    for (size_t j = 0; j < a->size2; j++) a->data[i * a->tda + j] *= x;
  return GSL_SUCCESS;
}

static inline int gsl_matrix_add(gsl_matrix *a, const gsl_matrix *b) {
  for (size_t i = 0; i < a->size1; i++)
    for (size_t j = 0; j < a->size2; j++)
      a->data[i * a->tda + j] += b->data[i * b->tda + j];
  return GSL_SUCCESS;
}

static inline int gsl_matrix_sub(gsl_matrix *a, const gsl_matrix *b) {
  for (size_t i = 0; i < a->size1; i++)
    for (size_t j = 0; j < a->size2; j++)
      a->data[i * a->tda + j] -= b->data[i * b->tda + j];
  return GSL_SUCCESS;
}

static inline int gsl_matrix_transpose_memcpy(gsl_matrix *dst,
                                              const gsl_matrix *src) {
  for (size_t i = 0; i < src->size1; i++)
    for (size_t j = 0; j < src->size2; j++)
      dst->data[j * dst->tda + i] = src->data[i * src->tda + j];
  return GSL_SUCCESS;
}

static inline int gsl_matrix_set_identity(gsl_matrix *m) {
  for (size_t i = 0; i < m->size1; i++)
    for (size_t j = 0; j < m->size2; j++)
      m->data[i * m->tda + j] = (i == j) ? 1.0 : 0.0;
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* real/float BLAS subset                                              */
/* ------------------------------------------------------------------ */

static inline int gsl_blas_dgemv(CBLAS_TRANSPOSE_t trans, double alpha,
                                 const gsl_matrix *A, const gsl_vector *x,
                                 double beta, gsl_vector *y) {
  size_t M = (trans == CblasNoTrans) ? A->size1 : A->size2;
  size_t N = (trans == CblasNoTrans) ? A->size2 : A->size1;
  for (size_t i = 0; i < M; i++) {
    double acc = 0.0;
    for (size_t j = 0; j < N; j++) {
      double a = (trans == CblasNoTrans) ? A->data[i * A->tda + j]
                                         : A->data[j * A->tda + i];
      acc += a * x->data[j * x->stride];
    }
    y->data[i * y->stride] = alpha * acc + beta * y->data[i * y->stride];
  }
  return GSL_SUCCESS;
}

static inline int gsl_blas_sgemv(CBLAS_TRANSPOSE_t trans, float alpha,
                                 const gsl_matrix_float *A,
                                 const gsl_vector_float *x, float beta,
                                 gsl_vector_float *y) {
  size_t M = (trans == CblasNoTrans) ? A->size1 : A->size2;
  size_t N = (trans == CblasNoTrans) ? A->size2 : A->size1;
  for (size_t i = 0; i < M; i++) {
    float acc = 0.0f;
    for (size_t j = 0; j < N; j++) {
      float a = (trans == CblasNoTrans) ? A->data[i * A->tda + j]
                                        : A->data[j * A->tda + i];
      acc += a * x->data[j * x->stride];
    }
    y->data[i * y->stride] = alpha * acc + beta * y->data[i * y->stride];
  }
  return GSL_SUCCESS;
}

static inline int gsl_blas_dgemm(CBLAS_TRANSPOSE_t ta, CBLAS_TRANSPOSE_t tb,
                                 double alpha, const gsl_matrix *A,
                                 const gsl_matrix *B, double beta,
                                 gsl_matrix *C) {
  size_t M = (ta == CblasNoTrans) ? A->size1 : A->size2;
  size_t K = (ta == CblasNoTrans) ? A->size2 : A->size1;
  size_t N = (tb == CblasNoTrans) ? B->size2 : B->size1;
  for (size_t i = 0; i < M; i++)
    for (size_t j = 0; j < N; j++) {
      double acc = 0.0;
      for (size_t k = 0; k < K; k++) {
        double a = (ta == CblasNoTrans) ? A->data[i * A->tda + k]
                                        : A->data[k * A->tda + i];
        double b = (tb == CblasNoTrans) ? B->data[k * B->tda + j]
                                        : B->data[j * B->tda + k];
        acc += a * b;
      }
      C->data[i * C->tda + j] = alpha * acc + beta * C->data[i * C->tda + j];
    }
  return GSL_SUCCESS;
}

static inline int gsl_blas_dtrsv(CBLAS_UPLO_t uplo, CBLAS_TRANSPOSE_t trans,
                                 enum CBLAS_DIAG diag, const gsl_matrix *A,
                                 gsl_vector *x) {
  size_t n = A->size1;
  /* effective matrix = op(T) where T is the uplo triangle of A */
  int lower = (uplo == CblasLower);
  int tr = (trans != CblasNoTrans);
  int efflower = tr ? !lower : lower; /* transposing flips the triangle */
  if (efflower) {
    for (size_t i = 0; i < n; i++) {
      double acc = x->data[i * x->stride];
      for (size_t j = 0; j < i; j++) {
        double a = tr ? A->data[j * A->tda + i] : A->data[i * A->tda + j];
        acc -= a * x->data[j * x->stride];
      }
      if (diag == CblasNonUnit) {
        double d = A->data[i * A->tda + i];
        acc /= d;
      }
      x->data[i * x->stride] = acc;
    }
  } else {
    for (size_t ii = n; ii-- > 0;) {
      double acc = x->data[ii * x->stride];
      for (size_t j = ii + 1; j < n; j++) {
        double a = tr ? A->data[j * A->tda + ii] : A->data[ii * A->tda + j];
        acc -= a * x->data[j * x->stride];
      }
      if (diag == CblasNonUnit) acc /= A->data[ii * A->tda + ii];
      x->data[ii * x->stride] = acc;
    }
  }
  return GSL_SUCCESS;
}

static inline int gsl_blas_dsyr(CBLAS_UPLO_t uplo, double alpha,
                                const gsl_vector *x, gsl_matrix *A) {
  size_t n = A->size1;
  for (size_t i = 0; i < n; i++)
    for (size_t j = 0; j < n; j++) {
      int in_tri = (uplo == CblasLower) ? (j <= i) : (j >= i);
      if (in_tri)
        A->data[i * A->tda + j] +=
            alpha * x->data[i * x->stride] * x->data[j * x->stride];
    }
  return GSL_SUCCESS;
}

/* complex triangular solve: op(T) x = b with T the uplo triangle.
 * CblasTrans is the PLAIN transpose (no conjugation), per BLAS. */
static inline int gsl_blas_ztrsv(CBLAS_UPLO_t uplo, CBLAS_TRANSPOSE_t trans,
                                 enum CBLAS_DIAG diag,
                                 const gsl_matrix_complex *A,
                                 gsl_vector_complex *x) {
  size_t n = A->size1;
  int lower = (uplo == CblasLower);
  int tr = (trans != CblasNoTrans);
  int conj = (trans == CblasConjTrans);
  int efflower = tr ? !lower : lower;

#define ZTRSV_A(i, j)                                                        \
  (tr ? (conj ? gsl_complex_conjugate(gsl_matrix_complex_get(A, (j), (i)))   \
              : gsl_matrix_complex_get(A, (j), (i)))                         \
      : gsl_matrix_complex_get(A, (i), (j)))

  if (efflower) {
    for (size_t i = 0; i < n; i++) {
      gsl_complex acc = gsl_vector_complex_get(x, i);
      for (size_t j = 0; j < i; j++)
        acc = gsl_complex_sub(acc, gsl_complex_mul(ZTRSV_A(i, j),
                                                   gsl_vector_complex_get(x, j)));
      if (diag == CblasNonUnit) acc = gsl_complex_div(acc, ZTRSV_A(i, i));
      gsl_vector_complex_set(x, i, acc);
    }
  } else {
    for (size_t ii = n; ii-- > 0;) {
      gsl_complex acc = gsl_vector_complex_get(x, ii);
      for (size_t j = ii + 1; j < n; j++)
        acc = gsl_complex_sub(acc, gsl_complex_mul(ZTRSV_A(ii, j),
                                                   gsl_vector_complex_get(x, j)));
      if (diag == CblasNonUnit) acc = gsl_complex_div(acc, ZTRSV_A(ii, ii));
      gsl_vector_complex_set(x, ii, acc);
    }
  }
#undef ZTRSV_A
  return GSL_SUCCESS;
}

/* Hermitian rank-k update: C = alpha op(A) op(A)^H + beta C (uplo triangle;
 * both triangles are written hermitian-consistently for robustness). */
static inline int gsl_blas_zherk(CBLAS_UPLO_t uplo, CBLAS_TRANSPOSE_t trans,
                                 double alpha, const gsl_matrix_complex *A,
                                 double beta, gsl_matrix_complex *C) {
  (void)uplo;
  size_t N = (trans == CblasNoTrans) ? A->size1 : A->size2;
  size_t K = (trans == CblasNoTrans) ? A->size2 : A->size1;
  for (size_t i = 0; i < N; i++)
    for (size_t j = 0; j < N; j++) {
      gsl_complex acc = gsl_complex_rect(0.0, 0.0);
      for (size_t k = 0; k < K; k++) {
        gsl_complex a = (trans == CblasNoTrans)
                            ? gsl_matrix_complex_get(A, i, k)
                            : gsl_complex_conjugate(gsl_matrix_complex_get(A, k, i));
        gsl_complex b = (trans == CblasNoTrans)
                            ? gsl_complex_conjugate(gsl_matrix_complex_get(A, j, k))
                            : gsl_matrix_complex_get(A, k, j);
        acc = gsl_complex_add(acc, gsl_complex_mul(a, b));
      }
      gsl_complex c0 = gsl_matrix_complex_get(C, i, j);
      gsl_matrix_complex_set(
          C, i, j,
          gsl_complex_add(gsl_complex_mul_real(acc, alpha),
                          gsl_complex_mul_real(c0, beta)));
    }
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* real LU / Cholesky / SVD / symmetric eigen                          */
/* ------------------------------------------------------------------ */

static inline int gsl_linalg_LU_decomp(gsl_matrix *A, gsl_permutation *p,
                                       int *signum) {
  size_t n = A->size1;
  *signum = 1;
  for (size_t i = 0; i < n; i++) p->data[i] = i;
  for (size_t k = 0; k < n; k++) {
    /* partial pivot */
    size_t piv = k;
    double mx = fabs(A->data[k * A->tda + k]);
    for (size_t i = k + 1; i < n; i++) {
      double v = fabs(A->data[i * A->tda + k]);
      if (v > mx) { mx = v; piv = i; }
    }
    if (piv != k) {
      for (size_t j = 0; j < n; j++) {
        double t = A->data[k * A->tda + j];
        A->data[k * A->tda + j] = A->data[piv * A->tda + j];
        A->data[piv * A->tda + j] = t;
      }
      size_t t = p->data[k];
      p->data[k] = p->data[piv];
      p->data[piv] = t;
      *signum = -*signum;
    }
    double d = A->data[k * A->tda + k];
    if (d == 0.0) continue; /* singular: leave zero pivot (det -> 0) */
    for (size_t i = k + 1; i < n; i++) {
      double l = A->data[i * A->tda + k] / d;
      A->data[i * A->tda + k] = l;
      for (size_t j = k + 1; j < n; j++)
        A->data[i * A->tda + j] -= l * A->data[k * A->tda + j];
    }
  }
  return GSL_SUCCESS;
}

static inline double gsl_linalg_LU_det(gsl_matrix *LU, int signum) {
  double det = (double)signum;
  for (size_t i = 0; i < LU->size1; i++) det *= LU->data[i * LU->tda + i];
  return det;
}

static inline double gsl_linalg_LU_lndet(gsl_matrix *LU) {
  double s = 0.0;
  for (size_t i = 0; i < LU->size1; i++)
    s += log(fabs(LU->data[i * LU->tda + i]));
  return s;
}

/* Real Cholesky: stores L in the lower triangle and L^T in the upper
 * (GSL's classic behaviour, relied on by callers using either triangle). */
static inline int gsl_linalg_cholesky_decomp(gsl_matrix *A) {
  size_t n = A->size1;
  for (size_t j = 0; j < n; j++) {
    double d = A->data[j * A->tda + j];
    for (size_t k = 0; k < j; k++) {
      double l = A->data[j * A->tda + k];
      d -= l * l;
    }
    if (d <= 0.0) return GSL_EDOM;
    d = sqrt(d);
    A->data[j * A->tda + j] = d;
    for (size_t i = j + 1; i < n; i++) {
      double s = A->data[i * A->tda + j];
      for (size_t k = 0; k < j; k++)
        s -= A->data[i * A->tda + k] * A->data[j * A->tda + k];
      A->data[i * A->tda + j] = s / d;
    }
  }
  for (size_t i = 0; i < n; i++)
    for (size_t j = i + 1; j < n; j++)
      A->data[i * A->tda + j] = A->data[j * A->tda + i];
  return GSL_SUCCESS;
}

/* One-sided Jacobi SVD: A [M x N, M >= N] replaced by U; V [N x N];
 * S descending (GSL contract for gsl_linalg_SV_decomp). */
static inline int gsl_linalg_SV_decomp(gsl_matrix *A, gsl_matrix *V,
                                       gsl_vector *S, gsl_vector *work) {
  (void)work;
  size_t M = A->size1, N = A->size2;
  gsl_matrix_set_identity(V);
  for (int sweep = 0; sweep < 60; sweep++) {
    double off = 0.0;
    for (size_t p = 0; p + 1 < N; p++)
      for (size_t q = p + 1; q < N; q++) {
        double app = 0, aqq = 0, apq = 0;
        for (size_t i = 0; i < M; i++) {
          double ap = A->data[i * A->tda + p], aq = A->data[i * A->tda + q];
          app += ap * ap;
          aqq += aq * aq;
          apq += ap * aq;
        }
        off += apq * apq;
        if (fabs(apq) <= 1e-15 * sqrt(app * aqq)) continue;
        double tau = (aqq - app) / (2.0 * apq);
        double t = (tau >= 0 ? 1.0 : -1.0) / (fabs(tau) + sqrt(1.0 + tau * tau));
        double cs = 1.0 / sqrt(1.0 + t * t), sn = cs * t;
        for (size_t i = 0; i < M; i++) {
          double ap = A->data[i * A->tda + p], aq = A->data[i * A->tda + q];
          A->data[i * A->tda + p] = cs * ap - sn * aq;
          A->data[i * A->tda + q] = sn * ap + cs * aq;
        }
        for (size_t i = 0; i < N; i++) {
          double vp = V->data[i * V->tda + p], vq = V->data[i * V->tda + q];
          V->data[i * V->tda + p] = cs * vp - sn * vq;
          V->data[i * V->tda + q] = sn * vp + cs * vq;
        }
      }
    if (off < 1e-30) break;
  }
  /* column norms -> singular values; normalize U columns */
  for (size_t j = 0; j < N; j++) {
    double s = 0;
    for (size_t i = 0; i < M; i++) {
      double a = A->data[i * A->tda + j];
      s += a * a;
    }
    s = sqrt(s);
    S->data[j * S->stride] = s;
    if (s > 0)
      for (size_t i = 0; i < M; i++) A->data[i * A->tda + j] /= s;
  }
  /* descending order (selection sort, swapping U and V columns) */
  for (size_t j = 0; j + 1 < N; j++) {
    size_t mx = j;
    for (size_t k = j + 1; k < N; k++)
      if (S->data[k * S->stride] > S->data[mx * S->stride]) mx = k;
    if (mx != j) {
      double t = S->data[j * S->stride];
      S->data[j * S->stride] = S->data[mx * S->stride];
      S->data[mx * S->stride] = t;
      for (size_t i = 0; i < M; i++) {
        double u = A->data[i * A->tda + j];
        A->data[i * A->tda + j] = A->data[i * A->tda + mx];
        A->data[i * A->tda + mx] = u;
      }
      for (size_t i = 0; i < N; i++) {
        double v = V->data[i * V->tda + j];
        V->data[i * V->tda + j] = V->data[i * V->tda + mx];
        V->data[i * V->tda + mx] = v;
      }
    }
  }
  return GSL_SUCCESS;
}

/* real symmetric Jacobi eigensolver (values + optional vectors).
 * GSL's symmetric eigensolvers read only the LOWER triangle (callers like
 * gsl_blas_dsyr(CblasLower) leave the upper half unset) — symmetrize from
 * the lower triangle first. */
static inline int gsl_shim_jacobi_symm_(gsl_matrix *A, gsl_vector *eval,
                                        gsl_matrix *evec) {
  size_t n = A->size1;
  for (size_t i = 0; i < n; i++)
    for (size_t j = i + 1; j < n; j++)
      A->data[i * A->tda + j] = A->data[j * A->tda + i];
  if (evec) gsl_matrix_set_identity(evec);
  for (int sweep = 0; sweep < 100; sweep++) {
    double off = 0.0;
    for (size_t p = 0; p + 1 < n; p++)
      for (size_t q = p + 1; q < n; q++) off += fabs(A->data[p * A->tda + q]);
    if (off < 1e-300) break;
    for (size_t p = 0; p + 1 < n; p++)
      for (size_t q = p + 1; q < n; q++) {
        double apq = A->data[p * A->tda + q];
        if (fabs(apq) < 1e-18 * (fabs(A->data[p * A->tda + p]) +
                                 fabs(A->data[q * A->tda + q]) + 1e-300))
          continue;
        double theta = (A->data[q * A->tda + q] - A->data[p * A->tda + p]) /
                       (2.0 * apq);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (fabs(theta) + sqrt(1.0 + theta * theta));
        double cs = 1.0 / sqrt(1.0 + t * t), sn = cs * t;
        for (size_t i = 0; i < n; i++) {
          double aip = A->data[i * A->tda + p], aiq = A->data[i * A->tda + q];
          A->data[i * A->tda + p] = cs * aip - sn * aiq;
          A->data[i * A->tda + q] = sn * aip + cs * aiq;
        }
        for (size_t j = 0; j < n; j++) {
          double apj = A->data[p * A->tda + j], aqj = A->data[q * A->tda + j];
          A->data[p * A->tda + j] = cs * apj - sn * aqj;
          A->data[q * A->tda + j] = sn * apj + cs * aqj;
        }
        if (evec)
          for (size_t i = 0; i < n; i++) {
            double vip = evec->data[i * evec->tda + p];
            double viq = evec->data[i * evec->tda + q];
            evec->data[i * evec->tda + p] = cs * vip - sn * viq;
            evec->data[i * evec->tda + q] = sn * vip + cs * viq;
          }
      }
  }
  for (size_t i = 0; i < n; i++) eval->data[i * eval->stride] = A->data[i * A->tda + i];
  return GSL_SUCCESS;
}

typedef struct { size_t size; } gsl_eigen_symm_workspace;

static inline gsl_eigen_symm_workspace *gsl_eigen_symm_alloc(size_t n) {
  gsl_eigen_symm_workspace *w =
      (gsl_eigen_symm_workspace *)malloc(sizeof(gsl_eigen_symm_workspace));
  w->size = n;
  return w;
}
static inline void gsl_eigen_symm_free(gsl_eigen_symm_workspace *w) { free(w); }

static inline int gsl_eigen_symm(gsl_matrix *A, gsl_vector *eval,
                                 gsl_eigen_symm_workspace *w) {
  (void)w;
  return gsl_shim_jacobi_symm_(A, eval, NULL);
}

static inline int gsl_eigen_symmv(gsl_matrix *A, gsl_vector *eval,
                                  gsl_matrix *evec,
                                  gsl_eigen_symmv_workspace *w) {
  (void)w;
  return gsl_shim_jacobi_symm_(A, eval, evec);
}

typedef enum {
  GSL_EIGEN_SORT_VAL_ASC,
  GSL_EIGEN_SORT_VAL_DESC,
  GSL_EIGEN_SORT_ABS_ASC,
  GSL_EIGEN_SORT_ABS_DESC
} gsl_eigen_sort_t;

static inline int gsl_eigen_symmv_sort(gsl_vector *eval, gsl_matrix *evec,
                                       gsl_eigen_sort_t sort_type) {
  size_t n = eval->size;
  for (size_t j = 0; j + 1 < n; j++) {
    size_t best = j;
    for (size_t k = j + 1; k < n; k++) {
      double a = eval->data[k * eval->stride], b = eval->data[best * eval->stride];
      int better;
      switch (sort_type) {
        case GSL_EIGEN_SORT_VAL_ASC: better = a < b; break;
        case GSL_EIGEN_SORT_VAL_DESC: better = a > b; break;
        case GSL_EIGEN_SORT_ABS_ASC: better = fabs(a) < fabs(b); break;
        default: better = fabs(a) > fabs(b); break;
      }
      if (better) best = k;
    }
    if (best != j) {
      double t = eval->data[j * eval->stride];
      eval->data[j * eval->stride] = eval->data[best * eval->stride];
      eval->data[best * eval->stride] = t;
      for (size_t i = 0; i < evec->size1; i++) {
        double v = evec->data[i * evec->tda + j];
        evec->data[i * evec->tda + j] = evec->data[i * evec->tda + best];
        evec->data[i * evec->tda + best] = v;
      }
    }
  }
  return GSL_SUCCESS;
}

#endif /* GSL_SHIM_REAL_EXT_H */
