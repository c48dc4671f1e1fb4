/* Minimal GSL-compatible shim — just enough of the documented GNU Scientific
 * Library API to compile and run the reference BTK 2.0 sources
 * (/root/reference/btk20_src) in this image, where GSL itself is not
 * installed.  Written from the GSL reference manual's documented semantics;
 * no GSL source was consulted or copied.  Everything is static inline so a
 * single header serves all translation units with no extra link step.
 *
 * Implemented subset (exactly what the compiled reference TUs use):
 *   - gsl_block / typed vectors (char, short, float, double, complex) with
 *     stride support, views, calloc/alloc/free/get/set/memcpy/add/sub/scale
 *   - gsl_matrix (double, float, complex) incl. row/col/submatrix views
 *   - gsl_complex arithmetic (rect/polar/add/sub/mul/div/conj/abs/...)
 *   - complex BLAS: zgemv zgemm zdotc zdotu zaxpy zdscal zscal zgeru dznrm2
 *   - radix-2 complex FFT (forward / backward / inverse), GSL conventions
 *   - complex Cholesky decomp/solve, Hermitian eigensolver (Jacobi)
 *   - gsl_sf_sinc
 */
#ifndef GSL_SHIM_CORE_H
#define GSL_SHIM_CORE_H

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#define GSL_SUCCESS 0
#define GSL_FAILURE (-1)
#define GSL_EDOM 1
#define GSL_EINVAL 4

/* ------------------------------------------------------------------ */
/* complex scalars                                                     */
/* ------------------------------------------------------------------ */

typedef struct { double dat[2]; } gsl_complex;
typedef struct { float dat[2]; } gsl_complex_float;

#define GSL_REAL(z) ((z).dat[0])
#define GSL_IMAG(z) ((z).dat[1])
#define GSL_SET_COMPLEX(zp, x, y) \
  do { (zp)->dat[0] = (x); (zp)->dat[1] = (y); } while (0)
#define GSL_COMPLEX_ONE (gsl_complex_rect(1.0, 0.0))
#define GSL_COMPLEX_ZERO (gsl_complex_rect(0.0, 0.0))
#define GSL_COMPLEX_NEGONE (gsl_complex_rect(-1.0, 0.0))

static inline gsl_complex gsl_complex_rect(double x, double y) {
  gsl_complex z; z.dat[0] = x; z.dat[1] = y; return z;
}
static inline gsl_complex gsl_complex_polar(double r, double theta) {
  return gsl_complex_rect(r * cos(theta), r * sin(theta));
}
static inline gsl_complex gsl_complex_add(gsl_complex a, gsl_complex b) {
  return gsl_complex_rect(a.dat[0] + b.dat[0], a.dat[1] + b.dat[1]);
}
static inline gsl_complex gsl_complex_sub(gsl_complex a, gsl_complex b) {
  return gsl_complex_rect(a.dat[0] - b.dat[0], a.dat[1] - b.dat[1]);
}
static inline gsl_complex gsl_complex_mul(gsl_complex a, gsl_complex b) {
  return gsl_complex_rect(a.dat[0] * b.dat[0] - a.dat[1] * b.dat[1],
                          a.dat[0] * b.dat[1] + a.dat[1] * b.dat[0]);
}
static inline gsl_complex gsl_complex_div(gsl_complex a, gsl_complex b) {
  double s = b.dat[0] * b.dat[0] + b.dat[1] * b.dat[1];
  return gsl_complex_rect((a.dat[0] * b.dat[0] + a.dat[1] * b.dat[1]) / s,
                          (a.dat[1] * b.dat[0] - a.dat[0] * b.dat[1]) / s);
}
static inline gsl_complex gsl_complex_add_real(gsl_complex a, double x) {
  return gsl_complex_rect(a.dat[0] + x, a.dat[1]);
}
static inline gsl_complex gsl_complex_sub_real(gsl_complex a, double x) {
  return gsl_complex_rect(a.dat[0] - x, a.dat[1]);
}
static inline gsl_complex gsl_complex_mul_real(gsl_complex a, double x) {
  return gsl_complex_rect(a.dat[0] * x, a.dat[1] * x);
}
static inline gsl_complex gsl_complex_div_real(gsl_complex a, double x) {
  return gsl_complex_rect(a.dat[0] / x, a.dat[1] / x);
}
static inline gsl_complex gsl_complex_mul_imag(gsl_complex a, double y) {
  return gsl_complex_rect(-a.dat[1] * y, a.dat[0] * y);
}
static inline gsl_complex gsl_complex_conjugate(gsl_complex a) {
  return gsl_complex_rect(a.dat[0], -a.dat[1]);
}
static inline gsl_complex gsl_complex_negative(gsl_complex a) {
  return gsl_complex_rect(-a.dat[0], -a.dat[1]);
}
static inline double gsl_complex_abs(gsl_complex a) { return hypot(a.dat[0], a.dat[1]); }
static inline double gsl_complex_abs2(gsl_complex a) {
  return a.dat[0] * a.dat[0] + a.dat[1] * a.dat[1];
}
static inline double gsl_complex_arg(gsl_complex a) { return atan2(a.dat[1], a.dat[0]); }
static inline gsl_complex gsl_complex_exp(gsl_complex a) {
  return gsl_complex_polar(exp(a.dat[0]), a.dat[1]);
}
static inline gsl_complex gsl_complex_sqrt(gsl_complex a) {
  double r = gsl_complex_abs(a), t = gsl_complex_arg(a);
  return gsl_complex_polar(sqrt(r), t / 2.0);
}
static inline gsl_complex gsl_complex_inverse(gsl_complex a) {
  double s = gsl_complex_abs2(a);
  return gsl_complex_rect(a.dat[0] / s, -a.dat[1] / s);
}

/* ------------------------------------------------------------------ */
/* blocks                                                              */
/* ------------------------------------------------------------------ */

typedef struct { size_t size; double *data; } gsl_block;
typedef struct { size_t size; float *data; } gsl_block_float;
typedef struct { size_t size; short *data; } gsl_block_short;
typedef struct { size_t size; char *data; } gsl_block_char;
typedef struct { size_t size; double *data; } gsl_block_complex;

/* ------------------------------------------------------------------ */
/* typed vectors (stride-aware, like GSL)                              */
/* ------------------------------------------------------------------ */

#define GSL_SHIM_DEFINE_VECTOR(TAG, ELT)                                      \
  typedef struct {                                                            \
    size_t size;                                                              \
    size_t stride;                                                            \
    ELT *data;                                                                \
    void *block;                                                              \
    int owner;                                                                \
  } TAG;                                                                      \
  typedef struct { TAG vector; } TAG##_view;                                  \
  typedef struct { const TAG vector; } TAG##_const_view;                      \
  /* GSL documents _alloc as returning UNINITIALIZED memory; this shim      \
   * zero-fills instead so golden outputs are deterministic — the reference \
   * MC-WPE ctor reads Gn_ vectors it allocated with _alloc but never       \
   * zeroed (dereverberation.cc:330 vs the single-channel calloc at :37).   \
   * Zero is what that code clearly intends (next_speaker() resets to 0).  */\
  static inline TAG *TAG##_alloc(size_t n) {                                  \
    TAG *v = (TAG *)malloc(sizeof(TAG));                                      \
    v->size = n; v->stride = 1;                                               \
    v->data = (ELT *)calloc((n ? n : 1), sizeof(ELT));                        \
    v->block = NULL; v->owner = 1;                                            \
    return v;                                                                 \
  }                                                                           \
  static inline TAG *TAG##_calloc(size_t n) {                                 \
    TAG *v = TAG##_alloc(n);                                                  \
    memset(v->data, 0, sizeof(ELT) * (n ? n : 1));                            \
    return v;                                                                 \
  }                                                                           \
  static inline void TAG##_free(TAG *v) {                                     \
    if (!v) return;                                                           \
    if (v->owner) free(v->data);                                              \
    free(v);                                                                  \
  }                                                                           \
  static inline ELT TAG##_get(const TAG *v, size_t i) {                       \
    return v->data[i * v->stride];                                            \
  }                                                                           \
  static inline void TAG##_set(TAG *v, size_t i, ELT x) {                     \
    v->data[i * v->stride] = x;                                               \
  }                                                                           \
  static inline ELT *TAG##_ptr(TAG *v, size_t i) {                            \
    return v->data + i * v->stride;                                           \
  }                                                                           \
  static inline void TAG##_set_zero(TAG *v) {                                 \
    for (size_t i = 0; i < v->size; i++) v->data[i * v->stride] = (ELT)0;     \
  }                                                                           \
  static inline void TAG##_set_all(TAG *v, ELT x) {                           \
    for (size_t i = 0; i < v->size; i++) v->data[i * v->stride] = x;          \
  }                                                                           \
  static inline int TAG##_memcpy(TAG *dst, const TAG *src) {                  \
    for (size_t i = 0; i < src->size; i++)                                    \
      dst->data[i * dst->stride] = src->data[i * src->stride];                \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_add(TAG *a, const TAG *b) {                         \
    for (size_t i = 0; i < a->size; i++)                                      \
      a->data[i * a->stride] = (ELT)(a->data[i * a->stride] +                 \
                                     b->data[i * b->stride]);                 \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_sub(TAG *a, const TAG *b) {                         \
    for (size_t i = 0; i < a->size; i++)                                      \
      a->data[i * a->stride] = (ELT)(a->data[i * a->stride] -                 \
                                     b->data[i * b->stride]);                 \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_scale(TAG *a, double x) {                           \
    for (size_t i = 0; i < a->size; i++)                                      \
      a->data[i * a->stride] = (ELT)(a->data[i * a->stride] * x);             \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_fwrite(FILE *fp, const TAG *v) {                    \
    for (size_t i = 0; i < v->size; i++)                                      \
      if (fwrite(v->data + i * v->stride, sizeof(ELT), 1, fp) != 1)           \
        return GSL_FAILURE;                                                   \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_fread(FILE *fp, TAG *v) {                           \
    for (size_t i = 0; i < v->size; i++)                                      \
      if (fread(v->data + i * v->stride, sizeof(ELT), 1, fp) != 1)            \
        return GSL_FAILURE;                                                   \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline TAG##_view TAG##_subvector(TAG *v, size_t offset, size_t n) { \
    TAG##_view view;                                                          \
    view.vector.size = n;                                                     \
    view.vector.stride = v->stride;                                           \
    view.vector.data = v->data + offset * v->stride;                          \
    view.vector.block = NULL;                                                 \
    view.vector.owner = 0;                                                    \
    return view;                                                              \
  }

GSL_SHIM_DEFINE_VECTOR(gsl_vector, double)
GSL_SHIM_DEFINE_VECTOR(gsl_vector_float, float)
GSL_SHIM_DEFINE_VECTOR(gsl_vector_short, short)
GSL_SHIM_DEFINE_VECTOR(gsl_vector_char, char)
GSL_SHIM_DEFINE_VECTOR(gsl_vector_int, int)

/* complex vector: interleaved re/im doubles, element i at data[2*i*stride] */
typedef struct {
  size_t size;
  size_t stride;
  double *data;
  void *block;
  int owner;
} gsl_vector_complex;
typedef struct { gsl_vector_complex vector; } gsl_vector_complex_view;
typedef struct { const gsl_vector_complex vector; } gsl_vector_complex_const_view;

static inline gsl_vector_complex *gsl_vector_complex_alloc(size_t n) {
  /* zero-filled for deterministic goldens — see the note on TAG##_alloc */
  gsl_vector_complex *v = (gsl_vector_complex *)malloc(sizeof(gsl_vector_complex));
  v->size = n; v->stride = 1;
  v->data = (double *)calloc(2 * (n ? n : 1), sizeof(double));
  v->block = NULL; v->owner = 1;
  return v;
}
static inline gsl_vector_complex *gsl_vector_complex_calloc(size_t n) {
  gsl_vector_complex *v = gsl_vector_complex_alloc(n);
  memset(v->data, 0, sizeof(double) * 2 * (n ? n : 1));
  return v;
}
static inline void gsl_vector_complex_free(gsl_vector_complex *v) {
  if (!v) return;
  if (v->owner) free(v->data);
  free(v);
}
static inline gsl_complex gsl_vector_complex_get(const gsl_vector_complex *v, size_t i) {
  gsl_complex z;
  z.dat[0] = v->data[2 * i * v->stride];
  z.dat[1] = v->data[2 * i * v->stride + 1];
  return z;
}
static inline void gsl_vector_complex_set(gsl_vector_complex *v, size_t i, gsl_complex z) {
  v->data[2 * i * v->stride] = z.dat[0];
  v->data[2 * i * v->stride + 1] = z.dat[1];
}
static inline void gsl_vector_complex_set_zero(gsl_vector_complex *v) {
  for (size_t i = 0; i < v->size; i++)
    v->data[2 * i * v->stride] = v->data[2 * i * v->stride + 1] = 0.0;
}
static inline void gsl_vector_complex_set_all(gsl_vector_complex *v, gsl_complex z) {
  for (size_t i = 0; i < v->size; i++) gsl_vector_complex_set(v, i, z);
}
static inline int gsl_vector_complex_memcpy(gsl_vector_complex *dst,
                                            const gsl_vector_complex *src) {
  for (size_t i = 0; i < src->size; i++)
    gsl_vector_complex_set(dst, i, gsl_vector_complex_get(src, i));
  return GSL_SUCCESS;
}
static inline int gsl_vector_complex_add(gsl_vector_complex *a, const gsl_vector_complex *b) {
  for (size_t i = 0; i < a->size; i++)
    gsl_vector_complex_set(a, i, gsl_complex_add(gsl_vector_complex_get(a, i),
                                                 gsl_vector_complex_get(b, i)));
  return GSL_SUCCESS;
}
static inline int gsl_vector_complex_sub(gsl_vector_complex *a, const gsl_vector_complex *b) {
  for (size_t i = 0; i < a->size; i++)
    gsl_vector_complex_set(a, i, gsl_complex_sub(gsl_vector_complex_get(a, i),
                                                 gsl_vector_complex_get(b, i)));
  return GSL_SUCCESS;
}
static inline int gsl_vector_complex_scale(gsl_vector_complex *a, gsl_complex x) {
  for (size_t i = 0; i < a->size; i++)
    gsl_vector_complex_set(a, i, gsl_complex_mul(gsl_vector_complex_get(a, i), x));
  return GSL_SUCCESS;
}
static inline gsl_vector_complex_view
gsl_vector_complex_subvector(gsl_vector_complex *v, size_t offset, size_t n) {
  gsl_vector_complex_view view;
  view.vector.size = n;
  view.vector.stride = v->stride;
  view.vector.data = v->data + 2 * offset * v->stride;
  view.vector.block = NULL;
  view.vector.owner = 0;
  return view;
}

/* ------------------------------------------------------------------ */
/* matrices                                                            */
/* ------------------------------------------------------------------ */

#define GSL_SHIM_DEFINE_MATRIX(TAG, VTAG, ELT)                                \
  typedef struct {                                                            \
    size_t size1;                                                             \
    size_t size2;                                                             \
    size_t tda;                                                               \
    ELT *data;                                                                \
    void *block;                                                              \
    int owner;                                                                \
  } TAG;                                                                      \
  typedef struct { TAG matrix; } TAG##_view;                                  \
  typedef struct { const TAG matrix; } TAG##_const_view;                      \
  static inline TAG *TAG##_alloc(size_t n1, size_t n2) {                      \
    TAG *m = (TAG *)malloc(sizeof(TAG));                                      \
    m->size1 = n1; m->size2 = n2; m->tda = n2;                                \
    m->data = (ELT *)calloc((n1 * n2 ? n1 * n2 : 1), sizeof(ELT));            \
    m->block = NULL; m->owner = 1;                                            \
    return m;                                                                 \
  }                                                                           \
  static inline TAG *TAG##_calloc(size_t n1, size_t n2) {                     \
    TAG *m = TAG##_alloc(n1, n2);                                             \
    memset(m->data, 0, sizeof(ELT) * (n1 * n2 ? n1 * n2 : 1));                \
    return m;                                                                 \
  }                                                                           \
  static inline void TAG##_free(TAG *m) {                                     \
    if (!m) return;                                                           \
    if (m->owner) free(m->data);                                              \
    free(m);                                                                  \
  }                                                                           \
  static inline ELT TAG##_get(const TAG *m, size_t i, size_t j) {             \
    return m->data[i * m->tda + j];                                           \
  }                                                                           \
  static inline void TAG##_set(TAG *m, size_t i, size_t j, ELT x) {           \
    m->data[i * m->tda + j] = x;                                              \
  }                                                                           \
  static inline ELT *TAG##_ptr(TAG *m, size_t i, size_t j) {                  \
    return m->data + i * m->tda + j;                                          \
  }                                                                           \
  static inline void TAG##_set_zero(TAG *m) {                                 \
    for (size_t i = 0; i < m->size1; i++)                                     \
      for (size_t j = 0; j < m->size2; j++) m->data[i * m->tda + j] = (ELT)0; \
  }                                                                           \
  static inline int TAG##_memcpy(TAG *dst, const TAG *src) {                  \
    for (size_t i = 0; i < src->size1; i++)                                   \
      for (size_t j = 0; j < src->size2; j++)                                 \
        dst->data[i * dst->tda + j] = src->data[i * src->tda + j];            \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_get_row(VTAG *v, const TAG *m, size_t i) {          \
    for (size_t j = 0; j < m->size2; j++)                                     \
      v->data[j * v->stride] = m->data[i * m->tda + j];                       \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_get_col(VTAG *v, const TAG *m, size_t j) {          \
    for (size_t i = 0; i < m->size1; i++)                                     \
      v->data[i * v->stride] = m->data[i * m->tda + j];                       \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_set_row(TAG *m, size_t i, const VTAG *v) {          \
    for (size_t j = 0; j < m->size2; j++)                                     \
      m->data[i * m->tda + j] = v->data[j * v->stride];                       \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_set_col(TAG *m, size_t j, const VTAG *v) {          \
    for (size_t i = 0; i < m->size1; i++)                                     \
      m->data[i * m->tda + j] = v->data[i * v->stride];                       \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_fread(FILE *fp, TAG *m) {                           \
    for (size_t i = 0; i < m->size1; i++)                                     \
      for (size_t j = 0; j < m->size2; j++)                                   \
        if (fread(m->data + i * m->tda + j, sizeof(ELT), 1, fp) != 1)         \
          return GSL_FAILURE;                                                 \
    return GSL_SUCCESS;                                                       \
  }                                                                           \
  static inline int TAG##_fwrite(FILE *fp, const TAG *m) {                    \
    for (size_t i = 0; i < m->size1; i++)                                     \
      for (size_t j = 0; j < m->size2; j++)                                   \
        if (fwrite(m->data + i * m->tda + j, sizeof(ELT), 1, fp) != 1)        \
          return GSL_FAILURE;                                                 \
    return GSL_SUCCESS;                                                       \
  }

GSL_SHIM_DEFINE_MATRIX(gsl_matrix, gsl_vector, double)
GSL_SHIM_DEFINE_MATRIX(gsl_matrix_float, gsl_vector_float, float)

/* complex matrix: interleaved re/im doubles, element (i,j) at 2*(i*tda+j) */
typedef struct {
  size_t size1;
  size_t size2;
  size_t tda;
  double *data;
  void *block;
  int owner;
} gsl_matrix_complex;
typedef struct { gsl_matrix_complex matrix; } gsl_matrix_complex_view;
typedef struct { const gsl_matrix_complex matrix; } gsl_matrix_complex_const_view;

static inline gsl_matrix_complex *gsl_matrix_complex_alloc(size_t n1, size_t n2) {
  gsl_matrix_complex *m = (gsl_matrix_complex *)malloc(sizeof(gsl_matrix_complex));
  m->size1 = n1; m->size2 = n2; m->tda = n2;
  m->data = (double *)calloc(2 * (n1 * n2 ? n1 * n2 : 1), sizeof(double));
  m->block = NULL; m->owner = 1;
  return m;
}
static inline gsl_matrix_complex *gsl_matrix_complex_calloc(size_t n1, size_t n2) {
  gsl_matrix_complex *m = gsl_matrix_complex_alloc(n1, n2);
  memset(m->data, 0, sizeof(double) * 2 * (n1 * n2 ? n1 * n2 : 1));
  return m;
}
static inline void gsl_matrix_complex_free(gsl_matrix_complex *m) {
  if (!m) return;
  if (m->owner) free(m->data);
  free(m);
}
static inline gsl_complex gsl_matrix_complex_get(const gsl_matrix_complex *m,
                                                 size_t i, size_t j) {
  gsl_complex z;
  z.dat[0] = m->data[2 * (i * m->tda + j)];
  z.dat[1] = m->data[2 * (i * m->tda + j) + 1];
  return z;
}
static inline void gsl_matrix_complex_set(gsl_matrix_complex *m, size_t i, size_t j,
                                          gsl_complex z) {
  m->data[2 * (i * m->tda + j)] = z.dat[0];
  m->data[2 * (i * m->tda + j) + 1] = z.dat[1];
}
static inline void gsl_matrix_complex_set_zero(gsl_matrix_complex *m) {
  for (size_t i = 0; i < m->size1; i++)
    for (size_t j = 0; j < m->size2; j++)
      gsl_matrix_complex_set(m, i, j, gsl_complex_rect(0.0, 0.0));
}
static inline void gsl_matrix_complex_set_identity(gsl_matrix_complex *m) {
  for (size_t i = 0; i < m->size1; i++)
    for (size_t j = 0; j < m->size2; j++)
      gsl_matrix_complex_set(m, i, j, gsl_complex_rect(i == j ? 1.0 : 0.0, 0.0));
}
static inline int gsl_matrix_complex_memcpy(gsl_matrix_complex *dst,
                                            const gsl_matrix_complex *src) {
  for (size_t i = 0; i < src->size1; i++)
    for (size_t j = 0; j < src->size2; j++)
      gsl_matrix_complex_set(dst, i, j, gsl_matrix_complex_get(src, i, j));
  return GSL_SUCCESS;
}
static inline int gsl_matrix_complex_add(gsl_matrix_complex *a,
                                         const gsl_matrix_complex *b) {
  for (size_t i = 0; i < a->size1; i++)
    for (size_t j = 0; j < a->size2; j++)
      gsl_matrix_complex_set(a, i, j,
                             gsl_complex_add(gsl_matrix_complex_get(a, i, j),
                                             gsl_matrix_complex_get(b, i, j)));
  return GSL_SUCCESS;
}
static inline int gsl_matrix_complex_sub(gsl_matrix_complex *a,
                                         const gsl_matrix_complex *b) {
  for (size_t i = 0; i < a->size1; i++)
    for (size_t j = 0; j < a->size2; j++)
      gsl_matrix_complex_set(a, i, j,
                             gsl_complex_sub(gsl_matrix_complex_get(a, i, j),
                                             gsl_matrix_complex_get(b, i, j)));
  return GSL_SUCCESS;
}
static inline int gsl_matrix_complex_scale(gsl_matrix_complex *a, gsl_complex x) {
  for (size_t i = 0; i < a->size1; i++)
    for (size_t j = 0; j < a->size2; j++)
      gsl_matrix_complex_set(a, i, j,
                             gsl_complex_mul(gsl_matrix_complex_get(a, i, j), x));
  return GSL_SUCCESS;
}
static inline int gsl_matrix_complex_get_row(gsl_vector_complex *v,
                                             const gsl_matrix_complex *m, size_t i) {
  for (size_t j = 0; j < m->size2; j++)
    gsl_vector_complex_set(v, j, gsl_matrix_complex_get(m, i, j));
  return GSL_SUCCESS;
}
static inline int gsl_matrix_complex_get_col(gsl_vector_complex *v,
                                             const gsl_matrix_complex *m, size_t j) {
  for (size_t i = 0; i < m->size1; i++)
    gsl_vector_complex_set(v, i, gsl_matrix_complex_get(m, i, j));
  return GSL_SUCCESS;
}
static inline int gsl_matrix_complex_set_row(gsl_matrix_complex *m, size_t i,
                                             const gsl_vector_complex *v) {
  for (size_t j = 0; j < m->size2; j++)
    gsl_matrix_complex_set(m, i, j, gsl_vector_complex_get(v, j));
  return GSL_SUCCESS;
}
static inline int gsl_matrix_complex_set_col(gsl_matrix_complex *m, size_t j,
                                             const gsl_vector_complex *v) {
  for (size_t i = 0; i < m->size1; i++)
    gsl_matrix_complex_set(m, i, j, gsl_vector_complex_get(v, i));
  return GSL_SUCCESS;
}
static inline gsl_matrix_complex_view
gsl_matrix_complex_submatrix(gsl_matrix_complex *m, size_t k1, size_t k2,
                             size_t n1, size_t n2) {
  gsl_matrix_complex_view view;
  view.matrix.size1 = n1;
  view.matrix.size2 = n2;
  view.matrix.tda = m->tda;
  view.matrix.data = m->data + 2 * (k1 * m->tda + k2);
  view.matrix.block = NULL;
  view.matrix.owner = 0;
  return view;
}
static inline gsl_vector_complex_view
gsl_matrix_complex_subrow(gsl_matrix_complex *m, size_t i, size_t offset, size_t n) {
  gsl_vector_complex_view view;
  view.vector.size = n;
  view.vector.stride = 1;
  view.vector.data = m->data + 2 * (i * m->tda + offset);
  view.vector.block = NULL;
  view.vector.owner = 0;
  return view;
}
static inline gsl_vector_complex_view
gsl_matrix_complex_subcolumn(gsl_matrix_complex *m, size_t j, size_t offset, size_t n) {
  gsl_vector_complex_view view;
  view.vector.size = n;
  view.vector.stride = m->tda;
  view.vector.data = m->data + 2 * (offset * m->tda + j);
  view.vector.block = NULL;
  view.vector.owner = 0;
  return view;
}
static inline gsl_vector_complex_view gsl_matrix_complex_row(gsl_matrix_complex *m,
                                                             size_t i) {
  return gsl_matrix_complex_subrow(m, i, 0, m->size2);
}
static inline gsl_vector_complex_view gsl_matrix_complex_column(gsl_matrix_complex *m,
                                                                size_t j) {
  return gsl_matrix_complex_subcolumn(m, j, 0, m->size1);
}
static inline int gsl_matrix_complex_fprintf(FILE *fp, const gsl_matrix_complex *m,
                                             const char *fmt) {
  (void)fmt;
  for (size_t i = 0; i < m->size1; i++)
    for (size_t j = 0; j < m->size2; j++) {
      gsl_complex z = gsl_matrix_complex_get(m, i, j);
      fprintf(fp, "%g %g\n", z.dat[0], z.dat[1]);
    }
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* CBLAS enums + complex BLAS subset                                   */
/* ------------------------------------------------------------------ */

enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 };
enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112, CblasConjTrans = 113 };
enum CBLAS_UPLO { CblasUpper = 121, CblasLower = 122 };
enum CBLAS_DIAG { CblasNonUnit = 131, CblasUnit = 132 };
enum CBLAS_SIDE { CblasLeft = 141, CblasRight = 142 };
typedef enum CBLAS_TRANSPOSE CBLAS_TRANSPOSE_t;
typedef enum CBLAS_UPLO CBLAS_UPLO_t;
typedef enum CBLAS_SIDE CBLAS_SIDE_t;

static inline gsl_complex gsl_shim_mat_elt_(const gsl_matrix_complex *A,
                                            CBLAS_TRANSPOSE_t trans, size_t i,
                                            size_t j) {
  if (trans == CblasNoTrans) return gsl_matrix_complex_get(A, i, j);
  if (trans == CblasTrans) return gsl_matrix_complex_get(A, j, i);
  return gsl_complex_conjugate(gsl_matrix_complex_get(A, j, i));
}

static inline int gsl_blas_zgemv(CBLAS_TRANSPOSE_t TransA, gsl_complex alpha,
                                 const gsl_matrix_complex *A,
                                 const gsl_vector_complex *x, gsl_complex beta,
                                 gsl_vector_complex *y) {
  size_t M = (TransA == CblasNoTrans) ? A->size1 : A->size2;
  size_t N = (TransA == CblasNoTrans) ? A->size2 : A->size1;
  for (size_t i = 0; i < M; i++) {
    gsl_complex acc = gsl_complex_rect(0.0, 0.0);
    for (size_t j = 0; j < N; j++)
      acc = gsl_complex_add(acc, gsl_complex_mul(gsl_shim_mat_elt_(A, TransA, i, j),
                                                 gsl_vector_complex_get(x, j)));
    gsl_complex yi = gsl_complex_mul(beta, gsl_vector_complex_get(y, i));
    gsl_vector_complex_set(y, i, gsl_complex_add(yi, gsl_complex_mul(alpha, acc)));
  }
  return GSL_SUCCESS;
}

static inline int gsl_blas_zgemm(CBLAS_TRANSPOSE_t TransA, CBLAS_TRANSPOSE_t TransB,
                                 gsl_complex alpha, const gsl_matrix_complex *A,
                                 const gsl_matrix_complex *B, gsl_complex beta,
                                 gsl_matrix_complex *C) {
  size_t M = C->size1, N = C->size2;
  size_t K = (TransA == CblasNoTrans) ? A->size2 : A->size1;
  for (size_t i = 0; i < M; i++)
    for (size_t j = 0; j < N; j++) {
      gsl_complex acc = gsl_complex_rect(0.0, 0.0);
      for (size_t k = 0; k < K; k++)
        acc = gsl_complex_add(acc,
                              gsl_complex_mul(gsl_shim_mat_elt_(A, TransA, i, k),
                                              gsl_shim_mat_elt_(B, TransB, k, j)));
      gsl_complex cij = gsl_complex_mul(beta, gsl_matrix_complex_get(C, i, j));
      gsl_matrix_complex_set(C, i, j,
                             gsl_complex_add(cij, gsl_complex_mul(alpha, acc)));
    }
  return GSL_SUCCESS;
}

static inline int gsl_blas_zdotc(const gsl_vector_complex *x,
                                 const gsl_vector_complex *y, gsl_complex *dotc) {
  gsl_complex acc = gsl_complex_rect(0.0, 0.0);
  for (size_t i = 0; i < x->size; i++)
    acc = gsl_complex_add(acc,
                          gsl_complex_mul(gsl_complex_conjugate(gsl_vector_complex_get(x, i)),
                                          gsl_vector_complex_get(y, i)));
  *dotc = acc;
  return GSL_SUCCESS;
}

static inline int gsl_blas_zdotu(const gsl_vector_complex *x,
                                 const gsl_vector_complex *y, gsl_complex *dotu) {
  gsl_complex acc = gsl_complex_rect(0.0, 0.0);
  for (size_t i = 0; i < x->size; i++)
    acc = gsl_complex_add(acc, gsl_complex_mul(gsl_vector_complex_get(x, i),
                                               gsl_vector_complex_get(y, i)));
  *dotu = acc;
  return GSL_SUCCESS;
}

static inline int gsl_blas_zaxpy(gsl_complex alpha, const gsl_vector_complex *x,
                                 gsl_vector_complex *y) {
  for (size_t i = 0; i < x->size; i++)
    gsl_vector_complex_set(y, i,
                           gsl_complex_add(gsl_vector_complex_get(y, i),
                                           gsl_complex_mul(alpha,
                                                           gsl_vector_complex_get(x, i))));
  return GSL_SUCCESS;
}

static inline void gsl_blas_zdscal(double alpha, gsl_vector_complex *x) {
  for (size_t i = 0; i < x->size; i++)
    gsl_vector_complex_set(x, i, gsl_complex_mul_real(gsl_vector_complex_get(x, i), alpha));
}

static inline void gsl_blas_zscal(gsl_complex alpha, gsl_vector_complex *x) {
  for (size_t i = 0; i < x->size; i++)
    gsl_vector_complex_set(x, i, gsl_complex_mul(gsl_vector_complex_get(x, i), alpha));
}

/* rank-1 update A += alpha x y^T (unconjugated, BLAS zgeru) */
static inline int gsl_blas_zgeru(gsl_complex alpha, const gsl_vector_complex *x,
                                 const gsl_vector_complex *y, gsl_matrix_complex *A) {
  for (size_t i = 0; i < x->size; i++)
    for (size_t j = 0; j < y->size; j++) {
      gsl_complex t = gsl_complex_mul(alpha, gsl_complex_mul(gsl_vector_complex_get(x, i),
                                                             gsl_vector_complex_get(y, j)));
      gsl_matrix_complex_set(A, i, j,
                             gsl_complex_add(gsl_matrix_complex_get(A, i, j), t));
    }
  return GSL_SUCCESS;
}

/* rank-1 update A += alpha x y^H (conjugated, BLAS zgerc) */
static inline int gsl_blas_zgerc(gsl_complex alpha, const gsl_vector_complex *x,
                                 const gsl_vector_complex *y, gsl_matrix_complex *A) {
  for (size_t i = 0; i < x->size; i++)
    for (size_t j = 0; j < y->size; j++) {
      gsl_complex t = gsl_complex_mul(
          alpha, gsl_complex_mul(gsl_vector_complex_get(x, i),
                                 gsl_complex_conjugate(gsl_vector_complex_get(y, j))));
      gsl_matrix_complex_set(A, i, j,
                             gsl_complex_add(gsl_matrix_complex_get(A, i, j), t));
    }
  return GSL_SUCCESS;
}

static inline double gsl_blas_dznrm2(const gsl_vector_complex *x) {
  double s = 0.0;
  for (size_t i = 0; i < x->size; i++) s += gsl_complex_abs2(gsl_vector_complex_get(x, i));
  return sqrt(s);
}

static inline double gsl_blas_dnrm2(const gsl_vector *x) {
  double s = 0.0;
  for (size_t i = 0; i < x->size; i++) {
    double t = x->data[i * x->stride];
    s += t * t;
  }
  return sqrt(s);
}

static inline int gsl_blas_ddot(const gsl_vector *x, const gsl_vector *y, double *result) {
  double s = 0.0;
  for (size_t i = 0; i < x->size; i++) s += x->data[i * x->stride] * y->data[i * y->stride];
  *result = s;
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* radix-2 complex FFT on interleaved double arrays (GSL conventions:  */
/* forward = exp(-i...), backward = exp(+i...) unnormalized,           */
/* inverse = backward / n)                                             */
/* ------------------------------------------------------------------ */

static inline int gsl_shim_fft_radix2_(double *data, size_t stride, size_t n, int sign) {
  /* bit reversal */
  size_t j = 0;
  for (size_t i = 0; i < n - 1; i++) {
    if (i < j) {
      double tr = data[2 * stride * i], ti = data[2 * stride * i + 1];
      data[2 * stride * i] = data[2 * stride * j];
      data[2 * stride * i + 1] = data[2 * stride * j + 1];
      data[2 * stride * j] = tr;
      data[2 * stride * j + 1] = ti;
    }
    size_t m = n >> 1;
    while (m >= 1 && j >= m) {
      j -= m;
      m >>= 1;
    }
    j += m;
  }
  /* Danielson-Lanczos */
  for (size_t len = 2; len <= n; len <<= 1) {
    double theta = sign * 2.0 * M_PI / (double)len;
    double wr0 = cos(theta), wi0 = sin(theta);
    for (size_t i = 0; i < n; i += len) {
      double wr = 1.0, wi = 0.0;
      for (size_t k = 0; k < len / 2; k++) {
        size_t a = 2 * stride * (i + k), b = 2 * stride * (i + k + len / 2);
        double xr = data[b] * wr - data[b + 1] * wi;
        double xi = data[b] * wi + data[b + 1] * wr;
        data[b] = data[a] - xr;
        data[b + 1] = data[a + 1] - xi;
        data[a] += xr;
        data[a + 1] += xi;
        double nwr = wr * wr0 - wi * wi0;
        wi = wr * wi0 + wi * wr0;
        wr = nwr;
      }
    }
  }
  return GSL_SUCCESS;
}

static inline int gsl_fft_complex_radix2_forward(double *data, size_t stride, size_t n) {
  return gsl_shim_fft_radix2_(data, stride, n, -1);
}
static inline int gsl_fft_complex_radix2_backward(double *data, size_t stride, size_t n) {
  return gsl_shim_fft_radix2_(data, stride, n, +1);
}
static inline int gsl_fft_complex_radix2_inverse(double *data, size_t stride, size_t n) {
  gsl_shim_fft_radix2_(data, stride, n, +1);
  for (size_t i = 0; i < n; i++) {
    data[2 * stride * i] /= (double)n;
    data[2 * stride * i + 1] /= (double)n;
  }
  return GSL_SUCCESS;
}
static inline int gsl_fft_complex_radix2_transform(double *data, size_t stride, size_t n,
                                                   int sign) {
  return gsl_shim_fft_radix2_(data, stride, n, sign);
}

/* ------------------------------------------------------------------ */
/* complex Cholesky decomposition / solve (gsl_linalg)                 */
/* ------------------------------------------------------------------ */

static inline int gsl_linalg_complex_cholesky_decomp(gsl_matrix_complex *A) {
  size_t n = A->size1;
  for (size_t j = 0; j < n; j++) {
    double d = GSL_REAL(gsl_matrix_complex_get(A, j, j));
    for (size_t k = 0; k < j; k++) d -= gsl_complex_abs2(gsl_matrix_complex_get(A, j, k));
    if (d <= 0.0) return GSL_EDOM;
    double ljj = sqrt(d);
    gsl_matrix_complex_set(A, j, j, gsl_complex_rect(ljj, 0.0));
    for (size_t i = j + 1; i < n; i++) {
      gsl_complex s = gsl_matrix_complex_get(A, i, j);
      for (size_t k = 0; k < j; k++)
        s = gsl_complex_sub(s, gsl_complex_mul(gsl_matrix_complex_get(A, i, k),
                                               gsl_complex_conjugate(
                                                   gsl_matrix_complex_get(A, j, k))));
      gsl_matrix_complex_set(A, i, j, gsl_complex_div_real(s, ljj));
    }
  }
  /* mirror L^H into the upper triangle, as GSL documents */
  for (size_t i = 0; i < n; i++)
    for (size_t j = i + 1; j < n; j++)
      gsl_matrix_complex_set(A, i, j,
                             gsl_complex_conjugate(gsl_matrix_complex_get(A, j, i)));
  return GSL_SUCCESS;
}

static inline int gsl_linalg_complex_cholesky_solve(const gsl_matrix_complex *LLT,
                                                    const gsl_vector_complex *b,
                                                    gsl_vector_complex *x) {
  size_t n = LLT->size1;
  /* forward: L y = b */
  for (size_t i = 0; i < n; i++) {
    gsl_complex s = gsl_vector_complex_get(b, i);
    for (size_t k = 0; k < i; k++)
      s = gsl_complex_sub(s, gsl_complex_mul(gsl_matrix_complex_get(LLT, i, k),
                                             gsl_vector_complex_get(x, k)));
    gsl_vector_complex_set(x, i,
                           gsl_complex_div_real(s, GSL_REAL(gsl_matrix_complex_get(LLT, i, i))));
  }
  /* backward: L^H x = y */
  for (size_t ii = n; ii-- > 0;) {
    gsl_complex s = gsl_vector_complex_get(x, ii);
    for (size_t k = ii + 1; k < n; k++)
      s = gsl_complex_sub(s,
                          gsl_complex_mul(gsl_complex_conjugate(
                                              gsl_matrix_complex_get(LLT, k, ii)),
                                          gsl_vector_complex_get(x, k)));
    gsl_vector_complex_set(x, ii,
                           gsl_complex_div_real(s, GSL_REAL(gsl_matrix_complex_get(LLT, ii, ii))));
  }
  return GSL_SUCCESS;
}

/* LU decomposition / inversion for complex matrices (gsl_linalg_complex_LU_*) */
typedef struct {
  size_t size;
  size_t *data;
} gsl_permutation;

static inline gsl_permutation *gsl_permutation_alloc(size_t n) {
  gsl_permutation *p = (gsl_permutation *)malloc(sizeof(gsl_permutation));
  p->size = n;
  p->data = (size_t *)malloc(sizeof(size_t) * (n ? n : 1));
  return p;
}
static inline gsl_permutation *gsl_permutation_calloc(size_t n) {
  gsl_permutation *p = gsl_permutation_alloc(n);
  for (size_t i = 0; i < n; i++) p->data[i] = i;
  return p;
}
static inline void gsl_permutation_free(gsl_permutation *p) {
  if (!p) return;
  free(p->data);
  free(p);
}
static inline void gsl_permutation_init(gsl_permutation *p) {
  for (size_t i = 0; i < p->size; i++) p->data[i] = i;
}

static inline int gsl_linalg_complex_LU_decomp(gsl_matrix_complex *A, gsl_permutation *p,
                                               int *signum) {
  size_t n = A->size1;
  gsl_permutation_init(p);
  *signum = 1;
  for (size_t k = 0; k < n; k++) {
    size_t piv = k;
    double best = gsl_complex_abs(gsl_matrix_complex_get(A, k, k));
    for (size_t i = k + 1; i < n; i++) {
      double v = gsl_complex_abs(gsl_matrix_complex_get(A, i, k));
      if (v > best) { best = v; piv = i; }
    }
    if (piv != k) {
      for (size_t j = 0; j < n; j++) {
        gsl_complex t = gsl_matrix_complex_get(A, k, j);
        gsl_matrix_complex_set(A, k, j, gsl_matrix_complex_get(A, piv, j));
        gsl_matrix_complex_set(A, piv, j, t);
      }
      size_t tp = p->data[k]; p->data[k] = p->data[piv]; p->data[piv] = tp;
      *signum = -*signum;
    }
    gsl_complex akk = gsl_matrix_complex_get(A, k, k);
    if (gsl_complex_abs(akk) == 0.0) continue;
    for (size_t i = k + 1; i < n; i++) {
      gsl_complex lik = gsl_complex_div(gsl_matrix_complex_get(A, i, k), akk);
      gsl_matrix_complex_set(A, i, k, lik);
      for (size_t j = k + 1; j < n; j++)
        gsl_matrix_complex_set(
            A, i, j,
            gsl_complex_sub(gsl_matrix_complex_get(A, i, j),
                            gsl_complex_mul(lik, gsl_matrix_complex_get(A, k, j))));
    }
  }
  return GSL_SUCCESS;
}

static inline int gsl_linalg_complex_LU_invert(const gsl_matrix_complex *LU,
                                               const gsl_permutation *p,
                                               gsl_matrix_complex *inverse) {
  size_t n = LU->size1;
  gsl_vector_complex *col = gsl_vector_complex_calloc(n);
  gsl_vector_complex *x = gsl_vector_complex_calloc(n);
  for (size_t c = 0; c < n; c++) {
    for (size_t i = 0; i < n; i++)
      gsl_vector_complex_set(col, i, gsl_complex_rect(p->data[i] == c ? 1.0 : 0.0, 0.0));
    /* forward: L y = P b (unit lower) */
    for (size_t i = 0; i < n; i++) {
      gsl_complex s = gsl_vector_complex_get(col, i);
      for (size_t k = 0; k < i; k++)
        s = gsl_complex_sub(s, gsl_complex_mul(gsl_matrix_complex_get(LU, i, k),
                                               gsl_vector_complex_get(x, k)));
      gsl_vector_complex_set(x, i, s);
    }
    /* backward: U x = y */
    for (size_t ii = n; ii-- > 0;) {
      gsl_complex s = gsl_vector_complex_get(x, ii);
      for (size_t k = ii + 1; k < n; k++)
        s = gsl_complex_sub(s, gsl_complex_mul(gsl_matrix_complex_get(LU, ii, k),
                                               gsl_vector_complex_get(x, k)));
      gsl_vector_complex_set(x, ii, gsl_complex_div(s, gsl_matrix_complex_get(LU, ii, ii)));
    }
    for (size_t i = 0; i < n; i++) gsl_matrix_complex_set(inverse, i, c, gsl_vector_complex_get(x, i));
  }
  gsl_vector_complex_free(col);
  gsl_vector_complex_free(x);
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* Hermitian eigensolver (gsl_eigen_hermv) via complex Jacobi sweeps   */
/* ------------------------------------------------------------------ */

typedef struct { size_t size; } gsl_eigen_hermv_workspace;
typedef struct { size_t size; } gsl_eigen_symmv_workspace;

static inline gsl_eigen_symmv_workspace *gsl_eigen_symmv_alloc(size_t n) {
  gsl_eigen_symmv_workspace *w =
      (gsl_eigen_symmv_workspace *)malloc(sizeof(gsl_eigen_symmv_workspace));
  w->size = n;
  return w;
}
static inline void gsl_eigen_symmv_free(gsl_eigen_symmv_workspace *w) { free(w); }
/* gsl_eigen_symmv is defined in gsl_shim_real_ext.h (real Jacobi) */

static inline gsl_eigen_hermv_workspace *gsl_eigen_hermv_alloc(size_t n) {
  gsl_eigen_hermv_workspace *w =
      (gsl_eigen_hermv_workspace *)malloc(sizeof(gsl_eigen_hermv_workspace));
  w->size = n;
  return w;
}
static inline void gsl_eigen_hermv_free(gsl_eigen_hermv_workspace *w) { free(w); }

static inline int gsl_eigen_hermv(gsl_matrix_complex *A, gsl_vector *eval,
                                  gsl_matrix_complex *evec,
                                  gsl_eigen_hermv_workspace *w) {
  (void)w;
  size_t n = A->size1;
  gsl_matrix_complex_set_identity(evec);
  for (int sweep = 0; sweep < 64; sweep++) {
    double off = 0.0;
    for (size_t p = 0; p < n; p++)
      for (size_t q = p + 1; q < n; q++) off += gsl_complex_abs2(gsl_matrix_complex_get(A, p, q));
    if (off < 1e-26) break;
    for (size_t p = 0; p < n; p++)
      for (size_t q = p + 1; q < n; q++) {
        gsl_complex apq = gsl_matrix_complex_get(A, p, q);
        double mag = gsl_complex_abs(apq);
        if (mag < 1e-300) continue;
        double app = GSL_REAL(gsl_matrix_complex_get(A, p, p));
        double aqq = GSL_REAL(gsl_matrix_complex_get(A, q, q));
        /* phase such that e^{-i phi} a_pq is real */
        gsl_complex phase = gsl_complex_div_real(apq, mag);
        double theta = 0.5 * atan2(2.0 * mag, aqq - app);
        double c = cos(theta), s = sin(theta);
        gsl_complex sp = gsl_complex_mul_real(phase, s);
        /* columns p,q of A (two-sided rotation) and evec (one-sided) */
        for (size_t i = 0; i < n; i++) {
          gsl_complex aip = gsl_matrix_complex_get(A, i, p);
          gsl_complex aiq = gsl_matrix_complex_get(A, i, q);
          gsl_matrix_complex_set(
              A, i, p,
              gsl_complex_sub(gsl_complex_mul_real(aip, c),
                              gsl_complex_mul(gsl_complex_conjugate(sp), aiq)));
          gsl_matrix_complex_set(
              A, i, q, gsl_complex_add(gsl_complex_mul(sp, aip), gsl_complex_mul_real(aiq, c)));
        }
        for (size_t j = 0; j < n; j++) {
          gsl_complex apj = gsl_matrix_complex_get(A, p, j);
          gsl_complex aqj = gsl_matrix_complex_get(A, q, j);
          gsl_matrix_complex_set(
              A, p, j,
              gsl_complex_sub(gsl_complex_mul_real(apj, c), gsl_complex_mul(sp, aqj)));
          gsl_matrix_complex_set(
              A, q, j,
              gsl_complex_add(gsl_complex_mul(gsl_complex_conjugate(sp), apj),
                              gsl_complex_mul_real(aqj, c)));
        }
        for (size_t i = 0; i < n; i++) {
          gsl_complex vip = gsl_matrix_complex_get(evec, i, p);
          gsl_complex viq = gsl_matrix_complex_get(evec, i, q);
          gsl_matrix_complex_set(
              evec, i, p,
              gsl_complex_sub(gsl_complex_mul_real(vip, c),
                              gsl_complex_mul(gsl_complex_conjugate(sp), viq)));
          gsl_matrix_complex_set(
              evec, i, q,
              gsl_complex_add(gsl_complex_mul(sp, vip), gsl_complex_mul_real(viq, c)));
        }
      }
  }
  for (size_t i = 0; i < n; i++)
    gsl_vector_set(eval, i, GSL_REAL(gsl_matrix_complex_get(A, i, i)));
  return GSL_SUCCESS;
}

/* ------------------------------------------------------------------ */
/* special functions                                                   */
/* ------------------------------------------------------------------ */

static inline double gsl_sf_sinc(double x) {
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return sin(px) / px;
}

#include "gsl/gsl_shim_real_ext.h"

#endif /* GSL_SHIM_CORE_H */
