/* Linear-fit subset of the documented GSL API (shim policy: see
 * gsl_shim_core.h).  localization.cc includes this header but calls no
 * gsl_fit_* function; the least-squares fit is provided anyway for
 * completeness. */
#ifndef GSL_SHIM_FIT_H
#define GSL_SHIM_FIT_H

#include <stddef.h>
#include "gsl/gsl_errno.h"

static inline int gsl_fit_linear(const double* x, const size_t xstride,
                                 const double* y, const size_t ystride,
                                 size_t n, double* c0, double* c1,
                                 double* cov00, double* cov01, double* cov11,
                                 double* sumsq) {
  double sx = 0, sy = 0, sxx = 0, sxy = 0;
  for (size_t i = 0; i < n; i++) {
    double xi = x[i * xstride], yi = y[i * ystride];
    sx += xi;
    sy += yi;
    sxx += xi * xi;
    sxy += xi * yi;
  }
  double det = n * sxx - sx * sx;
  if (det == 0.0) return GSL_EINVAL;
  *c1 = (n * sxy - sx * sy) / det;
  *c0 = (sy - *c1 * sx) / n;
  double ss = 0;
  for (size_t i = 0; i < n; i++) {
    double r = y[i * ystride] - (*c0 + *c1 * x[i * xstride]);
    ss += r * r;
  }
  *sumsq = ss;
  double s2 = (n > 2) ? ss / (n - 2) : 0.0;
  *cov11 = s2 * n / det;
  *cov00 = s2 * sxx / det;
  *cov01 = -s2 * sx / det;
  return GSL_SUCCESS;
}

#endif
