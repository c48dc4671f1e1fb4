/* Gamma-function subset of the documented GSL special-function API, backed
 * by the C99 libm implementations (shim policy: see gsl_shim_core.h). */
#ifndef GSL_SHIM_SF_GAMMA_H
#define GSL_SHIM_SF_GAMMA_H

#include <math.h>
#include "gsl/gsl_errno.h"
#include "gsl/gsl_sf_result.h"

static inline double gsl_sf_gamma(double x) { return tgamma(x); }
static inline double gsl_sf_lngamma(double x) { return lgamma(x); }

static inline int gsl_sf_gamma_e(double x, gsl_sf_result* result) {
  result->val = tgamma(x);
  result->err = 2.0e-16 * fabs(result->val);
  return GSL_SUCCESS;
}
static inline int gsl_sf_lngamma_e(double x, gsl_sf_result* result) {
  result->val = lgamma(x);
  result->err = 2.0e-16 * fabs(result->val);
  return GSL_SUCCESS;
}

#endif
