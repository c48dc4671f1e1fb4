/* Spherical Bessel subset of the documented GSL special-function API
 * (shim policy: see gsl_shim_core.h — written from the GSL manual; no GSL
 * source consulted).
 *
 * j_l: Miller's downward recurrence normalized against j_0 when l >~ x
 *      (upward recurrence is unstable there), upward otherwise.
 * y_l: upward recurrence (always stable for y).
 * The reference only calls these for l >= 3 (modalbeamformer.cc:138-148
 * handles orders 0-3 in closed form), x > 0. */
#ifndef GSL_SHIM_SF_BESSEL_H
#define GSL_SHIM_SF_BESSEL_H

#include <math.h>
#include "gsl/gsl_errno.h"
#include "gsl/gsl_sf_result.h"

static inline int gsl_sf_bessel_jl_e(int l, double x, gsl_sf_result* result) {
  result->err = 0.0;
  if (l < 0 || x < 0.0) {
    result->val = 0.0;
    return GSL_EDOM;
  }
  if (x == 0.0) {
    result->val = (l == 0) ? 1.0 : 0.0;
    return GSL_SUCCESS;
  }
  double j0 = sin(x) / x;
  if (l == 0) {
    result->val = j0;
    return GSL_SUCCESS;
  }
  double j1 = sin(x) / (x * x) - cos(x) / x;
  if (l == 1) {
    result->val = j1;
    return GSL_SUCCESS;
  }
  if ((double)l < x) {
    /* upward: j_{n+1} = (2n+1)/x j_n - j_{n-1} */
    double jm = j0, jc = j1;
    for (int n = 1; n < l; n++) {
      double jn = (2.0 * n + 1.0) / x * jc - jm;
      jm = jc;
      jc = jn;
    }
    result->val = jc;
    return GSL_SUCCESS;
  }
  /* downward (Miller): start above l, recur to 0, normalize with j0 */
  int start = l + 16 + (int)ceil(sqrt((double)(40 * l)));
  double up = 0.0, uc = 1.0e-30, target = 0.0;
  for (int n = start; n >= 1; n--) {
    double um = (2.0 * n + 1.0) / x * uc - up;
    up = uc;
    uc = um;
    if (n - 1 == l) target = uc;
    /* rescale to avoid overflow */
    if (fabs(uc) > 1.0e250) {
      uc *= 1.0e-250;
      up *= 1.0e-250;
      target *= 1.0e-250;
    }
  }
  result->val = target * (j0 / uc);
  return GSL_SUCCESS;
}

static inline int gsl_sf_bessel_yl_e(int l, double x, gsl_sf_result* result) {
  result->err = 0.0;
  if (l < 0 || x <= 0.0) {
    result->val = 0.0;
    return GSL_EDOM;
  }
  double ym = -cos(x) / x;
  if (l == 0) {
    result->val = ym;
    return GSL_SUCCESS;
  }
  double yc = -cos(x) / (x * x) - sin(x) / x;
  for (int n = 1; n < l; n++) {
    double yn = (2.0 * n + 1.0) / x * yc - ym;
    ym = yc;
    yc = yn;
  }
  result->val = yc;
  return GSL_SUCCESS;
}

static inline double gsl_sf_bessel_jl(int l, double x) {
  gsl_sf_result r;
  gsl_sf_bessel_jl_e(l, x, &r);
  return r.val;
}

static inline double gsl_sf_bessel_yl(int l, double x) {
  gsl_sf_result r;
  gsl_sf_bessel_yl_e(l, x, &r);
  return r.val;
}

#endif
