/* Confluent hypergeometric 1F1 subset of the documented GSL API (shim
 * policy: see gsl_shim_core.h).
 *
 * The reference calls gsl_sf_hyperg_1F1(-0.5, 1.0, -vk) with vk >= 0
 * (sad.cc:227, the Ephraim-Malah gain).  For x < 0 the direct series
 * alternates and cancels, so apply the Kummer transformation
 * 1F1(a,b,x) = e^x 1F1(b-a, b, -x) to get a positive-term series; for
 * large arguments use the standard asymptotic expansion. */
#ifndef GSL_SHIM_SF_HYPERG_H
#define GSL_SHIM_SF_HYPERG_H

#include <math.h>
#include "gsl/gsl_errno.h"
#include "gsl/gsl_sf_result.h"

static inline double gsl_shim_hyperg_1f1_series_(double a, double b, double x) {
  double term = 1.0, sum = 1.0;
  for (int n = 0; n < 5000; n++) {
    term *= (a + n) * x / ((b + n) * (n + 1.0));
    sum += term;
    if (fabs(term) < 1e-17 * fabs(sum)) break;
  }
  return sum;
}

static inline double gsl_sf_hyperg_1F1(double a, double b, double x) {
  if (x == 0.0) return 1.0;
  if (x < 0.0) {
    /* Kummer: positive-term series in -x */
    double z = -x;
    if (z > 60.0) {
      /* asymptotic: 1F1(a,b,x) ~ Gamma(b)/Gamma(b-a) (-x)^{-a} sum_k
       * (a)_k (a-b+1)_k / (k! (-x)^k) for x -> -inf */
      double pref = exp(lgamma(b) - lgamma(b - a) - a * log(z));
      double term = 1.0, sum = 1.0;
      for (int k = 0; k < 40; k++) {
        double tnew = term * (a + k) * (a - b + 1.0 + k) / ((k + 1.0) * z);
        if (fabs(tnew) > fabs(term)) break; /* divergent tail: stop */
        term = tnew;
        sum += term;
        if (fabs(term) < 1e-17 * fabs(sum)) break;
      }
      return pref * sum;
    }
    return exp(x) * gsl_shim_hyperg_1f1_series_(b - a, b, z);
  }
  return gsl_shim_hyperg_1f1_series_(a, b, x);
}

static inline int gsl_sf_hyperg_1F1_e(double a, double b, double x,
                                      gsl_sf_result* result) {
  result->val = gsl_sf_hyperg_1F1(a, b, x);
  result->err = 1e-12 * fabs(result->val);
  return GSL_SUCCESS;
}

#endif
