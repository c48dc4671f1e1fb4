/* Associated-Legendre subset of the documented GSL special-function API
 * (shim policy: see gsl_shim_core.h).
 *
 * gsl_sf_legendre_sphPlm: the spherical-harmonic-normalized associated
 * Legendre function sqrt((2l+1)/(4pi) (l-m)!/(l+m)!) P_l^m(x), m >= 0,
 * including the Condon-Shortley phase (-1)^m — computed with the standard
 * stable three-term recurrence in l at fixed m (fully normalized form, so
 * no factorial overflow). */
#ifndef GSL_SHIM_SF_LEGENDRE_H
#define GSL_SHIM_SF_LEGENDRE_H

#include <math.h>
#include "gsl/gsl_errno.h"
#include "gsl/gsl_sf_result.h"

static inline int gsl_sf_legendre_sphPlm_e(int l, int m, double x,
                                           gsl_sf_result* result) {
  result->err = 0.0;
  if (m < 0 || l < m || x < -1.0 || x > 1.0) {
    result->val = 0.0;
    return GSL_EDOM;
  }
  /* N_mm = (-1)^m sqrt((2m+1)/(4pi)) prod_{k=1..m} sqrt((2k+1)/(2k))...
   * built incrementally: N_00 = sqrt(1/4pi);
   * N_kk = -sqrt((2k+1)/(2k)) sqrt(1-x^2) N_{k-1,k-1}. */
  double s = sqrt(fmax(0.0, (1.0 - x) * (1.0 + x)));
  double pmm = sqrt(1.0 / (4.0 * M_PI));
  for (int k = 1; k <= m; k++)
    pmm *= -sqrt((2.0 * k + 1.0) / (2.0 * k)) * s;
  if (l == m) {
    result->val = pmm;
    return GSL_SUCCESS;
  }
  /* N_{m+1,m} = x sqrt(2m+3) N_mm */
  double pm1 = x * sqrt(2.0 * m + 3.0) * pmm;
  if (l == m + 1) {
    result->val = pm1;
    return GSL_SUCCESS;
  }
  double pll = 0.0;
  for (int ll = m + 2; ll <= l; ll++) {
    double a = sqrt((4.0 * ll * ll - 1.0) / ((double)ll * ll - (double)m * m));
    double b = sqrt((((double)(ll - 1) * (ll - 1) - (double)m * m)) /
                    (4.0 * (double)(ll - 1) * (ll - 1) - 1.0));
    pll = a * (x * pm1 - b * pmm);
    pmm = pm1;
    pm1 = pll;
  }
  result->val = pll;
  return GSL_SUCCESS;
}

static inline double gsl_sf_legendre_sphPlm(int l, int m, double x) {
  gsl_sf_result r;
  gsl_sf_legendre_sphPlm_e(l, m, x, &r);
  return r.val;
}

/* Unnormalized P_l^m (Condon-Shortley phase included), via the
 * normalization factor — adequate for the small l the reference uses
 * (tracker.cc:413 calls it with SH orders). */
static inline double gsl_sf_legendre_Plm(int l, int m, double x) {
  gsl_sf_result r;
  gsl_sf_legendre_sphPlm_e(l, m, x, &r);
  double lognorm = 0.5 * (log(2.0 * l + 1.0) - log(4.0 * M_PI) +
                          lgamma((double)(l - m + 1)) -
                          lgamma((double)(l + m + 1)));
  return r.val / exp(lognorm);
}

#endif
