/* Minimal working gsl_ran_* (Box-Muller gaussian; shim policy: see
 * gsl_shim_core.h). */
#ifndef GSL_SHIM_GSL_RANDIST_H
#define GSL_SHIM_GSL_RANDIST_H
#include "gsl_rng.h"

static inline double gsl_ran_gaussian(gsl_rng *r, double sigma) {
  double u1 = gsl_rng_uniform(r), u2 = gsl_rng_uniform(r);
  if (u1 <= 0.0) u1 = 1e-300;
  return sigma * sqrt(-2.0 * log(u1)) * cos(2.0 * M_PI * u2);
}
static inline double gsl_ran_flat(gsl_rng *r, double a, double b) {
  return a + (b - a) * gsl_rng_uniform(r);
}

#endif
