#ifndef GSL_SHIM_GSL_RANDIST_H
#define GSL_SHIM_GSL_RANDIST_H
#include "gsl_rng.h"
#ifdef __cplusplus
extern "C" {
#endif
double gsl_ran_gaussian(const gsl_rng *r, double sigma);
double gsl_ran_flat(const gsl_rng *r, double a, double b);
#ifdef __cplusplus
}
#endif
#endif
