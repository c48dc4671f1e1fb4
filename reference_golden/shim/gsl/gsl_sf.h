/* Umbrella special-function header (documented GSL layout). */
#ifndef GSL_SHIM_SF_H
#define GSL_SHIM_SF_H

#include "gsl/gsl_sf_result.h"
#include "gsl/gsl_sf_bessel.h"
#include "gsl/gsl_sf_gamma.h"
#include "gsl/gsl_sf_hyperg.h"
#include "gsl/gsl_sf_legendre.h"
#include "gsl/gsl_sf_trig.h"

#endif
