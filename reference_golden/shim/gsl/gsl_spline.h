#ifndef GSL_SHIM_GSL_SPLINE_H
#define GSL_SHIM_GSL_SPLINE_H
#include "gsl_shim_core.h"
#endif
