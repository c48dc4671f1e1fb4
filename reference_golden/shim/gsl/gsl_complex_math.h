#ifndef GSL_SHIM_GSL_COMPLEX_MATH_H
#define GSL_SHIM_GSL_COMPLEX_MATH_H
#include "gsl_shim_core.h"
#endif
