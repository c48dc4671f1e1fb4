#ifndef GSL_SHIM_GSL_BLAS_H
#define GSL_SHIM_GSL_BLAS_H
#include "gsl_shim_core.h"
#endif
