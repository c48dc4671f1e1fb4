#ifndef GSL_SHIM_GSL_MATRIX_H
#define GSL_SHIM_GSL_MATRIX_H
#include "gsl_shim_core.h"
#endif
