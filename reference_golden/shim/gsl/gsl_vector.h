#ifndef GSL_SHIM_GSL_VECTOR_H
#define GSL_SHIM_GSL_VECTOR_H
#include "gsl_shim_core.h"
#endif
