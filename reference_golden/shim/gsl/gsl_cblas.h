#ifndef GSL_SHIM_GSL_CBLAS_H
#define GSL_SHIM_GSL_CBLAS_H
#include "gsl_shim_core.h"
#endif
