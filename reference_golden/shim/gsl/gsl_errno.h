#ifndef GSL_SHIM_GSL_ERRNO_H
#define GSL_SHIM_GSL_ERRNO_H
#include "gsl_shim_core.h"
#endif
