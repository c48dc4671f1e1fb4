#ifndef GSL_SHIM_GSL_LINALG_H
#define GSL_SHIM_GSL_LINALG_H
#include "gsl_shim_core.h"
#endif
