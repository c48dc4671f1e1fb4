#ifndef GSL_SHIM_GSL_PERMUTATION_H
#define GSL_SHIM_GSL_PERMUTATION_H
#include "gsl_shim_core.h"
#endif
