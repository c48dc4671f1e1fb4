#ifndef GSL_SHIM_GSL_BLOCK_H
#define GSL_SHIM_GSL_BLOCK_H
#include "gsl_shim_core.h"
#endif
