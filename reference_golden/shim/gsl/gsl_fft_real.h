#ifndef GSL_SHIM_GSL_FFT_REAL_H
#define GSL_SHIM_GSL_FFT_REAL_H
#include "gsl_shim_core.h"
#endif
