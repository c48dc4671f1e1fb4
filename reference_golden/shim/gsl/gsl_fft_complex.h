#ifndef GSL_SHIM_GSL_FFT_COMPLEX_H
#define GSL_SHIM_GSL_FFT_COMPLEX_H
#include "gsl_shim_core.h"
#endif
