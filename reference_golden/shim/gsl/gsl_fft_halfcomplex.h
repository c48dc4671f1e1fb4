#ifndef GSL_SHIM_GSL_FFT_HALFCOMPLEX_H
#define GSL_SHIM_GSL_FFT_HALFCOMPLEX_H
#include "gsl_shim_core.h"
#endif
