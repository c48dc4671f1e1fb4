#ifndef GSL_SHIM_GSL_EIGEN_H
#define GSL_SHIM_GSL_EIGEN_H
#include "gsl_shim_core.h"
#endif
