#ifndef GSL_SHIM_GSL_SF_TRIG_H
#define GSL_SHIM_GSL_SF_TRIG_H
#include "gsl_shim_core.h"
#endif
