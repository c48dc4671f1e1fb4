/* gsl_sf_result — documented GSL special-function result pair. */
#ifndef GSL_SHIM_SF_RESULT_H
#define GSL_SHIM_SF_RESULT_H

typedef struct {
  double val;
  double err;
} gsl_sf_result;

#endif
