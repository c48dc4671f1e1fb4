/* minimal gsl_rng stub: type + prototypes only (consumers compiled here
 * never call these at runtime) */
#ifndef GSL_SHIM_GSL_RNG_H
#define GSL_SHIM_GSL_RNG_H
#include "gsl_shim_core.h"
#ifdef __cplusplus
extern "C" {
#endif
typedef struct { const char *name; } gsl_rng_type;
typedef struct { const gsl_rng_type *type; void *state; } gsl_rng;
extern const gsl_rng_type *gsl_rng_default;
extern const gsl_rng_type *gsl_rng_taus;
gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_free(gsl_rng *r);
void gsl_rng_set(const gsl_rng *r, unsigned long int s);
double gsl_rng_uniform(const gsl_rng *r);
const gsl_rng_type *gsl_rng_env_setup(void);
#ifdef __cplusplus
}
#endif
#endif
