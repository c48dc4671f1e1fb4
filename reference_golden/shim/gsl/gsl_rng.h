/* Minimal working gsl_rng (documented GSL API surface; shim policy: see
 * gsl_shim_core.h).  A simple 64-bit LCG stands in for the Tausworthe
 * generator — only SampleFeature::randomize/addWhiteNoise reach it and no
 * golden test depends on a particular random stream. */
#ifndef GSL_SHIM_GSL_RNG_H
#define GSL_SHIM_GSL_RNG_H
#include "gsl_shim_core.h"

typedef struct { const char *name; } gsl_rng_type;
typedef struct { const gsl_rng_type *type; unsigned long long state; } gsl_rng;

static const gsl_rng_type gsl_shim_rng_type_ = {"shim-lcg"};
static const gsl_rng_type *gsl_rng_default = &gsl_shim_rng_type_;
static const gsl_rng_type *gsl_rng_taus = &gsl_shim_rng_type_;

static inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *T) {
  gsl_rng *r = (gsl_rng *)malloc(sizeof(gsl_rng));
  r->type = T;
  r->state = 0x9e3779b97f4a7c15ull;
  return r;
}
static inline void gsl_rng_free(gsl_rng *r) { free(r); }
static inline void gsl_rng_set(gsl_rng *r, unsigned long int s) {
  r->state = 0x9e3779b97f4a7c15ull ^ (unsigned long long)s;
}
static inline double gsl_rng_uniform(gsl_rng *r) {
  r->state = r->state * 6364136223846793005ull + 1442695040888963407ull;
  return (double)((r->state >> 11) & ((1ull << 53) - 1)) / (double)(1ull << 53);
}
static inline const gsl_rng_type *gsl_rng_env_setup(void) {
  return gsl_rng_default;
}

#endif
