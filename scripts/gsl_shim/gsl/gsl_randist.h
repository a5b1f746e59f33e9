/* Minimal GSL RNG shim: exact gsl_rng_rand48 semantics (48-bit LCG, `get`
 * returns the top 32 state bits; uniform_int scales range/n with rejection;
 * bernoulli compares rand48_get_double).  Mirrors utils/rand48.py. */
#ifndef GSL_SHIM_RANDIST_H
#define GSL_SHIM_RANDIST_H
#include <cstdint>
#include <cstdlib>

typedef struct gsl_rng_type_s { int dummy; } gsl_rng_type;
static const gsl_rng_type gsl_rng_rand48_type = {0};
#define gsl_rng_rand48 (&gsl_rng_rand48_type)

typedef struct gsl_rng_s {
  uint64_t x; /* 48-bit state */
} gsl_rng;

static inline gsl_rng* gsl_rng_alloc(const gsl_rng_type*) {
  gsl_rng* r = (gsl_rng*)malloc(sizeof(gsl_rng));
  r->x = ((uint64_t)0x1234 << 32) | ((uint64_t)0xABCD << 16) | 0x330E;
  return r;
}

static inline void gsl_rng_set(gsl_rng* r, unsigned long s) {
  uint32_t seed = (uint32_t)s;
  if (seed == 0) {
    r->x = ((uint64_t)0x1234 << 32) | ((uint64_t)0xABCD << 16) | 0x330E;
  } else {
    r->x = ((uint64_t)((seed >> 16) & 0xFFFF) << 32)
         | ((uint64_t)(seed & 0xFFFF) << 16) | 0x330E;
  }
}

static inline void gsl_rng_shim_advance_(gsl_rng* r) {
  r->x = (0x5DEECE66DULL * r->x + 0xBULL) & 0xFFFFFFFFFFFFULL;
}

static inline unsigned long gsl_rng_get(gsl_rng* r) {
  gsl_rng_shim_advance_(r);
  return (unsigned long)((r->x >> 16) & 0xFFFFFFFFULL);
}

static inline unsigned long gsl_rng_uniform_int(gsl_rng* r, unsigned long n) {
  unsigned long scale = 0xFFFFFFFFUL / n;
  unsigned long k;
  do { k = gsl_rng_get(r) / scale; } while (k >= n);
  return k;
}

static inline double gsl_rng_uniform(gsl_rng* r) {
  gsl_rng_shim_advance_(r);
  return (double)r->x / 281474976710656.0; /* 2^48 */
}

static inline unsigned int gsl_ran_bernoulli(gsl_rng* r, double p) {
  return gsl_rng_uniform(r) < p ? 1u : 0u;
}

#endif
