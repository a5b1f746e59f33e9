/* Minimal GSL shim for building the reference out-of-tree (no GSL in image).
 * Provides exactly the symbols the reference uses (coding.cpp:1,
 * compress*_test.cpp).  lnchoose via libm lgamma — identical formula to the
 * framework's entropy.lnchoose, so goldens and framework share numerics
 * (DEVIATIONS.md item 7). */
#ifndef GSL_SHIM_SF_GAMMA_H
#define GSL_SHIM_SF_GAMMA_H
#include <cmath>

static inline double gsl_sf_lnchoose(unsigned int n, unsigned int m) {
  if (m == n || m == 0) return 0.0;
  return lgamma((double)n + 1.0) - lgamma((double)m + 1.0)
       - lgamma((double)(n - m) + 1.0);
}

#endif
