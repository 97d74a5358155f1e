/* Minimal multinomial via conditional binomials (inverse-CDF binomial). */
#ifndef SHIM_GSL_RANDIST_H
#define SHIM_GSL_RANDIST_H
#include "gsl_rng.h"
#include <math.h>
static inline unsigned int shim_binomial(gsl_rng *r, double p, unsigned int n) {
    /* simple inversion by repeated Bernoulli for small n, else normal approx
       refined; oracle-quality only */
    if (p <= 0) return 0;
    if (p >= 1) return n;
    unsigned int k = 0;
    if (n < 64) {
        for (unsigned int i = 0; i < n; i++)
            if (gsl_rng_uniform(r) < p) k++;
        return k;
    }
    /* BTRS-free: sum of chunked binomials via recursion; sequence the
       calls explicitly (operand evaluation order of + is unspecified) */
    unsigned int half = n / 2;
    unsigned int lo = shim_binomial(r, p, half);
    return lo + shim_binomial(r, p, n - half);
}
static inline void gsl_ran_multinomial(gsl_rng *r, size_t K, unsigned int N,
                                       const double p[], unsigned int n[]) {
    double norm = 0; size_t i;
    for (i = 0; i < K; i++) norm += p[i];
    double rest = norm; unsigned int left = N;
    for (i = 0; i < K; i++) {
        if (p[i] > 0 && rest > 0)
            n[i] = shim_binomial(r, p[i] / rest, left);
        else
            n[i] = 0;
        left -= n[i];
        rest -= p[i];
    }
}
#endif
