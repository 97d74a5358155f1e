/* Minimal GSL RNG stand-in (xoshiro-free: splitmix64) for the test oracle. */
#ifndef SHIM_GSL_RNG_H
#define SHIM_GSL_RNG_H
#include <stdint.h>
#include <stdlib.h>
typedef struct gsl_rng { uint64_t s; } gsl_rng;
typedef struct { int unused; } gsl_rng_type;
static const gsl_rng_type *gsl_rng_default = 0;
static inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *t) {
    (void)t; gsl_rng *r = (gsl_rng*)malloc(sizeof *r); r->s = 88172645463325252ull; return r;
}
static inline void gsl_rng_set(gsl_rng *r, unsigned long seed) {
    /* the reference seeds with time(NULL) (src/andi.c:279, an upstream
       reproducibility TODO); the oracle accepts a fixed seed via env so
       bootstrap stdout can be compared byte-for-byte */
    const char *e = getenv("SHIM_RNG_SEED");
    if (e) seed = strtoul(e, 0, 10);
    r->s = seed ? seed : 1;
}
static inline void gsl_rng_free(gsl_rng *r) { free(r); }
static inline uint64_t shim_next(gsl_rng *r) {
    uint64_t z = (r->s += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
}
static inline double gsl_rng_uniform(gsl_rng *r) {
    return (shim_next(r) >> 11) * (1.0 / 9007199254740992.0);
}
#endif
