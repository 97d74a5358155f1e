/* Minimal divsufsort-compatible API backed by a from-scratch doubling sort
 * (test oracle only; NOT the divsufsort algorithm). */
#ifndef SHIM_DIVSUFSORT_H
#define SHIM_DIVSUFSORT_H
#include <stdint.h>
typedef int32_t saidx_t;
typedef uint8_t sauchar_t;
#ifdef __cplusplus
extern "C" {
#endif
int divsufsort(const sauchar_t *T, saidx_t *SA, saidx_t n);
#ifdef __cplusplus
}
#endif
#endif
