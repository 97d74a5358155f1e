// Suffix sorting via plain prefix doubling with std::sort (oracle use only).
#include "divsufsort.h"
#include <vector>
#include <algorithm>
#include <numeric>

extern "C" int divsufsort(const sauchar_t *T, saidx_t *SA, saidx_t n) {
    if (n <= 0) return 0;
    std::vector<int64_t> rank(n), tmp(n);
    std::vector<saidx_t> sa(n);
    std::iota(sa.begin(), sa.end(), 0);
    for (saidx_t i = 0; i < n; i++) rank[i] = T[i];
    for (int64_t k = 1;; k *= 2) {
        auto key = [&](saidx_t i) {
            int64_t second = (i + k < n) ? rank[i + k] : -1;
            return std::pair<int64_t, int64_t>(rank[i], second);
        };
        std::sort(sa.begin(), sa.end(),
                  [&](saidx_t a, saidx_t b) { return key(a) < key(b); });
        tmp[sa[0]] = 0;
        for (saidx_t t = 1; t < n; t++)
            tmp[sa[t]] = tmp[sa[t - 1]] + (key(sa[t - 1]) < key(sa[t]) ? 1 : 0);
        rank.swap(tmp);
        if (rank[sa[n - 1]] == n - 1) break;
    }
    for (saidx_t t = 0; t < n; t++) SA[t] = sa[t];
    return 0;
}
