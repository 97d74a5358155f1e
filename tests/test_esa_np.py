"""ESA backend tests: suffix array, LCP, matching statistics vs brute force.

Mirrors the reference's cached-vs-uncached oracle strategy
(test/test_esa.c:38-44,172-192): the fast path must agree with a slow exact
computation on random and adversarial inputs.
"""

import numpy as np
import pytest

from andix.esa import joint, matchstats_np, sa_numpy
from andix.oracle import match_stats_brute
from andix.sequence import catcomp


def naive_sa(sym):
    order = sorted(range(len(sym)), key=lambda i: list(sym[i:]))
    return np.asarray(order, dtype=np.int32)


def naive_lcp(sym, sa):
    n = len(sa)
    out = np.zeros(n, dtype=np.int64)
    for t in range(1, n):
        a, z = sym[sa[t - 1]:], sym[sa[t]:]
        h = 0
        while h < len(a) and h < len(z) and a[h] == z[h]:
            h += 1
        out[t] = h
    return out


class TestSuffixArray:
    @pytest.mark.parametrize("n", [1, 2, 7, 50, 300])
    def test_random_vs_naive(self, rng, n):
        sym = rng.integers(0, 5, n).astype(np.int32)
        assert (sa_numpy.suffix_array(sym) == naive_sa(sym)).all()

    def test_repetitive(self):
        sym = np.frombuffer(b"ABABABABABAB", dtype=np.uint8).astype(np.int32)
        assert (sa_numpy.suffix_array(sym) == naive_sa(sym)).all()

    def test_all_equal(self):
        sym = np.full(37, 65, dtype=np.int32)
        assert (sa_numpy.suffix_array(sym) == naive_sa(sym)).all()

    def test_lcp_random(self, rng):
        sym = rng.integers(0, 4, 200).astype(np.int32)
        sa = sa_numpy.suffix_array(sym)
        assert (sa_numpy.lcp_array(sym, sa) == naive_lcp(sym, sa)).all()


class TestSegmentedScan:
    def test_vs_reference_loop(self, rng):
        n = 5000
        vals = rng.integers(0, 100, n)
        resets = rng.random(n) < 0.05
        got = matchstats_np.segmented_min_scan(vals, resets, block=64)
        cur = np.int64(2**62)
        for t in range(n):
            cur = vals[t] if resets[t] else min(cur, vals[t])
            assert got[t] == cur


def _block_for_pair(rs, q):
    layout = joint.build_block({0: rs}, {1: q})
    sa = sa_numpy.suffix_array(layout.sym)
    lcp = sa_numpy.lcp_array(layout.sym, sa)
    return layout, sa, lcp


class TestMatchStats:
    def check_pair(self, rs, q):
        layout, sa, lcp = _block_for_pair(rs, q)
        stats = matchstats_np.match_stats_sa_order(layout, sa, lcp, 0)
        isa = matchstats_np.inverse_sa(sa)
        ml, un, ps = matchstats_np.extract_query_stats(layout, isa, stats, 1)
        bml, bun, bps = match_stats_brute(rs, q)
        assert (ml == bml).all(), np.nonzero(ml != bml)
        assert (un == bun).all(), np.nonzero(un != bun)
        # pos_s compared only where unique (reference only consumes it there)
        sel = bun
        assert (ps[sel] == bps[sel]).all()

    def test_random_pair(self, rng, dna, mutator):
        s1 = dna(rng, 300)
        s2 = mutator(rng, s1, 0.1)
        self.check_pair(catcomp(s1), s2)

    def test_unrelated(self, rng, dna):
        self.check_pair(catcomp(dna(rng, 200)), dna(rng, 150))

    def test_identical(self, rng, dna):
        s = dna(rng, 120)
        self.check_pair(catcomp(s), s.copy())

    def test_with_contig_joiners(self, rng, dna, mutator):
        from andix.sequence import join

        a1, a2 = dna(rng, 100), dna(rng, 80)
        j1 = join([a1, a2])
        j2 = join([mutator(rng, a1, 0.05), mutator(rng, a2, 0.05)])
        self.check_pair(catcomp(j1), j2)

    def test_low_complexity(self, rng):
        # repeats stress uniqueness logic
        s1 = np.frombuffer(b"ACGT" * 40 + b"GGGGCCCC" * 5, np.uint8).copy()
        s2 = np.frombuffer(b"ACGT" * 35 + b"GGGGCCCC" * 7, np.uint8).copy()
        self.check_pair(catcomp(s1), s2)

    def test_multi_subject_block(self, rng, dna, mutator):
        # one block with two subjects + one query-only genome: stats for each
        # subject must match the single-pair computation
        s0 = dna(rng, 150)
        s1 = mutator(rng, s0, 0.1)
        s2 = mutator(rng, s0, 0.2)
        rs0, rs1 = catcomp(s0), catcomp(s1)
        layout = joint.build_block({0: rs0, 1: rs1}, {2: s2})
        sa = sa_numpy.suffix_array(layout.sym)
        lcp = sa_numpy.lcp_array(layout.sym, sa)
        isa = matchstats_np.inverse_sa(sa)
        for subj, rs in ((0, rs0), (1, rs1)):
            stats = matchstats_np.match_stats_sa_order(layout, sa, lcp, subj)
            for qg, qseq in ((0, s0), (1, s1), (2, s2)):
                if qg == subj:
                    continue
                ml, un, ps = matchstats_np.extract_query_stats(
                    layout, isa, stats, qg
                )
                bml, bun, bps = match_stats_brute(rs, qseq)
                assert (ml == bml).all()
                assert (un == bun).all()
                assert (ps[bun] == bps[bun]).all()
