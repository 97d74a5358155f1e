"""Sequence-layer tests, mirroring reference test/test_seq.c and
test/test_process.c."""

import numpy as np
import pytest

from andix import sequence as sq


def b(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8).copy()


class TestNormalize:
    def test_basic(self):
        out, flag = sq.normalize(b("ACGTACGT"))
        assert out.tobytes() == b"ACGTACGT"
        assert not flag

    def test_lowercase(self):
        out, flag = sq.normalize(b("acgtACGTtgca"))
        assert out.tobytes() == b"ACGTACGTTGCA"
        assert not flag

    def test_junk_stripped_and_flagged(self):
        # reference test_seq.c:42-76: junk is stripped, '!' kept
        out, flag = sq.normalize(b("AC GT\nNN!A-C*G@T"))
        assert out.tobytes() == b"ACGT!ACGT"
        assert flag

    def test_empty(self):
        out, flag = sq.normalize(b(""))
        assert len(out) == 0
        assert not flag


class TestRevcomp:
    def test_subject_layout(self):
        # reference test_seq.c:34-36 asserts exactly this layout
        rs = sq.catcomp(b("ACGTTGCA"))
        assert rs.tobytes() == b"TGCAACGT#ACGTTGCA"

    def test_gc(self):
        assert sq.calc_gc(b("ACGTTGCA")) == 0.5

    def test_bang_revcomps_to_semicolon(self):
        # reference test_seq.c: ';' appears in revcomp of '!'
        rs = sq.catcomp(b("AC!GT"))
        assert rs.tobytes() == b"AC;GT#AC!GT"

    def test_revcomp_involution(self):
        s = b("ACGGTTACGTAC")
        assert sq.revcomp(sq.revcomp(s)).tobytes() == s.tobytes()


class TestJoin:
    def test_join_two(self):
        out = sq.join([b("ACGT"), b("TTTT")])
        assert out.tobytes() == b"ACGT!TTTT"

    def test_join_single_is_identity(self):
        out = sq.join([b("ACGT")])
        assert out.tobytes() == b"ACGT"


class TestAnchorLength:
    def test_min_anchor_is_smallest(self):
        # reference test/test_process.c:16-29: min_anchor_length must be the
        # smallest x with shustring_cum_prob(x) >= 1-p
        for p, g, l in [(0.025, 0.5, 200001), (0.05, 0.4, 1000001),
                        (0.5, 0.6, 10001)]:
            x = sq.min_anchor_length(p, g, l)
            assert sq.shustring_cum_prob(x, g / 2, l) >= 1 - p
            assert sq.shustring_cum_prob(x - 1, g / 2, l) < 1 - p

    def test_threshold_plausible(self):
        # ~10 Mbp subject at default p: smallest x with l*4^-x <= p is ~15
        t = sq.min_anchor_length(0.025, 0.5, 10_000_001)
        assert 12 <= t <= 25

    def test_binomial(self):
        assert sq.binomial_coefficient(10, 3) == 120
        assert sq.binomial_coefficient(0, 0) == 0  # reference n<=0 edge
        assert sq.binomial_coefficient(5, 6) == 0
        assert sq.binomial_coefficient(7, 0) == 1
