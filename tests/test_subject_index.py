"""Subject-only index: the batched-binary-search primitive must reproduce
the joint-SA matching statistics EXACTLY — (matchlen, unique) at every
query position and pos_s wherever unique.  This is the parity linchpin of
the subject-index path (reference semantics: get_match, src/esa.c:614-624;
uniqueness src/process.c:118)."""

from __future__ import annotations

import numpy as np
import pytest

from andix.esa import joint, matchstats_np, sa_numpy, subject_index
from andix.sequence import Seq, subject_init


def _mutate(base, rate, rng):
    nucl = np.frombuffer(b"ACGT", dtype=np.uint8)
    codes = np.searchsorted(nucl, base)
    hit = rng.random(len(base)) < rate
    return nucl[(codes + np.where(hit, rng.integers(1, 4, len(base)), 0)) % 4]


def _random_seq(n, rng):
    return np.frombuffer(b"ACGT", dtype=np.uint8)[rng.integers(0, 4, n)]


def _joint_stats(rs, query):
    """Oracle: per-query-position stats from the joint-SA machinery."""
    layout = joint.build_block({0: rs}, {1: query})
    sa = sa_numpy.suffix_array(layout.sym)
    lcp = sa_numpy.lcp_array(layout.sym, sa)
    stats = matchstats_np.match_stats_sa_order(layout, sa, lcp, 0)
    isa = matchstats_np.inverse_sa(sa)
    return matchstats_np.extract_query_stats(layout, isa, stats, 1)


def _search_all(idx, query):
    qc = subject_index.query_codes_np(query)
    out = [subject_index.search_np(idx, qc, p) for p in range(len(query))]
    ml = np.array([o[0] for o in out])
    un = np.array([o[1] for o in out])
    ps = np.array([o[2] for o in out])
    return ml, un, ps


def _assert_match(rs, query, cache_k):
    ml_o, un_o, ps_o = _joint_stats(rs, query)
    idx = subject_index.build_subject_index_np(rs, cache_k=cache_k)
    ml, un, ps = _search_all(idx, query)
    np.testing.assert_array_equal(ml, ml_o)
    np.testing.assert_array_equal(un, un_o)
    u = un_o.astype(bool)
    np.testing.assert_array_equal(ps[u], ps_o[u])


class TestSearchOracle:
    @pytest.mark.parametrize("cache_k", [0, 3, 5])
    def test_related_pair(self, cache_k):
        rng = np.random.default_rng(7)
        base = _random_seq(400, rng)
        q = _mutate(base, 0.05, rng)
        rs = subject_init(Seq(base, "s"), 0.025).rs
        _assert_match(rs, q, cache_k)

    @pytest.mark.parametrize("cache_k", [0, 4])
    def test_unrelated_pair(self, cache_k):
        rng = np.random.default_rng(13)
        rs = subject_init(Seq(_random_seq(300, rng), "s"), 0.025).rs
        _assert_match(rs, _random_seq(250, rng), cache_k)

    def test_identical_and_contained(self):
        rng = np.random.default_rng(3)
        base = _random_seq(200, rng)
        rs = subject_init(Seq(base, "s"), 0.025).rs
        _assert_match(rs, base.copy(), 4)  # identical: ml = full suffix
        _assert_match(rs, base[50:150].copy(), 4)

    def test_joined_contigs_and_separators(self):
        """'!' joiner bytes in BOTH subject and query (join mode): byte
        matches across them are legal and must agree with the joint path."""
        rng = np.random.default_rng(23)
        base = _random_seq(300, rng)
        base[80] = ord("!")
        base[200] = ord("!")
        q = _mutate(np.where(base == ord("!"), ord("A"), base), 0.03, rng)
        q[80] = ord("!")
        q[250] = ord("!")
        rs = subject_init(Seq(base, "s"), 0.025).rs
        _assert_match(rs, q, 4)

    def test_low_complexity_repeats(self):
        """Repetitive text: wide cache brackets, deep shared prefixes,
        ties on both bisect sides."""
        rng = np.random.default_rng(5)
        unit = _random_seq(17, rng)
        base = np.tile(unit, 20)[:300]
        q = np.tile(unit, 12)[:180].copy()
        q[::37] = ord("A")
        rs = subject_init(Seq(base, "s"), 0.025).rs
        _assert_match(rs, q, 3)

    def test_tiny_queries_and_edges(self):
        rng = np.random.default_rng(11)
        rs = subject_init(Seq(_random_seq(64, rng), "s"), 0.025).rs
        for qlen in (1, 2, 5):
            _assert_match(rs, _random_seq(qlen, rng), 3)


class TestCache:
    @pytest.mark.parametrize("k", [1, 2, 3, 4])
    def test_cache_counts_exact(self, k):
        """cache[c] must equal the naive count of suffixes below k-mer c,
        on a text containing every symbol class."""
        rng = np.random.default_rng(19)
        base = _random_seq(120, rng)
        base[10] = ord("!")
        base[60] = ord("!")
        rs = subject_init(Seq(base, "s"), 0.025).rs
        sym = np.concatenate(
            [rs.astype(np.int32), [np.int32(joint.SEPARATOR_BASE)]]
        )
        cache = subject_index.build_cache_np(sym, k)
        nucl = [4, 5, 6, 7]  # order codes of A C G T
        codes = subject_index.order_codes_np(sym)
        n = len(sym)
        for c in range(4 ** k):
            pat = [(c >> (2 * (k - 1 - j))) & 3 for j in range(k)]
            pat = np.array([nucl[p] for p in pat], dtype=np.int32)
            cnt = 0
            for i in range(n):
                suf = codes[i : i + k]
                if len(suf) < k:
                    suf = np.concatenate(
                        [suf, np.full(k - len(suf), 9, np.int32)]
                    )
                # lexicographic: suffix < pattern?
                less = False
                for a, b in zip(suf, pat):
                    if a != b:
                        less = a < b
                        break
                cnt += less
            assert cache[c] == cnt, (k, c)
        assert cache[4 ** k] == n

    def test_device_matches_numpy(self):
        jax = pytest.importorskip("jax")
        import jax.numpy as jnp

        rng = np.random.default_rng(29)
        base = _random_seq(500, rng)
        base[100] = ord("!")
        rs = subject_init(Seq(base, "s"), 0.025).rs
        sym = np.concatenate(
            [rs.astype(np.int32), [np.int32(joint.SEPARATOR_BASE)]]
        )
        # pad like the device build does
        padded = np.concatenate(
            [sym, subject_index.PAD_BASE + np.arange(23, dtype=np.int32)]
        )
        for k in (2, 4, 6):
            ref = subject_index.build_cache_np(sym, k)
            codes_d = subject_index.device_order_codes(jnp.asarray(padded))
            got = np.asarray(
                subject_index.build_cache_device(
                    codes_d, jnp.int32(len(sym)), k
                )
            )
            np.testing.assert_array_equal(got, ref)

    def test_pack_words_roundtrip(self):
        jax = pytest.importorskip("jax")
        import jax.numpy as jnp

        rng = np.random.default_rng(31)
        sym = np.concatenate(
            [
                _random_seq(61, rng).astype(np.int32),
                [33, 35, 59, 256, 257],
                subject_index.PAD_BASE + np.arange(62, dtype=np.int32),
            ]
        )
        codes = subject_index.order_codes_np(sym)
        ref = subject_index.pack_words_np(codes)
        got = np.asarray(subject_index.device_pack_words(jnp.asarray(sym)))
        np.testing.assert_array_equal(got, ref)
