"""RangeMin structure vs brute force."""

import numpy as np
import jax.numpy as jnp

from andix.esa import rmq


def brute(vals, lo, hi):
    if lo > hi:
        return 2**31 - 1
    return int(vals[lo : hi + 1].min())


import pytest


class TestRangeMin:
    @pytest.mark.parametrize("small_spans", [True, False])
    def test_exhaustive_small(self, rng, small_spans):
        """Both variants: with the tsm element-span rows, and the
        huge-block build that drops them (same-fine-block queries via
        the masked 8-min fallback)."""
        n = 200
        vals = rng.integers(0, 50, n).astype(np.int32)
        rm = rmq.build(jnp.asarray(vals), small_spans)
        assert (rm.tsm is None) == (not small_spans)
        los, his = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        los, his = los.ravel(), his.ravel()
        got = np.asarray(rmq.range_min(rm, jnp.asarray(los), jnp.asarray(his)))
        for lo, hi, g in zip(los, his, got):
            assert g == brute(vals, lo, hi), (lo, hi)

    def test_random_large(self, rng):
        n = 40_000
        vals = rng.integers(0, 10**6, n).astype(np.int32)
        rm = rmq.build(jnp.asarray(vals))
        los = rng.integers(0, n, 3000)
        spans = np.unique(
            np.concatenate(
                [np.arange(20), 2 ** np.arange(15), rng.integers(0, n, 50)]
            )
        )
        for span in spans:
            hi = np.minimum(los + span, n - 1)
            got = np.asarray(
                rmq.range_min(rm, jnp.asarray(los), jnp.asarray(hi))
            )
            want = np.array([brute(vals, int(l), int(h)) for l, h in zip(los, hi)])
            assert (got == want).all(), span

    def test_single_element_ranges(self, rng):
        n = 1000
        vals = rng.integers(0, 100, n).astype(np.int32)
        rm = rmq.build(jnp.asarray(vals))
        idx = np.arange(n)
        got = np.asarray(rmq.range_min(rm, jnp.asarray(idx), jnp.asarray(idx)))
        assert (got == vals).all()

    def test_empty_range_is_inf(self, rng):
        vals = rng.integers(0, 100, 100).astype(np.int32)
        rm = rmq.build(jnp.asarray(vals))
        got = int(rmq.range_min(rm, jnp.int32(5), jnp.int32(4)))
        assert got == 2**31 - 1
