"""Statistical accuracy tests: estimate vs simulated divergence.

Reference strategy: test/test_random.sh generates mutated pairs and asserts
the estimate is close to the target divergence.  Sizes here are scaled to
unit-test budgets (50 kb vs the reference's 100 kb); tolerances match the
reference envelope (|est-d| <= 0.055 and <= 5.5% relative is the reference's
gate at 100 kb — we allow slightly wider at half the length)."""

import math

import numpy as np
import pytest

from andix import model as mm
from andix import pipeline
from andix.runtime import Context, Model
from andix.sequence import Seq


def jc_pair_distance(seqs, ctx):
    M = pipeline.calculate_matrix(seqs, ctx)
    avg = mm.model_average(M[0][1], M[1][0])
    return mm.estimate(avg, ctx.model)


@pytest.mark.parametrize("d", [0.0, 0.01, 0.05, 0.1, 0.2])
def test_jc_estimate_tracks_truth(rng, dna, mutator, d):
    length = 50_000
    # convert JC distance to raw substitution probability
    # (reference test/test_fasta.cxx:49-55)
    p = 0.75 - 0.75 * math.exp(-4.0 / 3.0 * d)
    base = dna(rng, length)
    other = mutator(rng, base, p) if p > 0 else base.copy()
    est = jc_pair_distance([Seq(base, "a"), Seq(other, "b")], Context())
    assert not math.isnan(est)
    assert abs(est - d) <= max(0.055, 0.075 * d) + 1e-9


@pytest.mark.parametrize("d", [0.01, 0.1])
def test_raw_estimate_tracks_truth(rng, dna, mutator, d):
    length = 50_000
    base = dna(rng, length)
    other = mutator(rng, base, d)
    ctx = Context(model=Model.RAW)
    est = jc_pair_distance([Seq(base, "a"), Seq(other, "b")], ctx)
    assert abs(est - d) <= max(0.055, 0.075 * d)


def test_unrelated_is_nan(rng, dna):
    est = jc_pair_distance(
        [Seq(dna(rng, 20_000), "a"), Seq(dna(rng, 20_000), "b")], Context()
    )
    assert math.isnan(est)
