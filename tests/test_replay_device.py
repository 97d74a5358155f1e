"""Device replay vs host replay: identical counts on every path."""

import numpy as np
import pytest

from andix import pipeline
from andix.esa.backend_jax import JaxBackend
from andix.runtime import Context, Model
from andix.sequence import Seq


def grid_counts(M, n):
    return np.stack(
        [[M[i][j].counts for j in range(n)] for i in range(n)]
    )


def run_both(seqs, ctx):
    dev = pipeline.calculate_matrix(
        seqs, ctx, JaxBackend(device_replay=True)
    )
    host = pipeline.calculate_matrix(
        seqs, ctx, JaxBackend(device_replay=False)
    )
    n = len(seqs)
    assert (grid_counts(dev, n) == grid_counts(host, n)).all()
    return dev


class TestDeviceReplay:
    def test_mutated_family(self, rng, dna, mutator):
        base = dna(rng, 800)
        seqs = [Seq(base, "g0")] + [
            Seq(mutator(rng, base, r), f"g{k+1}")
            for k, r in enumerate([0.02, 0.05, 0.1, 0.25])
        ]
        run_both(seqs, Context())

    def test_identical_pair(self, rng, dna):
        s = dna(rng, 600)
        run_both([Seq(s, "a"), Seq(s.copy(), "b")], Context())

    def test_unrelated_pair(self, rng, dna):
        run_both([Seq(dna(rng, 500), "a"), Seq(dna(rng, 400), "b")], Context())

    @pytest.mark.parametrize("kind", [Model.LOGDET, Model.ANI])
    def test_exact_count_models(self, rng, dna, mutator, kind):
        base = dna(rng, 500)
        seqs = [Seq(base, "a"), Seq(mutator(rng, base, 0.06), "b")]
        run_both(seqs, Context(model=kind))

    def test_contig_joined(self, rng, dna, mutator):
        from andix.sequence import join

        c1, c2 = dna(rng, 300), dna(rng, 250)
        a = join([c1, c2])
        b = join([mutator(rng, c1, 0.04), mutator(rng, c2, 0.04)])
        run_both([Seq(a, "a"), Seq(b, "b")], Context())

    def test_repetitive(self, rng):
        rep = np.frombuffer(b"ACGTACGTAA" * 60, np.uint8).copy()
        tail = np.frombuffer(b"GGCCTTAAGC" * 30, np.uint8).copy()
        s1 = np.concatenate([rep, tail])
        s2 = np.concatenate([rep[7:], tail])
        run_both([Seq(s1, "a"), Seq(s2, "b")], Context())

    def test_blocked_schedule(self, rng, dna, mutator):
        base = dna(rng, 400)
        seqs = [Seq(base, "g0")] + [
            Seq(mutator(rng, base, 0.05), f"g{k+1}") for k in range(3)
        ]
        ctx = Context()
        one = pipeline.calculate_matrix(seqs, ctx, JaxBackend())
        blk = pipeline.calculate_matrix(
            seqs, ctx, JaxBackend(), block_syms=2200
        )
        n = len(seqs)
        assert (grid_counts(one, n) == grid_counts(blk, n)).all()

    @pytest.mark.parametrize("kind", [Model.JC, Model.LOGDET])
    def test_events_path_equals_loop_path(self, rng, dna, mutator, kind,
                                          monkeypatch):
        # the anchor-event chain walk + host counting must reproduce the
        # count-in-loop device replay exactly, per model-exactness mode
        base = dna(rng, 700)
        seqs = [Seq(base, "g0")] + [
            Seq(mutator(rng, base, r), f"g{k+1}")
            for k, r in enumerate([0.004, 0.05, 0.2])
        ]
        ctx = Context(model=kind)
        monkeypatch.setenv("ANDIX_REPLAY", "events")
        ev = pipeline.calculate_matrix(seqs, ctx, JaxBackend())
        monkeypatch.setenv("ANDIX_REPLAY", "loop")
        lp = pipeline.calculate_matrix(seqs, ctx, JaxBackend())
        n = len(seqs)
        assert (grid_counts(ev, n) == grid_counts(lp, n)).all()

    def test_split_tables_path_equals_fused(self, rng, dna, mutator,
                                            monkeypatch):
        # per-subject table builds + separate chain walk (the big-block
        # HBM-safe path) must equal the fused dispatch exactly
        base = dna(rng, 700)
        seqs = [Seq(base, "g0")] + [
            Seq(mutator(rng, base, r), f"g{k+1}")
            for k, r in enumerate([0.01, 0.08])
        ]
        ctx = Context()
        fused = pipeline.calculate_matrix(seqs, ctx, JaxBackend())
        monkeypatch.setenv("ANDIX_SPLIT_TABLES_MIN", "1")
        split = pipeline.calculate_matrix(seqs, ctx, JaxBackend())
        assert (grid_counts(fused, 3) == grid_counts(split, 3)).all()

    def test_event_overflow_falls_back_to_loop(self, rng, dna, mutator,
                                               monkeypatch):
        # a too-small event buffer must flag overflow and reroute to the
        # count-in-loop path with identical output
        base = dna(rng, 600)
        seqs = [Seq(base, "g0"), Seq(mutator(rng, base, 0.01), "g1")]
        ctx = Context()
        want = pipeline.calculate_matrix(seqs, ctx, pipeline.NumpyBackend())
        monkeypatch.setenv("ANDIX_EVENT_CAP", "4")  # ~every lane overflows
        got = pipeline.calculate_matrix(seqs, ctx, JaxBackend())
        assert (grid_counts(got, 2) == grid_counts(want, 2)).all()

    def test_events_python_fallback_matches_native(self, rng, dna, mutator):
        # group_counts_from_events: python path == native C++ path
        from andix import native
        from andix.chain import events as chain_events
        from andix.runtime import Model as MK

        if not native.available():
            pytest.skip("native lib unavailable")
        E = 200
        ev_lane = rng.integers(0, 4, E).astype(np.int32)
        q = np.sort(rng.integers(0, 500, E)).astype(np.int32)
        ev_q, ev_s, ev_len = q, (q + 3).astype(np.int32), rng.integers(
            10, 40, E
        ).astype(np.int32)
        rs = dna(rng, 1200)
        blob = dna(rng, 1000)
        q_off = np.array([0, 500, 1000], dtype=np.int64)
        args = (ev_lane, ev_q, ev_s, ev_len, 2, 2, [rs, rs], [14, 14],
                blob, q_off, MK.JC, 0)
        got = chain_events.group_counts_from_events(*args)
        native_fn = native.count_from_anchors_batch
        try:
            # force the python path by hiding the native symbol
            del native.count_from_anchors_batch
            want = chain_events.group_counts_from_events(*args)
        finally:
            native.count_from_anchors_batch = native_fn
        assert (got == want).all()

    def test_many_seeds_vs_numpy_backend(self, dna, mutator):
        # fuzz: several seeds, compare full grids against the numpy backend
        for seed in range(5):
            rng = np.random.default_rng(1000 + seed)
            base = dna(rng, 300)
            seqs = [
                Seq(base, "g0"),
                Seq(mutator(rng, base, 0.08), "g1"),
                Seq(mutator(rng, base, 0.18), "g2"),
            ]
            ctx = Context()
            dev = pipeline.calculate_matrix(seqs, ctx, JaxBackend())
            ref = pipeline.calculate_matrix(seqs, ctx, pipeline.NumpyBackend())
            assert (grid_counts(dev, 3) == grid_counts(ref, 3)).all(), seed
