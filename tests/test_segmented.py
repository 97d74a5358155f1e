"""Segment-parallel chain walk (andix.chain.segmented) equivalence tests.

The segmented walk must reproduce the unsegmented event walk's anchor
stream EXACTLY — the reconciliation argument (see the module docstring:
chain state is (pos, qend, diag); identical anchors force identical
post-state) is exercised here under adversarial budgets: single-event
repair budgets force continuations, tiny chunk iteration caps force
resumption mid-segment, and K beyond the lane count forces empty segments.
"""

from __future__ import annotations

import numpy as np
import pytest

from andix import pipeline
from andix.runtime import Context
from andix.sequence import Seq

jax = pytest.importorskip("jax")

NUCL = np.frombuffer(b"ACGT", dtype=np.uint8)


def _family(n, length, rates, seed):
    r = np.random.default_rng(seed)
    base = NUCL[r.integers(0, 4, length)]
    seqs = [Seq(base, "g0")]
    for k in range(n - 1):
        rate = rates[k % len(rates)]
        codes = np.searchsorted(NUCL, base)
        hit = r.random(length) < rate
        seqs.append(
            Seq(
                NUCL[
                    (codes + np.where(hit, r.integers(1, 4, length), 0)) % 4
                ],
                f"g{k+1}",
            )
        )
    return seqs


def _grids_equal(a, b, n):
    for i in range(n):
        for j in range(n):
            if (a[i][j].counts != b[i][j].counts).any():
                return False
    return True


@pytest.fixture
def jax_backend():
    from andix.esa.backend_jax import JaxBackend

    return JaxBackend()


class TestSegmentedEquivalence:
    def _run(self, monkeypatch, seqs, backend, k, chunk=None, repev=None):
        from andix.chain import segmented

        monkeypatch.setenv("ANDIX_CHAIN_SEGMENTS", str(k))
        if chunk is not None:
            monkeypatch.setattr(segmented, "CHUNK_ITERS", chunk)
        if repev is not None:
            monkeypatch.setattr(segmented, "REPAIR_EVENTS", repev)
        return pipeline.calculate_matrix(seqs, Context(), backend=backend)

    def test_matches_numpy_backend(self, monkeypatch, jax_backend):
        """Mixed family: close, mid, diverged, unrelated, and duplicate
        genomes — the duplicate exercises the identical-sequence jump over
        every later segment, the unrelated one the anchor-free sequential
        fallback."""
        seqs = _family(5, 5000, [0.005, 0.05, 0.2, 0.45], seed=11)
        seqs.append(Seq(seqs[0].data.copy(), "dup"))
        ref = pipeline.calculate_matrix(seqs, Context())
        got = self._run(monkeypatch, seqs, jax_backend, k=6)
        assert _grids_equal(got, ref, len(seqs))

    def test_adversarial_budgets(self, monkeypatch, jax_backend):
        """Single-event repair budgets + 16-iteration chunks force every
        continuation/extension path in the resolve loop."""
        seqs = _family(4, 3000, [0.01, 0.12, 0.4], seed=23)
        ref = pipeline.calculate_matrix(seqs, Context())
        got = self._run(
            monkeypatch, seqs, jax_backend, k=16, chunk=16, repev=1
        )
        assert _grids_equal(got, ref, len(seqs))

    def test_k_exceeds_query_length_granularity(
        self, monkeypatch, jax_backend
    ):
        seqs = _family(3, 700, [0.03, 0.25], seed=5)
        ref = pipeline.calculate_matrix(seqs, Context())
        got = self._run(monkeypatch, seqs, jax_backend, k=64)
        assert _grids_equal(got, ref, len(seqs))

    def test_nonconvergence_falls_back_soft(self, monkeypatch, jax_backend):
        """A resolve loop that never converges must return None (the
        event-overflow contract) so the backend falls back to the
        unsegmented walk — not crash (VERDICT r4 weak #3).  Force it by
        making _find_merge always miss: repairs then never splice and the
        guard trips."""
        from andix.chain import segmented

        seqs = _family(3, 3000, [0.02, 0.1], seed=7)
        ref = pipeline.calculate_matrix(seqs, Context())
        monkeypatch.setattr(
            segmented, "_find_merge", lambda rep, cold: None
        )
        monkeypatch.setattr(segmented, "MAX_EXTENSIONS", 10**9)
        got = self._run(monkeypatch, seqs, jax_backend, k=4, repev=1)
        assert _grids_equal(got, ref, len(seqs))


    def test_split_tables_under_segmented(self, monkeypatch, jax_backend):
        """Big-block per-subject table builds (fused build+row-write
        programs, ANDIX_SPLIT_TABLES_MIN=1) under the segmented walk must
        match the oracle."""
        seqs = _family(4, 3000, [0.02, 0.1, 0.3], seed=47)
        ref = pipeline.calculate_matrix(seqs, Context())
        monkeypatch.setenv("ANDIX_SPLIT_TABLES_MIN", "1")
        monkeypatch.setenv("ANDIX_INDEX", "joint")
        got = self._run(monkeypatch, seqs, jax_backend, k=4)
        assert _grids_equal(got, ref, len(seqs))

    def test_joined_contigs(self, monkeypatch, jax_backend):
        """Multi-contig genomes ('!' joiner bytes in the sequence data,
        sequence.py join semantics) under the segmented walk."""
        seqs = _family(3, 4000, [0.02, 0.1], seed=31)
        joined = []
        for s in seqs:
            d = s.data.copy()
            d[1500] = ord("!")
            d[2800] = ord("!")
            joined.append(Seq(d, s.name))
        ref = pipeline.calculate_matrix(joined, Context())
        got = self._run(monkeypatch, joined, jax_backend, k=5)
        assert _grids_equal(got, ref, len(joined))


class TestFlatKernelUnit:
    def test_flat_k1_matches_grid_kernel(self, monkeypatch):
        """chain_walk_flat with one full-lane segment per pair reproduces
        chain_anchors_device's event stream verbatim."""
        import jax.numpy as jnp

        from andix.chain.replay_device import (
            chain_anchors_device,
            chain_walk_flat,
            group_subject_tables,
        )
        from andix.esa import joint
        from andix.esa.backend_jax import JaxBackend
        from andix.sequence import subject_init

        seqs = _family(3, 2500, [0.04, 0.35], seed=3)
        pv = Context().anchor_p_value
        subjects = [subject_init(s, pv) for s in seqs]
        be = JaxBackend()
        layout = joint.build_block(
            {i: subjects[i].rs for i in range(3)}, {}
        )
        ctx = be.prepare_block(layout)
        sg, gp, segs, starts, rs_lens, thresholds, q_len2d = (
            be._group_tables(ctx, [0, 1, 2], dict(enumerate(subjects)))
        )
        mlun, ps, jump = group_subject_tables(
            ctx.sa_d, ctx.lcp_d, ctx.segid_d, ctx.tq_d,
            jnp.asarray(segs), jnp.asarray(starts),
            jnp.asarray(thresholds), 0,
        )
        ecap = 1 << 15
        ev = chain_anchors_device(
            ctx.isa_d, ctx.rm, mlun, ps, jump,
            jnp.asarray(starts), jnp.asarray(rs_lens),
            jnp.asarray(thresholds),
            ctx.q_base_d, ctx.q_start_d, jnp.asarray(q_len2d),
            ecap, unroll=4,
        )
        cnt = int(ev[4])
        assert not bool(ev[5])
        ref = np.asarray(
            jax.device_get(jnp.stack([e[:cnt] for e in ev[:4]]))
        )

        qb = ctx.tq_d.shape[0]
        lanes = [
            (s, g)
            for s in range(sg)
            for g in range(gp)
            if q_len2d[s, g] > 0
        ]
        lb = 16
        arr = {
            n: np.zeros(lb, np.int32)
            for n in ("row", "qoff", "qs", "ss", "rl", "thr",
                      "seg_end", "pos0", "lq0", "ls0", "ll0")
        }
        arr["rl"][:] = 1
        arr["thr"][:] = 1 << 29
        for i, (s, g) in enumerate(lanes):
            arr["row"][i] = s
            arr["qoff"][i] = ctx.q_base_h[g]
            arr["qs"][i] = ctx.q_start_h[g]
            arr["ss"][i] = starts[s]
            arr["rl"][i] = rs_lens[s]
            arr["thr"][i] = thresholds[s]
            arr["seg_end"][i] = q_len2d[s, g]
        out = chain_walk_flat(
            ctx.isa_d, ctx.rm, mlun, ps,
            *(jnp.asarray(arr[n]) for n in
              ("row", "qoff", "qs", "ss", "rl", "thr", "seg_end",
               "pos0", "lq0", "ls0", "ll0")),
            jnp.int32(1 << 28), jnp.int32(1 << 28), ecap, 12, 4,
        )
        fcnt = int(out[4])
        assert not bool(out[5])
        flat = np.asarray(
            jax.device_get(jnp.stack([e[:fcnt] for e in out[:4]]))
        )
        for i, (s, g) in enumerate(lanes):
            rsel = ref[1:, ref[0] == s * gp + g]
            fsel = flat[1:, flat[0] == i]
            assert rsel.shape == fsel.shape
            assert (rsel == fsel).all()
