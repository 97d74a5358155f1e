"""Subject-index schedule (ANDIX_INDEX=subject): matrices must be
bit-identical to the NumPy joint-SA oracle across family shapes — the
schedule-equivalence invariant every andix path obeys (reference
low-memory diff test, test/test_extra.sh:19-22)."""

from __future__ import annotations

import numpy as np
import pytest

from andix import pipeline
from andix.runtime import Context, Model
from andix.sequence import Seq

jax = pytest.importorskip("jax")


def _family(n, length, rates, seed):
    rng = np.random.default_rng(seed)
    nucl = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = nucl[rng.integers(0, 4, length)]
    seqs = [Seq(base, "g0")]
    for k in range(1, n):
        rate = rates[(k - 1) % len(rates)]
        codes = np.searchsorted(nucl, base)
        hit = rng.random(length) < rate
        mut = nucl[(codes + np.where(hit, rng.integers(1, 4, length), 0)) % 4]
        seqs.append(Seq(mut, f"g{k}"))
    return seqs


def _grids_equal(a, b, n):
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if not np.array_equal(a[i][j].counts, b[i][j].counts):
                return False
            if a[i][j].seq_len != b[i][j].seq_len:
                return False
    return True


@pytest.fixture()
def jax_backend():
    from andix.esa.backend_jax import JaxBackend

    return JaxBackend()


class TestSubjectIndexEquivalence:
    def _run(self, monkeypatch, seqs, backend, ctx=None, segs=None,
             chunk=None, cache_k=None):
        from andix.chain import segmented

        monkeypatch.setenv("ANDIX_INDEX", "subject")
        if segs is not None:
            monkeypatch.setenv("ANDIX_CHAIN_SEGMENTS", str(segs))
        if chunk is not None:
            monkeypatch.setattr(segmented, "CHUNK_ITERS", chunk)
        if cache_k is not None:
            monkeypatch.setenv("ANDIX_CACHE_K", str(cache_k))
        return pipeline.calculate_matrix(
            seqs, ctx or Context(), backend=backend
        )

    def test_mixed_family(self, monkeypatch, jax_backend):
        """Close, mid, diverged, unrelated, and duplicate genomes."""
        seqs = _family(5, 5000, [0.005, 0.05, 0.2, 0.45], seed=11)
        seqs.append(Seq(seqs[0].data.copy(), "dup"))
        ref = pipeline.calculate_matrix(seqs, Context())
        got = self._run(monkeypatch, seqs, jax_backend, segs=6)
        assert _grids_equal(got, ref, len(seqs))

    def test_unsegmented(self, monkeypatch, jax_backend):
        seqs = _family(3, 3000, [0.02, 0.3], seed=5)
        ref = pipeline.calculate_matrix(seqs, Context())
        got = self._run(monkeypatch, seqs, jax_backend, segs=1)
        assert _grids_equal(got, ref, len(seqs))

    def test_small_cache_and_chunks(self, monkeypatch, jax_backend):
        """Tiny cache k (wide brackets) + 16-iteration chunks exercise the
        full bisect and the resumable-chunk machinery."""
        seqs = _family(4, 2500, [0.01, 0.12, 0.4], seed=23)
        ref = pipeline.calculate_matrix(seqs, Context())
        got = self._run(
            monkeypatch, seqs, jax_backend, segs=8, chunk=16, cache_k=2
        )
        assert _grids_equal(got, ref, len(seqs))

    def test_joined_contigs(self, monkeypatch, jax_backend):
        seqs = _family(3, 4000, [0.02, 0.1], seed=31)
        joined = []
        for s in seqs:
            d = s.data.copy()
            d[1500] = ord("!")
            d[2800] = ord("!")
            joined.append(Seq(d, s.name))
        ref = pipeline.calculate_matrix(joined, Context())
        got = self._run(monkeypatch, joined, jax_backend, segs=5)
        assert _grids_equal(got, ref, len(joined))

    def test_low_memory_groups(self, monkeypatch, jax_backend):
        """low-memory mode = single-subject index groups, same output."""
        seqs = _family(4, 2000, [0.03, 0.15], seed=41)
        ref = pipeline.calculate_matrix(seqs, Context())
        ctx = Context()
        ctx.low_memory = True
        got = self._run(monkeypatch, seqs, jax_backend, ctx=ctx, segs=4)
        assert _grids_equal(got, ref, len(seqs))

    def test_exact_models(self, monkeypatch, jax_backend):
        """LogDet takes the exact equal-count path in the host counting."""
        seqs = _family(3, 3000, [0.02, 0.08], seed=53)
        ctx1 = Context()
        ctx1.model = Model.LOGDET
        ref = pipeline.calculate_matrix(seqs, ctx1)
        ctx2 = Context()
        ctx2.model = Model.LOGDET
        got = self._run(monkeypatch, seqs, jax_backend, ctx=ctx2, segs=4)
        assert _grids_equal(got, ref, len(seqs))

    def test_overflow_escalation_and_fallback(
        self, monkeypatch, jax_backend
    ):
        """A tiny event cap first escalates, then (if forced to always
        overflow) the rows fall through to the joint path — output
        identical either way."""
        seqs = _family(3, 2000, [0.02, 0.1], seed=61)
        ref = pipeline.calculate_matrix(seqs, Context())
        monkeypatch.setenv("ANDIX_EVENT_CAP", "8")
        got = self._run(monkeypatch, seqs, jax_backend, segs=4)
        assert _grids_equal(got, ref, len(seqs))


class TestSubjectIndexMesh:
    def test_device_parallel_groups_exact(self, monkeypatch, jax_backend):
        """Multi-device sx: groups run on separate devices via
        thread-per-device drivers (low-memory forces one group per
        subject so several devices actually engage on the 8-virtual-CPU
        mesh); the matrix must equal the serial oracle exactly."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs a multi-device (virtual) mesh")
        seqs = _family(5, 3000, [0.01, 0.06, 0.25], seed=71)
        ref = pipeline.calculate_matrix(seqs, Context())
        from andix.chain import segmented

        monkeypatch.setenv("ANDIX_INDEX", "subject")
        monkeypatch.setenv("ANDIX_CHAIN_SEGMENTS", "4")
        ctx = Context()
        ctx.low_memory = True  # one group per subject -> >1 device used
        got = pipeline.calculate_matrix(seqs, ctx, backend=jax_backend)
        assert _grids_equal(got, ref, len(seqs))
