"""Mutation-count matrices and evolutionary-distance estimators.

Capability parity with reference ``src/model.c``: the 16-cell substitution
count matrix, Raw/JC/Kimura/LogDet/ANI estimators, and the multinomial
bootstrap.  Counting is vectorized NumPy (the per-site classification loop
``src/model.c:309-337`` becomes a bincount over 2-bit codes); estimator math
is float64 to match the reference's C doubles.  The bootstrap uses a seedable
NumPy Generator instead of a ``time(NULL)``-seeded GSL RNG
(``src/andi.c:272-279`` marks reproducible seeding as a TODO — we fix it).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .runtime import Model as ModelKind

# Mutation cell indices: index = (from << 2) | to with A=0 C=1 G=2 T=3
# (reference enum, src/model.h:14-32).
AtoA, AtoC, AtoG, AtoT = 0, 1, 2, 3
CtoA, CtoC, CtoG, CtoT = 4, 5, 6, 7
GtoA, GtoC, GtoG, GtoT = 8, 9, 10, 11
TtoA, TtoC, TtoG, TtoT = 12, 13, 14, 15
MUTCOUNTS = 16

_SNP_CELLS = [AtoC, AtoG, AtoT, CtoA, CtoG, CtoT, GtoA, GtoC, GtoT, TtoA, TtoC, TtoG]
_TRANSITIONS = [AtoG, GtoA, CtoT, TtoC]
_TRANSVERSIONS = [AtoC, CtoA, AtoT, TtoA, GtoC, CtoG, GtoT, TtoG]

_A_BYTE = 65


def nucl2bit(b: np.ndarray) -> np.ndarray:
    """A→0 C→1 G→2 T→3 via the low-bit trick (reference ``nucl2bit``,
    src/model.c:295-299)."""
    c = np.asarray(b, dtype=np.uint8) & 6
    c = c ^ (c >> 1)
    return c >> 1


@dataclasses.dataclass
class CountMatrix:
    """One pairwise mutation matrix (reference ``struct model``,
    src/model.h:52-57)."""

    counts: np.ndarray  # int64[16]
    seq_len: int

    @classmethod
    def zero(cls, seq_len: int = 0) -> "CountMatrix":
        return cls(np.zeros(MUTCOUNTS, dtype=np.int64), seq_len)

    def copy(self) -> "CountMatrix":
        return CountMatrix(self.counts.copy(), self.seq_len)


def model_total(m: CountMatrix) -> int:
    return int(m.counts.sum())


def model_coverage(m: CountMatrix) -> float:
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.float64(model_total(m)) / np.float64(m.seq_len))


def model_average(a: CountMatrix, b: CountMatrix) -> CountMatrix:
    return CountMatrix(a.counts + b.counts, a.seq_len + b.seq_len)


def model_count_equal(m: CountMatrix, segment: np.ndarray, length: int,
                      model_kind: ModelKind) -> None:
    """Classify nucleotides of an anchor (both strings known equal).

    Reference ``model_count_equal`` (src/model.c:246-279): for RAW/JC/Kimura
    the anchor is split len/4 per diagonal cell with the remainder on TtoT;
    LogDet/ANI count the actual characters, skipping ``;!#``.
    """
    if model_kind in (ModelKind.RAW, ModelKind.JC, ModelKind.KIMURA):
        fourth = length // 4
        m.counts[AtoA] += fourth
        m.counts[CtoC] += fourth
        m.counts[GtoG] += fourth
        m.counts[TtoT] += fourth + (length & 3)
        return

    seg = np.asarray(segment[:length], dtype=np.uint8)
    keep = seg >= _A_BYTE
    codes = (seg[keep] >> 1) & 3  # A→0 C→1 T→2 G→3 (src/model.c:270-272)
    local = np.bincount(codes, minlength=4)
    m.counts[AtoA] += local[0]
    m.counts[CtoC] += local[1]
    m.counts[GtoG] += local[3]
    m.counts[TtoT] += local[2]


def model_count(m: CountMatrix, subject_seg: np.ndarray, query_seg: np.ndarray,
                length: int) -> None:
    """Count substitutions between aligned gap segments (reference
    ``model_count``, src/model.c:309-337).  Skips positions where either
    byte is a separator (< 'A')."""
    s = np.asarray(subject_seg[:length], dtype=np.uint8)
    q = np.asarray(query_seg[:length], dtype=np.uint8)
    keep = (s >= _A_BYTE) & (q >= _A_BYTE)
    idx = (nucl2bit(s[keep]).astype(np.int64) << 2) | nucl2bit(q[keep])
    m.counts += np.bincount(idx, minlength=MUTCOUNTS)


# --- estimators (src/model.c:81-209) -----------------------------------------


def estimate_raw(m: CountMatrix) -> float:
    nucl = model_total(m)
    if nucl <= 3:
        return float("nan")
    snps = int(m.counts[_SNP_CELLS].sum())
    return float(np.float64(snps) / np.float64(nucl))


def estimate_jc(m: CountMatrix) -> float:
    dist = estimate_raw(m)
    with np.errstate(divide="ignore", invalid="ignore"):
        dist = float(-0.75 * np.log(1.0 - (4.0 / 3.0) * np.float64(dist)))
    # fix negative zero; NaN compares false and passes through
    return 0.0 if dist <= 0.0 else dist


def estimate_kimura(m: CountMatrix) -> float:
    nucl = np.float64(model_total(m))
    transitions = np.float64(int(m.counts[_TRANSITIONS].sum()))
    transversions = np.float64(int(m.counts[_TRANSVERSIONS].sum()))
    with np.errstate(divide="ignore", invalid="ignore"):
        P = transitions / nucl
        Q = transversions / nucl
        tmp = 1.0 - 2.0 * P - Q
        dist = float(-0.25 * np.log((1.0 - 2.0 * Q) * tmp * tmp))
    return 0.0 if dist <= 0.0 else dist


def estimate_logdet(m: CountMatrix) -> float:
    """LogDet distance (reference ``estimate_LOGDET``, src/model.c:156-198).

    The 4x4 determinant is expanded with the same cofactor layout as the
    reference for bit-level comparable numerics."""
    with np.errstate(divide="ignore", invalid="ignore"):
        nucl = np.float64(model_total(m))
        P = m.counts.astype(np.float64) / nucl
        F = P.reshape(4, 4)  # rows = from (subject), cols = to (query)
        row = F.sum(axis=1)
        col = F.sum(axis=0)
        log_det_fxx_fyy = np.float64(np.log(row).sum() + np.log(col).sum())

        # Cofactor expansion along the first two rows, mirroring
        # src/model.c:177-192 term by term.
        det_fxy = np.float64(
            F[0, 0] * F[1, 1] * (F[2, 2] * F[3, 3] - F[3, 2] * F[2, 3])
            - F[0, 0] * F[1, 2] * (F[2, 1] * F[3, 3] - F[3, 1] * F[2, 3])
            + F[0, 0] * F[1, 3] * (F[2, 1] * F[3, 2] - F[3, 1] * F[2, 2])
            - F[0, 1] * F[1, 0] * (F[2, 2] * F[3, 3] - F[3, 2] * F[2, 3])
            + F[0, 1] * F[1, 2] * (F[2, 0] * F[3, 3] - F[3, 0] * F[2, 3])
            - F[0, 1] * F[1, 3] * (F[2, 0] * F[3, 2] - F[3, 0] * F[2, 2])
            + F[0, 2] * F[1, 0] * (F[2, 1] * F[3, 3] - F[3, 1] * F[2, 3])
            - F[0, 2] * F[1, 1] * (F[2, 0] * F[3, 3] - F[3, 0] * F[2, 3])
            + F[0, 2] * F[1, 3] * (F[2, 0] * F[3, 1] - F[3, 0] * F[2, 1])
            - F[0, 3] * F[1, 0] * (F[2, 1] * F[3, 2] - F[3, 1] * F[2, 2])
            + F[0, 3] * F[1, 1] * (F[2, 0] * F[3, 2] - F[3, 0] * F[2, 2])
            - F[0, 3] * F[1, 2] * (F[2, 0] * F[3, 1] - F[3, 0] * F[2, 1])
        )
        dist = float(-0.25 * (np.log(det_fxy) - 0.5 * log_det_fxx_fyy))
    return 0.0 if dist <= 0.0 else dist


def estimate_ani(m: CountMatrix) -> float:
    dist = estimate_raw(m)
    return float((1.0 - np.float64(dist)) * 100.0)


ESTIMATORS = {
    ModelKind.RAW: estimate_raw,
    ModelKind.JC: estimate_jc,
    ModelKind.KIMURA: estimate_kimura,
    ModelKind.LOGDET: estimate_logdet,
    ModelKind.ANI: estimate_ani,
}


def estimate(m: CountMatrix, kind: ModelKind) -> float:
    return ESTIMATORS[kind](m)


# --- bootstrap (src/model.c:222-232) -----------------------------------------


def model_bootstrap(m: CountMatrix, rng: np.random.Generator) -> CountMatrix:
    """Multinomial resampling of the 16 counts (reference ``model_bootstrap``;
    Klötzl & Haubold 2016)."""
    nucl = model_total(m)
    if nucl <= 0:
        return m.copy()
    p = m.counts.astype(np.float64) / np.float64(nucl)
    counts = rng.multinomial(nucl, p)
    return CountMatrix(counts.astype(np.int64), m.seq_len)
