"""Sequence model: normalization, reverse complement, subject prep, statistics.

Capability parity with reference ``src/sequence.c`` but vectorized with NumPy
byte ops instead of per-char C loops.  Sequences are ``np.uint8`` arrays over
the alphabet ``A C G T`` plus the special separators the reference defines:

* ``!`` — contig joiner inserted by join mode (``src/sequence.c:112``),
* ``;`` — reverse complement of ``!`` (``src/sequence.c:157``),
* ``#`` — strand separator between revcomp and forward (``src/sequence.c:184``).

All three compare below ``'A'``, which downstream counting relies on
(``src/model.c:264-266,317``).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

# Byte codes
A, C, G, T = 65, 67, 71, 84
BANG = 33  # '!'
HASH = 35  # '#'
SEMI = 59  # ';'

# --- normalization (reference `normalize`, src/sequence.c:260-282) -----------

# keep[b] = the byte to emit for input byte b, or 0 to strip (and flag).
_KEEP = np.zeros(256, dtype=np.uint8)
for _b in (A, C, G, T, BANG):
    _KEEP[_b] = _b
for _lo, _up in ((97, A), (99, C), (103, G), (116, T)):  # acgt -> ACGT
    _KEEP[_lo] = _up
# Bytes that are canonical already (no flag): ACGT! and acgt.
_CANONICAL = np.zeros(256, dtype=bool)
for _b in (A, C, G, T, BANG, 97, 99, 103, 116):
    _CANONICAL[_b] = True


def normalize(raw: np.ndarray) -> tuple[np.ndarray, bool]:
    """Strip non-ACGT! bytes, uppercase acgt.

    Returns (normalized array, had_non_acgt flag).
    """
    raw = np.asarray(raw, dtype=np.uint8)
    mapped = _KEEP[raw]
    keep_mask = mapped != 0
    non_acgt = bool((~_CANONICAL[raw]).any())
    return mapped[keep_mask], non_acgt


# --- reverse complement (reference `revcomp`, src/sequence.c:143-166) --------

_REVCOMP = np.zeros(256, dtype=np.uint8)
for _b in range(256):
    if _b < A:
        _REVCOMP[_b] = SEMI  # "rosebud"
    else:
        _REVCOMP[_b] = _b ^ (4 if _b & 2 else 21)


def revcomp(seq: np.ndarray) -> np.ndarray:
    """Reverse complement; non-nucleotides map to ';'."""
    return _REVCOMP[np.asarray(seq, dtype=np.uint8)[::-1]]


def catcomp(seq: np.ndarray) -> np.ndarray:
    """Subject string: ``revcomp(S) + '#' + S`` (reference `catcomp`,
    src/sequence.c:175-189)."""
    seq = np.asarray(seq, dtype=np.uint8)
    return np.concatenate(
        [revcomp(seq), np.array([HASH], dtype=np.uint8), seq]
    )


def calc_gc(seq: np.ndarray) -> float:
    """Relative G+C content (reference `calc_gc`, src/sequence.c:196-207).

    Divides by the full length including any ``!`` joiners, as the
    reference does.
    """
    seq = np.asarray(seq, dtype=np.uint8)
    gc = int(np.count_nonzero((seq == G) | (seq == C)))
    return gc / len(seq)


# --- sequences ----------------------------------------------------------------


@dataclasses.dataclass
class Seq:
    """A named, normalized sequence (reference ``seq_t``)."""

    data: np.ndarray  # uint8, normalized
    name: str

    @property
    def len(self) -> int:
        return len(self.data)


@dataclasses.dataclass
class Subject:
    """Subject-side preparation of a sequence (reference ``seq_subject``,
    ``seq_subject_init`` src/sequence.c:210-219)."""

    rs: np.ndarray  # revcomp + '#' + forward
    gc: float
    threshold: int

    @property
    def len(self) -> int:
        return len(self.rs)


def subject_init(seq: Seq, anchor_p_value: float) -> Subject:
    gc = calc_gc(seq.data)
    rs = catcomp(seq.data)
    threshold = min_anchor_length(anchor_p_value, gc, len(rs))
    return Subject(rs=rs, gc=gc, threshold=threshold)


def join(seqs: list[np.ndarray]) -> np.ndarray:
    """Concatenate contigs with ``!`` separators (reference `dsa_join`,
    src/sequence.c:78-125)."""
    if not seqs:
        return np.zeros(0, dtype=np.uint8)
    if len(seqs) == 1:
        return seqs[0]
    sep = np.array([BANG], dtype=np.uint8)
    parts = [seqs[0]]
    for s in seqs[1:]:
        parts.append(sep)
        parts.append(s)
    return np.concatenate(parts)


# --- anchor-length statistics (src/sequence.c:296-373) ------------------------


def binomial_coefficient(n: int, k: int) -> int:
    """Integer (n choose k) with the reference's truncating-division loop
    (``src/sequence.c:315-336``).  The loop divides at each step, which is
    exact for binomials, so math.comb matches."""
    if n <= 0 or k > n:
        return 0
    return math.comb(n, k)


def shustring_cum_prob(x: int, p: float, l: int) -> float:
    """P{longest shortest-unique-substring length <= x} under a random model.

    Haubold et al. (2009); reference ``shustring_cum_prob``
    (``src/sequence.c:353-373``).  ``p`` is *half* the GC share; ``x``
    counts the final mismatch (match length + 1).
    """
    xx = float(x)
    ll = float(l)
    s = 0.0
    for k in range(0, x + 1):
        kk = float(k)
        t = math.pow(p, kk) * math.pow(0.5 - p, xx - kk)
        s += (
            math.pow(2.0, xx)
            * (t * math.pow(1.0 - t, ll))
            * float(binomial_coefficient(x, k))
        )
        if s >= 1.0:
            return 1.0
    return s


def min_anchor_length(p: float, g: float, l: int) -> int:
    """Smallest x with P{shustring <= x} >= 1 - p (reference
    ``min_anchor_length``, src/sequence.c:296-304)."""
    x = 1
    while shustring_cum_prob(x, g / 2.0, l) < 1.0 - p:
        x += 1
    return x
