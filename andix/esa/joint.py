"""Joint (generalized) text layout for a subject block.

The text for one block is the concatenation of

* the full subject string ``RS_i = revcomp(S_i) + '#' + S_i`` for every
  subject ``i`` in the block, and
* the plain query string ``Q_j`` for every genome ``j`` whose RS is *not* in
  the block (queries of in-block genomes are already present as the forward
  half of their RS),

with a unique separator symbol after every segment.  Symbols are int32:
sequence bytes keep their byte value (so ``! # ;`` order below ``ACGT``
exactly as C ``char`` comparison does in the reference — SURVEY.md §7 hard
part 4), separators get distinct values ``256 + seg``.  Distinct separators
guarantee no common prefix ever crosses a segment boundary, which makes
matching statistics against one subject independent of everything else in
the block text.
"""

from __future__ import annotations

import dataclasses

import numpy as np

SEPARATOR_BASE = 256


@dataclasses.dataclass
class BlockLayout:
    """Layout of one block text.

    ``genome_ids`` maps segment index -> genome index; ``is_subject`` marks
    RS segments (vs query-only segments).  ``seg_start`` has one extra
    trailing entry = total length (so ``seg_start[s+1]`` is valid).

    The text is stored as bytes (``u8``); the only non-byte symbols are the
    per-segment separators at positions ``seg_start[s+1]-1`` whose int32
    value is ``SEPARATOR_BASE + s``.  ``sym`` materializes the int32 view on
    demand (host/NumPy paths only — the device path ships bytes and
    reconstructs separators on device, 4x less H2D traffic and no int32
    host copies of genome-scale texts).
    """

    u8: np.ndarray  # uint8[N] text bytes (separator slots hold 0)
    seg_start: np.ndarray  # int64[nseg+1]
    genome_ids: np.ndarray  # int32[nseg]
    is_subject: np.ndarray  # bool[nseg]
    seq_lens: np.ndarray  # int64[nseg] forward-sequence length L_j
    _sym: np.ndarray | None = dataclasses.field(default=None, repr=False)

    @property
    def n(self) -> int:
        return len(self.u8)

    @property
    def sym(self) -> np.ndarray:
        """int32 text symbols incl. separator values (cached)."""
        if self._sym is None:
            sym = self.u8.astype(np.int32)
            ends = self.seg_start[1:] - 1
            sym[ends] = SEPARATOR_BASE + np.arange(len(ends), dtype=np.int32)
            self._sym = sym
        return self._sym

    def segment_of(self, pos: np.ndarray) -> np.ndarray:
        """Segment index for each text position."""
        return (np.searchsorted(self.seg_start, pos, side="right") - 1).astype(
            np.int32
        )

    def query_span(self, genome: int) -> tuple[int, int]:
        """Text range [start, end) holding genome's plain query string."""
        seg = int(np.nonzero(self.genome_ids == genome)[0][0])
        start = int(self.seg_start[seg])
        L = int(self.seq_lens[seg])
        if self.is_subject[seg]:
            # forward half of RS: revcomp(L) + '#' + forward(L)
            return start + L + 1, start + 2 * L + 1
        return start, start + L

    def subject_span(self, genome: int) -> tuple[int, int]:
        """Text range [start, end) holding genome's RS string (no separator)."""
        seg = int(np.nonzero((self.genome_ids == genome) & self.is_subject)[0][0])
        start = int(self.seg_start[seg])
        L = int(self.seq_lens[seg])
        return start, start + 2 * L + 1


def build_block(
    subject_rs: dict[int, np.ndarray],
    query_seqs: dict[int, np.ndarray],
) -> BlockLayout:
    """Build the joint text for a block.

    ``subject_rs``: genome -> RS byte array for in-block subjects.
    ``query_seqs``: genome -> forward byte array for genomes whose RS is not
    in the block (their queries still participate in matching).
    """
    seg_start: list[int] = []
    genome_ids: list[int] = []
    is_subject: list[bool] = []
    seq_lens: list[int] = []

    total = sum(len(rs) + 1 for rs in subject_rs.values()) + sum(
        len(q) + 1 for q in query_seqs.values()
    )
    u8 = np.zeros(total, dtype=np.uint8)

    pos = 0
    seg = 0
    for genome, rs in subject_rs.items():
        u8[pos : pos + len(rs)] = rs
        seg_start.append(pos)
        genome_ids.append(genome)
        is_subject.append(True)
        seq_lens.append((len(rs) - 1) // 2)
        pos += len(rs) + 1
        seg += 1

    for genome, q in query_seqs.items():
        u8[pos : pos + len(q)] = q
        seg_start.append(pos)
        genome_ids.append(genome)
        is_subject.append(False)
        seq_lens.append(len(q))
        pos += len(q) + 1
        seg += 1

    seg_start.append(pos)
    return BlockLayout(
        u8=u8,
        seg_start=np.asarray(seg_start, dtype=np.int64),
        genome_ids=np.asarray(genome_ids, dtype=np.int32),
        is_subject=np.asarray(is_subject, dtype=bool),
        seq_lens=np.asarray(seq_lens, dtype=np.int64),
    )
