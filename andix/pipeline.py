"""Distance-matrix pipeline: subject blocks → joint SA → match stats → replay.

TPU-native replacement for the reference pair scheduler
(``distMatrix``/``distMatrixLM``, src/dist_hack.h): instead of OpenMP threads
each building one subject ESA and scanning queries serially, subjects are
grouped into *blocks*; per block one joint suffix array over all block
subjects plus all query strings is built (device-side sorts in the JAX
backend), per-subject matching statistics are produced by vectorized scans,
and the path-dependent anchor chaining is replayed on host.

Low-memory mode (reference ``-l``) maps to single-subject blocks — a
different schedule with bit-identical output, as the reference requires
(test/test_extra.sh:19-22).
"""

from __future__ import annotations

import numpy as np

from . import chain
from .esa import joint, matchstats_np, sa_numpy
from .model import CountMatrix
from .output import ProgressMeter
from .runtime import Context
from .sequence import Seq, Subject, subject_init


class NumpyBackend:
    """Host backend: numpy doubling SA + Kasai LCP + numpy scans."""

    name = "numpy"

    def suffix_array(self, sym: np.ndarray) -> np.ndarray:
        return sa_numpy.suffix_array(sym)

    def lcp_array(self, sym: np.ndarray, sa: np.ndarray) -> np.ndarray:
        return sa_numpy.lcp_array(sym, sa)

    def match_stats(self, layout, sa, lcp, subject_genome):
        return matchstats_np.match_stats_sa_order(layout, sa, lcp, subject_genome)


def make_blocks(
    subjects: list[Subject], block_syms: int, low_memory: bool
) -> list[list[int]]:
    """Greedy-pack subject indices into blocks bounded by ``block_syms``
    joint-text symbols (queries included once per block)."""
    n = len(subjects)
    if low_memory:
        return [[i] for i in range(n)]
    query_total = sum((s.len - 1) // 2 + 1 for s in subjects)
    blocks: list[list[int]] = []
    cur: list[int] = []
    cur_syms = query_total
    for i in range(n):
        need = subjects[i].len + 1
        if cur and cur_syms + need > block_syms:
            blocks.append(cur)
            cur = []
            cur_syms = query_total
        cur.append(i)
        cur_syms += need
    if cur:
        blocks.append(cur)
    return blocks


def calculate_matrix(
    seqs: list[Seq],
    ctx: Context,
    backend=None,
    block_syms: int = 1 << 27,
    progress: ProgressMeter | None = None,
) -> list[list[CountMatrix]]:
    """Fill the full n×n count-matrix grid (reference
    ``calculate_distances`` compute phase, src/process.c:230-251)."""
    backend = backend or NumpyBackend()
    n = len(seqs)
    subjects = [subject_init(s, ctx.anchor_p_value) for s in seqs]

    M: list[list[CountMatrix]] = [[None] * n for _ in range(n)]  # type: ignore
    for i in range(n):
        diag = CountMatrix.zero(seq_len=9)
        diag.counts[0] = 9
        M[i][i] = diag

    for block in make_blocks(subjects, block_syms, ctx.low_memory):
        in_block = set(block)
        subject_rs = {i: subjects[i].rs for i in block}
        query_seqs = {
            j: seqs[j].data for j in range(n) if j not in in_block
        }
        layout = joint.build_block(subject_rs, query_seqs)
        sa = backend.suffix_array(layout.sym)
        lcp = backend.lcp_array(layout.sym, sa)
        isa = matchstats_np.inverse_sa(sa)

        for i in block:
            stats = backend.match_stats(layout, sa, lcp, i)
            for j in range(n):
                if j == i:
                    continue
                ml, un, ps = matchstats_np.extract_query_stats(
                    layout, isa, stats, j
                )
                M[i][j] = chain.dist_anchor_replay(
                    ml, un, ps, subjects[i].rs, seqs[j].data,
                    subjects[i].threshold, ctx.model,
                )
                if progress is not None:
                    progress.advance(1)

    return M
