"""Brute-force oracle: tiny-input ground truth for the fast pipelines.

``match_stats_brute`` computes, for every query position, the longest-match
length / uniqueness / subject position by direct comparison against every
subject suffix — O(n·m·L), only for test-sized inputs.  ``dist_pair_oracle``
is the end-to-end per-pair oracle mirroring ``dist_anchor`` semantics
(SURVEY.md §7 build order step 2).
"""

from __future__ import annotations

import numpy as np

from .chain import dist_anchor_replay
from .model import CountMatrix
from .runtime import Model as ModelKind
from .sequence import Seq, Subject, subject_init


def match_stats_brute(
    rs: np.ndarray, query: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(matchlen, unique, pos_s) for every query position, brute force.

    ``pos_s`` is the position of the lexicographically smallest subject
    suffix achieving the match (only meaningful where ``unique``).
    """
    rs = np.asarray(rs, dtype=np.uint8)
    query = np.asarray(query, dtype=np.uint8)
    n, m = len(rs), len(query)
    matchlen = np.zeros(m, dtype=np.int64)
    unique = np.zeros(m, dtype=bool)
    pos_s = np.zeros(m, dtype=np.int64)

    for p in range(m):
        rem = m - p
        # lens[s] = lcp(query[p:], rs[s:]) capped at remaining query
        lens = np.zeros(n, dtype=np.int64)
        active = np.arange(n)
        k = 0
        while len(active) and k < rem:
            ok = active + k < n
            ok[ok] = rs[active[ok] + k] == query[p + k]
            lens[active[ok]] += 1
            active = active[ok]
            k += 1
        l = int(lens.max(initial=0))
        matchlen[p] = l
        if l > 0:
            achievers = np.nonzero(lens == l)[0]
            unique[p] = len(achievers) == 1
            if unique[p]:
                pos_s[p] = int(achievers[0])
            else:
                # smallest in suffix order: compare the suffixes
                best = min(
                    achievers, key=lambda s: rs[s:].tobytes()
                )
                pos_s[p] = int(best)
    return matchlen, unique, pos_s


def dist_pair_oracle(
    subject: Subject, query: Seq, model_kind: ModelKind
) -> CountMatrix:
    """End-to-end brute-force distance counts for one (subject, query) pair."""
    matchlen, unique, pos_s = match_stats_brute(subject.rs, query.data)
    return dist_anchor_replay(
        matchlen, unique, pos_s, subject.rs, query.data,
        subject.threshold, model_kind,
    )


def matrix_oracle(
    seqs: list[Seq], anchor_p_value: float, model_kind: ModelKind
) -> list[list[CountMatrix]]:
    """Full n×n count-matrix grid, brute force (reference ``distMatrix``
    semantics incl. the diagonal sentinel, src/dist_hack.h:62)."""
    n = len(seqs)
    M: list[list[CountMatrix]] = [[None] * n for _ in range(n)]  # type: ignore
    for i in range(n):
        subject = subject_init(seqs[i], anchor_p_value)
        for j in range(n):
            if i == j:
                diag = CountMatrix.zero(seq_len=9)
                diag.counts[0] = 9
                M[i][j] = diag
            else:
                M[i][j] = dist_pair_oracle(subject, seqs[j], model_kind)
    return M
