"""Matching statistics over the joint SA — NumPy host backend.

For one subject genome ``i`` and every query text position at once, compute
the triple the reference derives per position from ``get_match_cached``
(src/esa.c:636-656) and ``anchor()`` (src/process.c:113-123):

* ``matchlen`` — length of the longest prefix of the query suffix occurring
  anywhere in ``RS_i``,
* ``unique``   — whether exactly one ``RS_i`` suffix realizes it (the
  reference's ``inter.i == inter.j`` test),
* ``pos_s``    — position of that suffix inside ``RS_i`` (``SA[inter.i]``).

Method: in SA order, the longest match of a query suffix against subject
``i`` is ``max(u, d)`` where ``u``/``d`` are the LCPs with the nearest
``i``-suffix above/below; those are segmented min-scans of the adjacent-LCP
array with resets at ``i``-entries.  Uniqueness needs additionally the LCP to
the *second*-nearest ``i``-suffix per side, which is the scan value gathered
at the nearest ``i``-entry itself.  All O(N) vector passes — no per-position
tree walks.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .joint import BlockLayout

_INF = np.int64(2**62)


def segmented_min_scan(values: np.ndarray, resets: np.ndarray,
                       block: int = 2048) -> np.ndarray:
    """Inclusive min-scan with resets: ``out[t] = values[t]`` if
    ``resets[t]`` else ``min(out[t-1], values[t])`` (out[-1] treated as
    +inf).  Two-level blocked evaluation: vectorized across blocks, Python
    loop only over ``block`` columns and over block carries."""
    n = len(values)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    nb = -(-n // block)
    pad = nb * block - n
    v = np.concatenate([values.astype(np.int64), np.full(pad, _INF)])
    r = np.concatenate([resets.astype(bool), np.ones(pad, dtype=bool)])
    v2 = v.reshape(nb, block)
    r2 = r.reshape(nb, block)

    out2 = np.empty((nb, block), dtype=np.int64)
    seen2 = np.empty((nb, block), dtype=bool)
    cur = np.full(nb, _INF, dtype=np.int64)
    seen = np.zeros(nb, dtype=bool)
    for j in range(block):
        cur = np.where(r2[:, j], v2[:, j], np.minimum(cur, v2[:, j]))
        seen = seen | r2[:, j]
        out2[:, j] = cur
        seen2[:, j] = seen

    # carry across blocks: min since last reset at end of each previous block
    prefix = np.empty(nb, dtype=np.int64)
    p = _INF
    for b in range(nb):
        prefix[b] = p
        p = cur[b] if seen[b] else min(p, cur[b])

    out2 = np.where(seen2, out2, np.minimum(prefix[:, None], out2))
    return out2.reshape(-1)[:n]


@dataclasses.dataclass
class SubjectMatchStats:
    """Per-SA-entry match statistics against one subject."""

    matchlen: np.ndarray  # int64[N] longest match length (>= 0)
    unique: np.ndarray  # bool[N]
    pos_s: np.ndarray  # int64[N] position within RS_i (valid iff unique)


def match_stats_sa_order(
    layout: BlockLayout,
    sa: np.ndarray,
    lcp: np.ndarray,
    subject_genome: int,
    segid: np.ndarray | None = None,
) -> SubjectMatchStats:
    """Compute (matchlen, unique, pos_s) for every joint-SA entry, measured
    against the RS segment of ``subject_genome``."""
    n = len(sa)
    sa = np.asarray(sa, dtype=np.int64)
    lcp = np.asarray(lcp, dtype=np.int64)
    if segid is None:
        segid = layout.segment_of(sa)
    subj_seg = int(
        np.nonzero((layout.genome_ids == subject_genome) & layout.is_subject)[0][0]
    )
    subj_start = int(layout.seg_start[subj_seg])
    flag = segid == subj_seg
    t = np.arange(n, dtype=np.int64)

    # --- upward (toward smaller SA index) ---
    last_i = np.maximum.accumulate(np.where(flag, t, np.int64(-1)))
    reset_up = np.zeros(n, dtype=bool)
    reset_up[1:] = flag[:-1]
    up = segmented_min_scan(lcp, reset_up)
    cnt = np.cumsum(flag)
    has_up = last_i >= 0
    u = np.where(has_up, up, np.int64(-1))
    li = np.maximum(last_i, 0)
    pos_up = sa[li] - subj_start
    # lcp(nearest-above, second-above) = scan value at the nearest i-entry
    gap_up = up[li]
    has_up2 = has_up & (cnt[li] >= 2)

    # --- downward (toward larger SA index) ---
    flag_r = flag[::-1]
    next_i_r = np.maximum.accumulate(np.where(flag_r, t, np.int64(-1)))
    next_i = np.where(next_i_r[::-1] >= 0, n - 1 - next_i_r[::-1], np.int64(-1))
    # value for downward step at position t (reversed order) is lcp[t+1]
    vals_down = np.concatenate([lcp[1:], [np.int64(_INF)]])
    reset_down = np.zeros(n, dtype=bool)
    reset_down[:-1] = flag[1:]
    down = segmented_min_scan(vals_down[::-1], reset_down[::-1])[::-1]
    cnt_down = np.cumsum(flag[::-1])[::-1]
    has_down = next_i >= 0
    d = np.where(has_down, down, np.int64(-1))
    ni = np.where(next_i >= 0, next_i, 0)
    pos_down = sa[ni] - subj_start
    gap_down = down[ni]
    has_down2 = has_down & (cnt_down[ni] >= 2)

    # --- combine ---
    l = np.maximum(u, d)
    matchlen = np.maximum(l, 0)
    both = (u == l) & (d == l)
    second_u = np.where(has_up2, np.minimum(u, gap_up), np.int64(-1))
    second_d = np.where(has_down2, np.minimum(d, gap_down), np.int64(-1))
    unique = np.where(
        (l <= 0) | both,
        False,
        np.where(u == l, second_u < l, second_d < l),
    )
    pos_s = np.where(u == l, pos_up, pos_down)
    # reference SA[i]: lexicographically smallest achiever; when unique there
    # is exactly one, so the achieving side's neighbor is it.
    return SubjectMatchStats(
        matchlen=matchlen, unique=unique.astype(bool), pos_s=pos_s
    )


def inverse_sa(sa: np.ndarray) -> np.ndarray:
    n = len(sa)
    isa = np.empty(n, dtype=np.int64)
    isa[np.asarray(sa, dtype=np.int64)] = np.arange(n, dtype=np.int64)
    return isa


def extract_query_stats(
    layout: BlockLayout,
    isa: np.ndarray,
    stats: SubjectMatchStats,
    query_genome: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Gather per-query-position (matchlen, unique, pos_s) for one genome."""
    qs, qe = layout.query_span(query_genome)
    tq = isa[qs:qe]
    return (
        stats.matchlen[tq].astype(np.int64),
        stats.unique[tq],
        stats.pos_s[tq].astype(np.int64),
    )
