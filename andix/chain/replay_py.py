"""Exact-semantics Python replay of the reference anchor-chaining scan.

Mirrors ``dist_anchor`` (src/process.c:141-214) including:

* lucky anchors — diagonal extension without uniqueness when the gap to the
  last anchor is at most the threshold (src/process.c:82-100); note the
  lucky length *replaces* the full-search length in the advance,
* diagonal pairing of consecutive anchors on the same strand half
  (src/process.c:160-174),
* lone anchors of length >= 2*threshold (src/process.c:181-186, 209-211),
* the identical-sequence special case (src/process.c:199-203),
* advance ``pos_Q += length + 1`` using the length of the *attempted* match
  even when it was not an anchor (src/process.c:196).

Consumes precomputed per-position match statistics instead of walking an ESA.
"""

from __future__ import annotations

import numpy as np

from ..model import CountMatrix, model_count, model_count_equal
from ..runtime import Model as ModelKind


def _lcp_bytes(a: np.ndarray, b: np.ndarray, limit: int) -> int:
    """Length of the common prefix of a and b, at most ``limit`` (the
    remaining query length, reference ``lcp`` src/process.c:59-65)."""
    m = min(limit, len(a), len(b))
    if m <= 0:
        return 0
    neq = a[:m] != b[:m]
    idx = int(np.argmax(neq))
    if neq[idx]:
        return idx
    return m


def dist_anchor_replay(
    matchlen: np.ndarray,
    unique: np.ndarray,
    pos_s: np.ndarray,
    rs: np.ndarray,
    query: np.ndarray,
    threshold: int,
    model_kind: ModelKind,
) -> CountMatrix:
    query_length = len(query)
    rs_len = len(rs)
    ret = CountMatrix.zero(seq_len=query_length)

    this_pos_q = 0
    this_pos_s = 0
    this_len = 0
    last_pos_q = 0
    last_pos_s = 0
    last_len = 0
    last_was_right_anchor = False
    border = rs_len // 2

    while this_pos_q < query_length:
        found = False

        # lucky_anchor (src/process.c:82-100)
        advance = this_pos_q - last_pos_q
        gap = this_pos_q - last_pos_q - last_len
        try_pos_s = last_pos_s + advance
        if try_pos_s < rs_len and 0 <= gap <= threshold:
            this_pos_s = try_pos_s
            this_len = _lcp_bytes(
                query[this_pos_q:], rs[try_pos_s:], query_length - this_pos_q
            )
            found = this_len >= threshold

        # anchor (src/process.c:113-123)
        if not found:
            this_len = int(matchlen[this_pos_q])
            this_pos_s = int(pos_s[this_pos_q])
            found = bool(unique[this_pos_q]) and this_len >= threshold

        if found:
            end_s = last_pos_s + last_len
            end_q = last_pos_q + last_len
            if (
                this_pos_s > end_s
                and this_pos_q - end_q == this_pos_s - end_s
                and (this_pos_s < border) == (last_pos_s < border)
            ):
                # right anchor: count the left anchor + the gap SNPs
                model_count_equal(ret, query[last_pos_q:], last_len, model_kind)
                model_count(ret, rs[end_s:], query[end_q:], this_pos_q - end_q)
                last_was_right_anchor = True
            else:
                if last_was_right_anchor:
                    model_count_equal(
                        ret, query[last_pos_q:], last_len, model_kind
                    )
                elif last_len >= threshold * 2:
                    model_count_equal(
                        ret, query[last_pos_q:], last_len, model_kind
                    )
                last_was_right_anchor = False

            last_pos_q = this_pos_q
            last_pos_s = this_pos_s
            last_len = this_len

        this_pos_q += this_len + 1

    # identical sequences (src/process.c:199-203)
    if last_len >= query_length:
        model_count_equal(ret, query, query_length, model_kind)
        return ret

    # trailing anchor (src/process.c:207-211)
    if last_was_right_anchor:
        model_count_equal(ret, query[last_pos_q:], last_len, model_kind)
    elif last_len >= threshold * 2:
        model_count_equal(ret, query[last_pos_q:], last_len, model_kind)

    return ret
