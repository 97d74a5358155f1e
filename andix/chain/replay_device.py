"""On-device anchor-chain replay (JAX, vmapped over query lanes).

The reference's per-pair scan (``dist_anchor``, src/process.c:141-214) is
sequential in the visited positions, but each visit is O(1) given:

* precomputed per-position match statistics (device scans,
  ``matchstats_jax``) gathered through the inverse SA, and
* O(1) longest-common-extension queries for lucky anchors
  (``esa.rmq``: LCE(a,b) = range-min of adjacent LCPs between the ISA
  positions) replacing the reference's byte loop (src/process.c:59-65).

So the whole pair row replays as one ``lax.while_loop`` vmapped across all
queries of a subject — ~query_len/avg_anchor iterations in lock step — and
only the 16 substitution counts per pair ever leave the device.  Substitution
counting in anchor gaps (``model_count`` semantics, src/model.c:309-337)
runs as 128-wide masked chunks inside the loop.

This is the production replay for the JAX backend; the native C++ replay
(``andix.native``) remains as host fallback and cross-check oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..esa import rmq

A_BYTE = jnp.int32(65)
CHUNK = 128

# cell layout: index = (from << 2) | to, A=0 C=1 G=2 T=3 (src/model.h:14-32)
_DIAG = jnp.zeros(16, jnp.int32).at[jnp.array([0, 5, 10, 15])].set(1)
_TTTT = jnp.zeros(16, jnp.int32).at[15].set(1)
# (s >> 1) & 3 codes: A->0 C->1 T->2 G->3  ->  cells AtoA CtoC TtoT GtoG
_EQ_CELL = jnp.array([0, 5, 15, 10], jnp.int32)


def _nucl2bit(c):
    c = c & 6
    c = c ^ (c >> 1)
    return c >> 1


def _hist16(idx, ok):
    onehot = (idx[:, None] == jnp.arange(16, dtype=jnp.int32)[None, :]) & ok[:, None]
    return onehot.sum(axis=0, dtype=jnp.int32)


def _gap_counts(text, s_base, q_base, glen):
    """Substitution histogram over the gap [0, glen): text[s_base+i] vs
    text[q_base+i], skipping separator bytes (< 'A')."""
    n = text.shape[0]
    offs = jnp.arange(CHUNK, dtype=jnp.int32)

    def chunk(k, acc):
        o = k * CHUNK + offs
        valid = o < glen
        s = text[jnp.minimum(s_base + o, n - 1)]
        q = text[jnp.minimum(q_base + o, n - 1)]
        ok = valid & (s >= A_BYTE) & (q >= A_BYTE) & (s < 256) & (q < 256)
        idx = (_nucl2bit(s) << 2) | _nucl2bit(q)
        return acc + _hist16(idx, ok)

    nchunks = (glen + CHUNK - 1) // CHUNK
    return jax.lax.fori_loop(0, nchunks, chunk, jnp.zeros(16, jnp.int32))


def _equal_counts_exact(text, base, length):
    """Per-character anchor classification (model_count_equal exact path,
    src/model.c:259-278): counts actual nucleotides, skipping ';!#'."""
    n = text.shape[0]
    offs = jnp.arange(CHUNK, dtype=jnp.int32)

    def chunk(k, acc):
        o = k * CHUNK + offs
        valid = o < length
        s = text[jnp.minimum(base + o, n - 1)]
        ok = valid & (s >= A_BYTE) & (s < 256)
        cell = _EQ_CELL[(s >> 1) & 3]
        return acc + _hist16(cell, ok)

    nchunks = (length + CHUNK - 1) // CHUNK
    return jax.lax.fori_loop(0, nchunks, chunk, jnp.zeros(16, jnp.int32))


def _equal_counts_split(length):
    """len/4 per diagonal cell, remainder on TtoT (model_count_equal fast
    path, src/model.c:247-253)."""
    return (length // 4) * _DIAG + (length & 3) * _TTTT


def _replay_impl(
    text: jax.Array,  # int32[Np] padded block text
    isa: jax.Array,  # int32[Np]
    rm: rmq.RangeMin,  # over the adjacent-LCP array
    ml_sa: jax.Array,  # int32[Np] per-SA-entry match stats for this subject
    un_sa: jax.Array,  # bool[Np]
    ps_sa: jax.Array,  # int32[Np]
    subj_start: jax.Array,  # scalar: text base of RS_i
    rs_len: jax.Array,  # scalar
    threshold: jax.Array,  # scalar
    exact_counts: bool,
):
    """Returns one_query(qs, qlen) -> int32[16] for this subject (to be
    vmapped over query lanes by the callers below)."""
    border = rs_len // 2

    def lce(a_text, b_text):
        t1 = isa[a_text]
        t2 = isa[b_text]
        lo = jnp.minimum(t1, t2) + 1
        hi = jnp.maximum(t1, t2)
        return rmq.range_min(rm, lo, hi)

    def equal_counts(q_base_text, length):
        if exact_counts:
            return _equal_counts_exact(text, q_base_text, length)
        return _equal_counts_split(length)

    def one_query(qs, qlen):
        def cond(state):
            pos_q = state[0]
            return pos_q < qlen

        def body(state):
            pos_q, last_q, last_s, last_len, last_right, counts = state

            # lucky anchor (src/process.c:82-100)
            advance = pos_q - last_q
            gap = advance - last_len
            try_s = last_s + advance
            lucky_pre = (try_s < rs_len) & (gap >= 0) & (gap <= threshold)
            lucky_len = jnp.where(
                lucky_pre,
                lce(qs + pos_q, subj_start + jnp.where(lucky_pre, try_s, 0)),
                0,
            )
            lucky_found = lucky_pre & (lucky_len >= threshold)

            # full-search anchor via precomputed stats (src/process.c:113-123)
            t = isa[qs + pos_q]
            aml = ml_sa[t]
            found = lucky_found | (un_sa[t] & (aml >= threshold))
            this_len = jnp.where(lucky_found, lucky_len, aml)
            this_s = jnp.where(lucky_found, try_s, ps_sa[t])

            # diagonal pairing (src/process.c:160-189)
            end_s = last_s + last_len
            end_q = last_q + last_len
            paired = (
                found
                & (this_s > end_s)
                & (pos_q - end_q == this_s - end_s)
                & ((this_s < border) == (last_s < border))
            )
            count_last = paired | (
                found & ~paired & (last_right | (last_len >= 2 * threshold))
            )
            # zero-length guards keep the chunked loops free when not counting
            counts = counts + equal_counts(
                qs + last_q, jnp.where(count_last, last_len, 0)
            ) * jnp.where(count_last, 1, 0)
            counts = counts + _gap_counts(
                text,
                subj_start + end_s,
                qs + end_q,
                jnp.where(paired, pos_q - end_q, 0),
            )

            last_q = jnp.where(found, pos_q, last_q)
            last_s = jnp.where(found, this_s, last_s)
            last_len = jnp.where(found, this_len, last_len)
            last_right = jnp.where(found, paired, last_right)
            pos_q = pos_q + this_len + 1
            return (pos_q, last_q, last_s, last_len, last_right, counts)

        init = (
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.bool_(False),
            jnp.zeros(16, jnp.int32),
        )
        pos_q, last_q, last_s, last_len, last_right, counts = (
            jax.lax.while_loop(cond, body, init)
        )

        # identical-sequence and trailing-anchor cases (src/process.c:199-211)
        identical = last_len >= qlen
        trail = (~identical) & (last_right | (last_len >= 2 * threshold))
        counts = counts + equal_counts(qs, jnp.where(identical, qlen, 0))
        counts = counts + equal_counts(
            qs + last_q, jnp.where(trail, last_len, 0)
        )
        return counts

    return one_query


@functools.partial(jax.jit, static_argnames=("exact_counts",))
def replay_pairs_device(
    text, isa, rm, ml_sa, un_sa, ps_sa, subj_start, rs_len, threshold,
    q_start, q_len, exact_counts: bool,
):
    """One subject vs all query lanes; returns int32[G, 16]."""
    fn = _replay_impl(
        text, isa, rm, ml_sa, un_sa, ps_sa, subj_start, rs_len, threshold,
        exact_counts,
    )
    return jax.vmap(fn)(q_start, q_len)


@functools.partial(jax.jit, static_argnames=("exact_counts",))
def replay_rows_device(
    text,  # int32[Np]
    isa,
    rm,
    ml_sa,  # int32[Sg, Np] stats per grouped subject
    un_sa,  # bool[Sg, Np]
    ps_sa,  # int32[Sg, Np]
    subj_start,  # int32[Sg]
    rs_len,  # int32[Sg]
    threshold,  # int32[Sg]
    q_start,  # int32[G]
    q_len2d,  # int32[Sg, G] (0 disables a lane, e.g. dummy subjects)
    exact_counts: bool,
):
    """Grouped replay: all (subject, query) lanes of a subject group advance
    in one lock-step while_loop — the per-iteration dispatch cost is paid
    once for the whole group instead of once per subject (the measured
    bottleneck on tunneled devices)."""

    def per_subject(ml, un, ps, ss, rl, th, qlen_row):
        fn = _replay_impl(
            text, isa, rm, ml, un, ps, ss, rl, th, exact_counts
        )
        return jax.vmap(fn)(q_start, qlen_row)

    return jax.vmap(per_subject)(
        ml_sa, un_sa, ps_sa, subj_start, rs_len, threshold, q_len2d
    )
