"""Chain walk over the subject-only index (search-in-the-loop kernel).

Same chain semantics and event contract as ``replay_device.chain_walk_flat``
(``dist_anchor``, src/process.c:141-214), but the per-probe match statistics
come from a SEEDED BINARY SEARCH in the per-subject suffix array
(``esa.subject_index``) instead of precomputed [Sg, QB] tables:

* no joint SA over subjects + queries (the 57% eco29 phase), no per-subject
  flag scans, no table HBM — queries exist on device only as 4-bit packed
  words (~1/16 the bytes of the old int32 text),
* each probe: k-mer code (1 window) -> cache bracket (1 gather) ->
  1-3 bisect steps (each one SA gather + a word-compare extension) ->
  two boundary extensions + adjacent-LCP uniqueness gathers.  Typical
  volume ~10-20 gathered elements per probe vs ~35 for the table path,
  at ~6-10x the sequential depth per probe (the extensions are lock-step
  word loops).  Segmentation (``chain.segmented``) divides that depth by K
  exactly as for the table kernel — this kernel implements the same
  resumable flat-lane contract, so the segmented driver works unchanged.
* the lucky-anchor extension (src/process.c:82-100) is the same word-compare
  primitive against the diagonal-projected subject position — the joint-text
  RMQ/LCE is gone.

Comparisons never need explicit length caps: the query sentinel (code 0)
and the subject separator/padding codes are outside each other's alphabets,
so every compare terminates at the true boundary (see
``subject_index`` module docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _combine_window(w0, w1, r):
    """16-symbol window starting ``r`` nibbles into w0 (0 <= r <= 15)."""
    shifted = jnp.where(
        r > 0,
        (w0 << (4 * r)) | ((w1 >> (4 * (16 - jnp.maximum(r, 1)))) &
                           ((jnp.int64(1) << (4 * jnp.maximum(r, 1))) - 1)),
        w0,
    )
    return shifted


def _word_lcp(wa, wb):
    """Agreeing symbols between two windows (16 iff equal)."""
    return (jax.lax.clz(wa ^ wb) >> 2).astype(jnp.int32)


def _nibble(w, i):
    return ((w >> (4 * (15 - i))) & 15).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cache_k", "ecap"))
def chain_walk_flat_sx(
    sa2,  # int32[S, Lp] per-subject suffix arrays
    lcp2,  # int32[S, Lp] per-subject adjacent LCP
    sw,  # int64[S, Lp//16] subject packed words
    cache2,  # int32[S, 4^cache_k + 1] k-mer insertion points
    nreal,  # int32[S] real text length per subject (RS + separator)
    qw,  # int64[QW] query packed words (queries + sentinels, padded)
    row,  # int32[Lb] subject row of each lane
    qwb,  # int32[Lb] query base (symbol offset into the qw blob)
    rl,  # int32[Lb] RS length (n_real - 1)
    thr,  # int32[Lb] anchor threshold
    seg_end,  # int32[Lb] lane-relative stop position (exclusive)
    pos0,  # int32[Lb] entry probe position
    lq0,  # int32[Lb] entry last-anchor query position
    ls0,  # int32[Lb] entry last-anchor subject position
    ll0,  # int32[Lb] entry last-anchor length
    max_iters,  # int32 scalar (traced)
    max_events,  # int32 scalar (traced): per-lane event budget
    cache_k: int,
    ecap: int,
):
    """Resumable flat-lane chain walk chunk (``chain_walk_flat`` contract).

    Returns (ev_lane, ev_q, ev_s, ev_len, ev_cnt, ovf, iters,
    pos, lq, ls, ll, fin)."""
    lb = row.shape[0]
    lanes_sq = sw.shape[1]
    qw_last = qw.shape[0] - 1
    lane_iota = jnp.arange(lb, dtype=jnp.int32)
    nr = nreal[row]

    def qwin(p):
        j = p >> 4
        r = p & 15
        w0 = qw[jnp.minimum(j, qw_last)]
        w1 = qw[jnp.minimum(j + 1, qw_last)]
        return _combine_window(w0, w1, r)

    def swin(p):
        j = p >> 4
        r = p & 15
        w0 = sw[row, jnp.minimum(j, lanes_sq - 1)]
        w1 = sw[row, jnp.minimum(j + 1, lanes_sq - 1)]
        return _combine_window(w0, w1, r)

    def extend(qa, sp, act):
        """(lcp, q_less): word-ladder compare of query window at absolute
        symbol qa vs subject window at sp, both clamped safe under ~act.
        Terminates at the query sentinel / subject separator at the
        latest (codes outside the other side's alphabet)."""
        qa = jnp.where(act, qa, 0)
        sp = jnp.where(act, sp, 0)

        def cond(st):
            return jnp.any(st[1])

        def body(st):
            h, run, qn, sn = st
            wq = qwin(qa + h)
            ws = swin(sp + h)
            m = _word_lcp(wq, ws)
            hit = run & (m < 16)
            mi = jnp.minimum(m, 15)
            qn = jnp.where(hit, _nibble(wq, mi), qn)
            sn = jnp.where(hit, _nibble(ws, mi), sn)
            h = jnp.where(run, h + m, h)
            run = run & ~hit
            return h, run, qn, sn

        z = jnp.zeros(lb, jnp.int32)
        h, _, qn, sn = jax.lax.while_loop(
            cond, body, (z, act, z, z)
        )
        return h, qn < sn

    def search(pos, need):
        """(ml, unique, ps) of each lane's query suffix at lane-relative
        ``pos`` vs its subject (exact ``subject_index.search_np``
        semantics)."""
        qa = qwb + jnp.where(need, pos, 0)
        win = qwin(qa)
        code = jnp.zeros(lb, jnp.int32)
        valid = need
        for i in range(cache_k):
            nib = _nibble(win, i)
            valid = valid & (nib >= 4) & (nib <= 7)
            code = (code << 2) | jnp.clip(nib - 4, 0, 3)
        safe_code = jnp.where(valid, code, 0)
        lo = jnp.where(valid, cache2[row, safe_code], 0)
        hi = jnp.where(
            valid, cache2[row, safe_code + 1], jnp.where(need, nr, 0)
        )
        l_lo = jnp.zeros(lb, jnp.int32)
        l_hi = jnp.zeros(lb, jnp.int32)

        def bcond(st):
            lo, hi = st[0], st[1]
            return jnp.any(lo < hi)

        def bbody(st):
            lo, hi, l_lo, l_hi = st
            act = lo < hi
            mid = jnp.where(act, (lo + hi) >> 1, 0)
            spos = sa2[row, mid]
            off = jnp.minimum(l_lo, l_hi)
            rel, q_less = extend(qa + off, spos + off, act)
            lcpm = off + rel
            go_hi = act & q_less
            go_lo = act & ~q_less
            hi = jnp.where(go_hi, mid, hi)
            l_hi = jnp.where(go_hi, lcpm, l_hi)
            lo = jnp.where(go_lo, mid + 1, lo)
            l_lo = jnp.where(go_lo, lcpm, l_lo)
            return lo, hi, l_lo, l_hi

        lo, hi, l_lo, l_hi = jax.lax.while_loop(
            bcond, bbody, (lo, hi, l_lo, l_hi)
        )
        ip = lo
        has_a = need & (ip > 0)
        has_b = need & (ip < nr)
        pa = sa2[row, jnp.maximum(ip - 1, 0)]
        pb = sa2[row, jnp.where(has_b, ip, 0)]
        a_rel, _ = extend(qa + l_lo, pa + l_lo, has_a)
        b_rel, _ = extend(qa + l_hi, pb + l_hi, has_b)
        a = jnp.where(has_a, l_lo + a_rel, -1)
        b = jnp.where(has_b, l_hi + b_rel, -1)
        ml = jnp.maximum(jnp.maximum(a, b), 0)
        use_a = a >= b
        sec_a = lcp2[row, jnp.maximum(ip - 1, 0)] < a
        ip1 = jnp.where(need & (ip + 1 < nr), ip + 1, 0)
        sec_b = (ip + 1 >= nr) | (lcp2[row, ip1] < b)
        unique = (
            need & (ml > 0) & (a != b) & jnp.where(use_a, sec_a, sec_b)
        )
        ps = jnp.where(use_a, pa, pb)
        return ml, unique, ps

    def one_step(pos, lq, ls, ll, fin, evn):
        probe = ~fin
        in_range = probe & (pos < seg_end)
        safe_pos = jnp.where(in_range, pos, 0)
        qa = qwb + safe_pos

        advance = safe_pos - lq
        gap = advance - ll
        try_s = ls + advance
        lucky_pre = in_range & (try_s < rl) & (gap >= 0) & (gap <= thr)
        lucky_len = jax.lax.cond(
            jnp.any(lucky_pre),
            lambda: extend(qa, jnp.where(lucky_pre, try_s, 0), lucky_pre)[0],
            lambda: jnp.zeros(lb, jnp.int32),
        )
        lucky_found = lucky_pre & (lucky_len >= thr)

        need = in_range & ~lucky_found
        ml, un, ps = search(safe_pos, need)

        found = in_range & (lucky_found | (un & (ml >= thr)))
        this_len = jnp.where(lucky_found, lucky_len, ml)
        this_s = jnp.where(lucky_found, try_s, ps)

        lq = jnp.where(found, safe_pos, lq)
        ls = jnp.where(found, this_s, ls)
        ll = jnp.where(found, this_len, ll)
        pos = jnp.where(
            probe,
            jnp.where(in_range, safe_pos + this_len + 1, pos),
            pos,
        )
        evn = evn + found.astype(jnp.int32)
        fin = fin | (probe & ((pos >= seg_end) | (evn >= max_events)))
        return (pos, lq, ls, ll, fin, evn,
                found, safe_pos, this_s, this_len)

    def cond(state):
        return jnp.any(~state[4]) & (state[-1] < max_iters)

    def body(state):
        (pos, lq, ls, ll, fin, evn,
         ev_lane_len, ev_qs, ev_cnt, ovf, it) = state
        (pos, lq, ls, ll, fin, evn,
         found, pos_qj, this_s, this_len) = one_step(
            pos, lq, ls, ll, fin, evn
        )
        f = found.astype(jnp.int32)
        excl = jnp.cumsum(f, dtype=jnp.int32) - f
        slot = jnp.where(f > 0, ev_cnt + excl, ecap)
        lane_len = (lane_iota.astype(jnp.int64) << 32) | this_len.astype(
            jnp.int64
        )
        q_s = (pos_qj.astype(jnp.int64) << 32) | this_s.astype(jnp.int64)
        ev_lane_len = ev_lane_len.at[slot].set(lane_len, mode="drop")
        ev_qs = ev_qs.at[slot].set(q_s, mode="drop")
        ev_cnt = ev_cnt + jnp.sum(f, dtype=jnp.int32)
        ovf = ovf | (ev_cnt > ecap)
        return (pos, lq, ls, ll, fin, evn,
                ev_lane_len, ev_qs, ev_cnt, ovf, it + 1)

    fin0 = (pos0 >= seg_end) | (jnp.int32(0) >= max_events)
    init = (pos0, lq0, ls0, ll0, fin0, jnp.zeros(lb, jnp.int32),
            jnp.zeros(ecap, jnp.int64), jnp.zeros(ecap, jnp.int64),
            jnp.zeros((), jnp.int32), jnp.bool_(False),
            jnp.zeros((), jnp.int32))
    final = jax.lax.while_loop(cond, body, init)
    (pos, lq, ls, ll, fin, _evn,
     ev_lane_len, ev_qs, ev_cnt, ovf, it) = final
    ev_lane = (ev_lane_len >> 32).astype(jnp.int32)
    ev_len = (ev_lane_len & 0x7FFFFFFF).astype(jnp.int32)
    ev_q = (ev_qs >> 32).astype(jnp.int32)
    ev_s = (ev_qs & 0x7FFFFFFF).astype(jnp.int32)
    return (ev_lane, ev_q, ev_s, ev_len, ev_cnt, ovf, it,
            pos, lq, ls, ll, fin)
