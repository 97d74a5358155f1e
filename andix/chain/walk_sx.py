"""Chain walk over the subject-only index (search-in-the-loop kernel).

Same chain semantics and event contract as ``replay_device.chain_walk_flat``
(``dist_anchor``, src/process.c:141-214), but the per-probe match statistics
come from a SEEDED BINARY SEARCH in the per-subject suffix array
(``esa.subject_index``) instead of precomputed [Sg, QB] tables:

* no joint SA over subjects + queries (the 57% eco29 phase), no per-subject
  flag scans, no table HBM — queries exist on device only as 4-bit packed
  words (~1/16 the bytes of the old int32 text),
* the lucky-anchor extension (src/process.c:82-100) is the same word-compare
  primitive against the diagonal-projected subject position — the joint-text
  RMQ/LCE is gone.

The loop is a fully ASYNCHRONOUS per-lane state machine: every iteration
advances every lane by exactly one 16-symbol window compare (or one probe
bookkeeping step), whatever sub-phase that lane is in — first-window +
cache seed, lucky extension, bisection compare, left/right boundary
extension.  There is no per-phase synchronization: a lane deep in a long
extension churns alone while its neighbors start new probes.  A nested
per-phase loop design measured 2-3x slower — every sub-loop iteration
gathers ALL lanes while only its own phase's lanes are active, so the walk
(gather-volume-bound at >=512 lanes, like the table walk, PERF.md r4) paid
for each phase's max-over-lanes, not the per-lane sum.  Here total gather
volume is ~2 B per compared symbol + ~30 B of bookkeeping per probe —
within ~2x of the text-read floor.

Comparisons never need explicit length caps: the query sentinel (code 0)
and the subject separator/padding codes are outside each other's alphabets,
so every compare terminates at the true boundary (see
``subject_index`` module docstring).  Exact-match brackets come from the
k-mer cache; the bisection tracks (l_lo, l_hi) so compares resume at the
known-agreement offset (the classical SA search bound).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# probe pipeline phases (per lane)
P_FIRST = 0  # first window of a probe: cache seed (+ lucky compare)
P_LUCKY = 1  # continuing the lucky-anchor extension
P_BIS = 2  # bisection compare vs SA[mid]
P_AEXT = 3  # left-boundary extension vs SA[ip-1]
P_BEXT = 4  # right-boundary extension vs SA[ip]


def _combine_window(w0, w1, r):
    """16-symbol window starting ``r`` nibbles into w0 (0 <= r <= 15)."""
    return jnp.where(
        r > 0,
        (w0 << (4 * r)) | ((w1 >> (4 * (16 - jnp.maximum(r, 1)))) &
                           ((jnp.int64(1) << (4 * jnp.maximum(r, 1))) - 1)),
        w0,
    )


def _word_lcp(wa, wb):
    """Agreeing symbols between two windows (16 iff equal)."""
    return (jax.lax.clz(wa ^ wb) >> 2).astype(jnp.int32)


def _nibble(w, i):
    return ((w >> (4 * (15 - i))) & 15).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("cache_k", "ecap", "unroll"))
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
    unroll: int = 8,
):
    """Resumable flat-lane chain walk chunk (``chain_walk_flat`` contract):
    lanes enter at an arbitrary chain state and stop at ``seg_end`` /
    their event budget / the chunk iteration budget; lanes cut mid-probe
    re-enter at the probe start (pos is only advanced at probe ends).

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

    def lucky_cond(pos, lq, ls, ll, fin):
        """Reference lucky-anchor precondition (src/process.c:82-100,156):
        within threshold of the last anchor, projected onto the diagonal."""
        in_range = (~fin) & (pos < seg_end)
        advance = pos - lq
        gap = advance - ll
        try_s = ls + advance
        return in_range & (try_s < rl) & (gap >= 0) & (gap <= thr), try_s

    def setup_sp(pos, lq, ls, ll, fin):
        pre, try_s = lucky_cond(pos, lq, ls, ll, fin)
        return jnp.where(pre, try_s, 0)

    def iteration(lanes_state, stage, u):
        (pos, lq, ls, ll, fin, evn,
         ph, h, sp, lo, hi, llo, lhi, ipv, aa, pav) = lanes_state

        act = ~fin
        qa = qwb + jnp.where(act, pos, 0)
        sp_s = jnp.where(act, sp, 0)
        wq = qwin(qa + h)
        ws = swin(sp_s + h)
        m = _word_lcp(wq, ws)
        mi = jnp.minimum(m, 15)
        qn = _nibble(wq, mi)
        sn = _nibble(ws, mi)
        mm = m < 16

        # --- P_FIRST: k-mer code + cache bracket (all first lanes) ---
        is_first = act & (ph == P_FIRST)
        code = jnp.zeros(lb, jnp.int32)
        valid = is_first
        for i in range(cache_k):
            nib = _nibble(wq, i)
            valid = valid & (nib >= 4) & (nib <= 7)
            code = (code << 2) | jnp.clip(nib - 4, 0, 3)
        safe_code = jnp.where(valid, code, 0)
        clo = cache2[row, safe_code]
        chi = cache2[row, safe_code + 1]
        lo = jnp.where(is_first, jnp.where(valid, clo, 0), lo)
        hi = jnp.where(is_first, jnp.where(valid, chi, nr), hi)
        llo = jnp.where(is_first, 0, llo)
        lhi = jnp.where(is_first, 0, lhi)

        lucky_pre, _try_s = lucky_cond(pos, lq, ls, ll, fin)
        lucky_pre = lucky_pre & is_first
        in_lucky = (act & (ph == P_LUCKY)) | lucky_pre
        in_bis = act & (ph == P_BIS)
        in_a = act & (ph == P_AEXT)
        in_b = act & (ph == P_BEXT)
        first_nl = is_first & ~lucky_pre

        comparing = in_lucky | in_bis | in_a | in_b
        lcp_here = h + m  # total agreement of the current compare

        # --- resolutions (mismatch this iteration) ---
        l_done = in_lucky & mm
        l_acc = l_done & (lcp_here >= thr)
        l_fail = l_done & ~l_acc

        b_done = in_bis & mm
        mid = (lo + hi) >> 1
        qless = qn < sn
        go_hi = b_done & qless
        go_lo = b_done & ~qless
        hi = jnp.where(go_hi, mid, hi)
        lhi = jnp.where(go_hi, lcp_here, lhi)
        lo = jnp.where(go_lo, mid + 1, lo)
        llo = jnp.where(go_lo, lcp_here, llo)

        a_done = in_a & mm
        aa = jnp.where(a_done, lcp_here, aa)
        bdone2 = in_b & mm
        bv = jnp.where(bdone2, lcp_here, -1)

        # --- transitions ---
        enter_search = l_fail | first_nl
        bis_exit = (enter_search & (lo >= hi)) | (b_done & (lo >= hi))
        ipv = jnp.where(bis_exit, lo, ipv)
        to_bis = (enter_search | b_done) & (lo < hi)
        has_a = ipv > 0
        has_b = ipv < nr
        to_a = bis_exit & has_a
        to_b = (bis_exit & ~has_a & has_b) | (a_done & has_b)
        aa = jnp.where(bis_exit & ~has_a, -1, aa)
        finishing = (
            l_acc
            | (bis_exit & ~has_a & ~has_b)
            | (a_done & ~has_b)
            | bdone2
        )

        # one transition gather serves BIS-next-mid / A-entry / B-entry
        mid2 = (lo + hi) >> 1
        tg_idx = jnp.where(
            to_bis,
            mid2,
            jnp.where(to_a, ipv - 1, jnp.where(to_b, ipv, 0)),
        )
        tg = sa2[row, tg_idx]
        pav = jnp.where(to_a, tg, pav)

        # --- FINAL: (ml, unique, ps), chain update, next-probe setup ---
        pa_val = jnp.where(a_done, sp, pav)
        pb_val = sp  # only consumed on the bdone2 path
        ml = jnp.maximum(jnp.maximum(aa, bv), 0)
        use_a = aa >= bv
        lcpA = lcp2[row, jnp.maximum(ipv - 1, 0)]
        ip1s = jnp.where(ipv + 1 < nr, ipv + 1, 0)
        lcpB = lcp2[row, ip1s]
        unique = (
            (ml > 0)
            & (aa != bv)
            & jnp.where(
                use_a, lcpA < aa, (ipv + 1 >= nr) | (lcpB < bv)
            )
        )
        psv = jnp.where(use_a, pa_val, pb_val)

        found = l_acc | (finishing & ~l_acc & unique & (ml >= thr))
        this_len = jnp.where(l_acc, lcp_here, ml)
        this_s = jnp.where(l_acc, sp, psv)

        # chain update (probe position is pre-advance ``pos``)
        ev_pos = pos
        lq = jnp.where(found, pos, lq)
        ls = jnp.where(found, this_s, ls)
        ll = jnp.where(found, this_len, ll)
        pos = jnp.where(finishing, pos + this_len + 1, pos)
        evn = evn + found.astype(jnp.int32)
        fin = fin | (
            finishing & ((pos >= seg_end) | (evn >= max_events))
        )

        # --- next phase / compare state ---
        ph = jnp.where(in_lucky & ~mm, P_LUCKY, ph)  # keep extending
        ph = jnp.where(to_bis, P_BIS, ph)
        ph = jnp.where(to_a, P_AEXT, ph)
        ph = jnp.where(to_b, P_BEXT, ph)
        ph = jnp.where(finishing, P_FIRST, ph)
        off2 = jnp.minimum(llo, lhi)
        h = jnp.where(comparing & ~mm, h + 16, h)
        h = jnp.where(to_bis, off2, h)
        h = jnp.where(to_a, llo, h)
        h = jnp.where(to_b, lhi, h)
        h = jnp.where(finishing, 0, h)
        sp = jnp.where(to_bis | to_a | to_b, tg, sp)
        sp = jnp.where(
            finishing, setup_sp(pos, lq, ls, ll, fin), sp
        )
        aa = jnp.where(finishing, -1, aa)

        # --- stage the event (flushed once per super-step: the big-buffer
        # compaction/scatter measured ~1 ms per loop iteration, dominating
        # every other per-iteration cost — same lesson as the table
        # kernel's probe unroll) ---
        f = found.astype(jnp.int32)
        lane_len = (lane_iota.astype(jnp.int64) << 32) | this_len.astype(
            jnp.int64
        )
        q_s = (ev_pos.astype(jnp.int64) << 32) | this_s.astype(jnp.int64)
        st_ll, st_qs, st_f = stage
        st_ll = jax.lax.dynamic_update_index_in_dim(st_ll, lane_len, u, 0)
        st_qs = jax.lax.dynamic_update_index_in_dim(st_qs, q_s, u, 0)
        st_f = jax.lax.dynamic_update_index_in_dim(st_f, f, u, 0)

        return (
            (pos, lq, ls, ll, fin, evn,
             ph, h, sp, lo, hi, llo, lhi, ipv, aa, pav),
            (st_ll, st_qs, st_f),
        )

    def super_body(state):
        lanes_state, ev_lane_len, ev_qs, ev_cnt, ovf, it = state
        stage = (
            jnp.zeros((unroll, lb), jnp.int64),
            jnp.zeros((unroll, lb), jnp.int64),
            jnp.zeros((unroll, lb), jnp.int32),
        )

        def inner(u, st):
            return iteration(st[0], st[1], u)

        lanes_state, stage = jax.lax.fori_loop(
            0, unroll, inner, (lanes_state, stage)
        )
        st_ll, st_qs, st_f = stage
        # u-major flatten keeps chain order per lane (iterations are
        # ordered; within one iteration, distinct lanes)
        f = st_f.reshape(-1)
        excl = jnp.cumsum(f, dtype=jnp.int32) - f
        slot = jnp.where(f > 0, ev_cnt + excl, ecap)
        ev_lane_len = ev_lane_len.at[slot].set(
            st_ll.reshape(-1), mode="drop"
        )
        ev_qs = ev_qs.at[slot].set(st_qs.reshape(-1), mode="drop")
        ev_cnt = ev_cnt + jnp.sum(f, dtype=jnp.int32)
        ovf = ovf | (ev_cnt > ecap)
        return (lanes_state, ev_lane_len, ev_qs, ev_cnt, ovf, it + unroll)

    def cond(state):
        return jnp.any(~state[0][4]) & (state[-1] < max_iters)

    fin0 = (pos0 >= seg_end) | (jnp.int32(0) >= max_events)
    z = jnp.zeros(lb, jnp.int32)
    sp0 = setup_sp(pos0, lq0, ls0, ll0, fin0)
    lanes0 = (pos0, lq0, ls0, ll0, fin0, z,
              z, z, sp0, z, z, z, z, z, jnp.full(lb, -1, jnp.int32), z)
    init = (lanes0,
            jnp.zeros(ecap, jnp.int64), jnp.zeros(ecap, jnp.int64),
            jnp.zeros((), jnp.int32), jnp.bool_(False),
            jnp.zeros((), jnp.int32))
    final = jax.lax.while_loop(cond, super_body, init)
    (lanes_f, ev_lane_len, ev_qs, ev_cnt, ovf, it) = final
    (pos, lq, ls, ll, fin, _evn,
     _ph, _h, _sp, _lo, _hi, _llo, _lhi, _ipv, _aa, _pav) = lanes_f
    ev_lane = (ev_lane_len >> 32).astype(jnp.int32)
    ev_len = (ev_lane_len & 0x7FFFFFFF).astype(jnp.int32)
    ev_q = (ev_qs >> 32).astype(jnp.int32)
    ev_s = (ev_qs & 0x7FFFFFFF).astype(jnp.int32)
    return (ev_lane, ev_q, ev_s, ev_len, ev_cnt, ovf, it,
            pos, lq, ls, ll, fin)
