"""Fully-traced device ESA pipeline: text → SA → LCP → matching statistics.

Unlike the production single-chip path (which uses a Python round loop with
early exit and the native host LCP), everything here stays inside one jit:

* ``suffix_array_with_levels`` — fixed-round prefix doubling that also
  returns the rank array of every width (1, 2, 4, ...),
* ``lcp_from_levels`` — adjacent LCP by walking the rank levels top-down
  (h += w whenever rank_w[a+h] == rank_w[b+h]); exact because padded texts
  never let two suffixes tie past their true LCP,
* ``esa_matchstats_step`` — the composed per-subject matching-statistics
  step used by ``__graft_entry__.entry`` and the sharded multi-chip step.

Memory: levels cost rounds × N × 4 bytes, so this path suits sharded
per-device blocks and validation shapes; huge single-chip blocks use the
host-LCP path in ``backend_jax`` instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import matchstats_jax
from .doubling import BASE_WIDTH, _doubling_round, _initial_ranks, _sa_from_rank


@functools.partial(jax.jit, static_argnames=("rounds",))
def suffix_array_with_levels(sym: jax.Array, rounds: int):
    """Returns (sa, levels) where levels[r] is the rank array of width
    BASE_WIDTH * 2^r, r = 0..rounds.  Requires BASE_WIDTH * 2^rounds >=
    maximal LCP + 1 (guaranteed when >= len(sym)).  Uses the packed
    initial ranks — inputs must satisfy the block-text contract
    (``doubling._initial_ranks``)."""
    length = int(sym.shape[0])
    rank, _, _ = _initial_ranks(sym, length, packed=True)
    levels = [rank]
    order = _sa_from_rank(rank, length)
    k = BASE_WIDTH
    for _ in range(rounds):
        rank, _, order = _doubling_round(rank, jnp.int32(min(k, length)), length)
        levels.append(rank)
        k *= 2
    return order, jnp.stack(levels)


@functools.partial(jax.jit, static_argnames=("base_width",))
def lcp_from_levels(
    sa: jax.Array,
    levels: jax.Array,
    sym: jax.Array,
    base_width: int = BASE_WIDTH,
) -> jax.Array:
    """Adjacent-LCP array from rank levels: lcp[t] = lcp(SA[t-1], SA[t]),
    lcp[0] = 0.  One vectorized compare-and-advance per level (width
    base_width * 2^r), then base_width-1 direct symbol-compare steps for
    the sub-width remainder."""
    n = sa.shape[0]
    nlev = levels.shape[0]
    a = jnp.concatenate([sa[:1], sa[:-1]])  # previous suffix (a[0] unused)
    b = sa
    h = jnp.zeros(n, jnp.int32)
    for r in range(nlev - 1, -1, -1):
        w = jnp.int32(base_width << r)
        ai = a + h
        bi = b + h
        ok = (ai < n) & (bi < n)
        ra = levels[r][jnp.minimum(ai, n - 1)]
        rb = levels[r][jnp.minimum(bi, n - 1)]
        h = jnp.where(ok & (ra == rb), h + w, h)
    for _ in range(base_width - 1):
        ai = a + h
        bi = b + h
        ok = (ai < n) & (bi < n)
        ea = sym[jnp.minimum(ai, n - 1)]
        eb = sym[jnp.minimum(bi, n - 1)]
        h = jnp.where(ok & (ea == eb), h + 1, h)
    return h.at[0].set(0)


@jax.jit
def esa_matchstats_step(
    sym: jax.Array,  # int32[N] padded joint text
    seg_start: jax.Array,  # int64[nseg+1]
    subj_seg: jax.Array,  # scalar int32
    subj_start: jax.Array,  # scalar int32
    tq: jax.Array,  # int32[QB] text positions of query blob (padded)
    sa: jax.Array,
    lcp: jax.Array,
):
    """Matching statistics for one subject given a prebuilt (sa, lcp)."""
    segid = (
        jnp.searchsorted(seg_start, sa.astype(jnp.int64), side="right") - 1
    ).astype(jnp.int32)
    ml, un, ps = matchstats_jax.match_stats_device(
        sa, lcp, segid, subj_seg, subj_start
    )
    isa = matchstats_jax.inverse_sa_device(sa)
    tq_sa = isa[tq]
    return ml[tq_sa], un[tq_sa], ps[tq_sa]


@functools.partial(jax.jit, static_argnames=("rounds",))
def full_subject_step(
    sym: jax.Array,
    seg_start: jax.Array,
    subj_seg: jax.Array,
    subj_start: jax.Array,
    tq: jax.Array,
    rounds: int,
):
    """End-to-end: padded text → SA → LCP → per-query match statistics for
    one subject.  Fully traced (no host round trips) — the single-chip
    'forward step' of the engine."""
    sa, levels = suffix_array_with_levels(sym, rounds)
    lcp = lcp_from_levels(sa, levels, sym)
    return esa_matchstats_step(
        sym, seg_start, subj_seg, subj_start, tq, sa, lcp
    )


@jax.jit
def full_subject_step_loop(
    sym: jax.Array,
    seg_start: jax.Array,
    subj_seg: jax.Array,
    subj_start: jax.Array,
    tq: jax.Array,
):
    """Production variant of ``full_subject_step``: the device-resident
    early-exit doubling loop + bucketed tail tiers + level-walk LCP
    (``doubling._sa_lcp_core``) instead of fixed unrolled rounds — the
    same program the single-chip and sharded schedules run."""
    from .doubling import _BUCKET_FRAC, _sa_lcp_core, _tail_tiers, levels_needed

    length = int(sym.shape[0])
    thr0 = int(length * _BUCKET_FRAC)
    sa, lcp, _ = _sa_lcp_core(
        sym, packed=True, L=levels_needed(length, packed=True),
        thr0=thr0, tiers=_tail_tiers(length, thr0), want_lcp=True,
    )
    return esa_matchstats_step(
        sym, seg_start, subj_seg, subj_start, tq, sa, lcp
    )
