"""Matching statistics on device (JAX) — mirror of ``matchstats_np``.

One jitted function computes, for every joint-SA entry at once, the longest
match / uniqueness / subject position against one subject segment.  The
subject segment id is a traced scalar so the same compiled program serves
every subject of a block (no retraces).  See ``matchstats_np`` for the
derivation and the reference-semantics mapping (get_match_cached /
anchor(), src/esa.c:636-656, src/process.c:113-123).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .scans import segmented_min_scan

NEG1 = jnp.int32(-1)


@jax.jit
def match_stats_device(
    sa: jax.Array,  # int32[N]
    lcp: jax.Array,  # int32[N]
    segid: jax.Array,  # int32[N] segment of SA[t]
    subj_seg: jax.Array,  # scalar int32
    subj_start: jax.Array,  # scalar int32
):
    n = sa.shape[0]
    t = jnp.arange(n, dtype=jnp.int32)
    flag = segid == subj_seg

    # --- upward ---
    last_i = jax.lax.cummax(jnp.where(flag, t, NEG1))
    reset_up = jnp.concatenate([jnp.zeros(1, bool), flag[:-1]])
    up = segmented_min_scan(lcp, reset_up)
    cnt = jnp.cumsum(flag.astype(jnp.int32), dtype=jnp.int32)
    has_up = last_i >= 0
    u = jnp.where(has_up, up, NEG1)
    li = jnp.maximum(last_i, 0)
    pos_up = sa[li] - subj_start
    gap_up = up[li]
    has_up2 = has_up & (cnt[li] >= 2)

    # --- downward ---
    flag_r = flag[::-1]
    acc_r = jax.lax.cummax(jnp.where(flag_r, t, NEG1))
    rev = acc_r[::-1]
    next_i = jnp.where(rev >= 0, jnp.int32(n - 1) - rev, NEG1)
    vals_down = jnp.concatenate([lcp[1:], jnp.full(1, jnp.int32(2**31 - 1))])
    reset_down = jnp.concatenate([flag[1:], jnp.zeros(1, bool)])
    down = segmented_min_scan(vals_down[::-1], reset_down[::-1])[::-1]
    cnt_down = jnp.cumsum(flag_r.astype(jnp.int32), dtype=jnp.int32)[::-1]
    has_down = next_i >= 0
    d = jnp.where(has_down, down, NEG1)
    ni = jnp.maximum(next_i, 0)
    pos_down = sa[ni] - subj_start
    gap_down = down[ni]
    has_down2 = has_down & (cnt_down[ni] >= 2)

    # --- combine ---
    l = jnp.maximum(u, d)
    matchlen = jnp.maximum(l, 0)
    both = (u == l) & (d == l)
    second_u = jnp.where(has_up2, jnp.minimum(u, gap_up), NEG1)
    second_d = jnp.where(has_down2, jnp.minimum(d, gap_down), NEG1)
    unique = jnp.where(
        (l <= 0) | both,
        False,
        jnp.where(u == l, second_u < l, second_d < l),
    )
    pos_s = jnp.where(u == l, pos_up, pos_down)
    return matchlen, unique, pos_s


@jax.jit
def gather_query_stats(matchlen, unique, pos_s, tq):
    """Gather SA-order stats at precomputed query SA positions ``tq``."""
    return matchlen[tq], unique[tq], pos_s[tq]


@jax.jit
def inverse_sa_device(sa: jax.Array) -> jax.Array:
    n = sa.shape[0]
    return jnp.zeros(n, jnp.int32).at[sa].set(jnp.arange(n, dtype=jnp.int32))
