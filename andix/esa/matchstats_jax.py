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

from .scans import flag_scan

NEG1 = jnp.int32(-1)


@jax.jit
def match_stats_device(
    sa: jax.Array,  # int32[N]
    lcp: jax.Array,  # int32[N]
    segid: jax.Array,  # int32[N] segment of SA[t]
    subj_seg: jax.Array,  # scalar int32
    subj_start: jax.Array,  # scalar int32
):
    """All fields come from two flag scans (contiguous passes) — no random
    gathers; see ``scans.flag_scan``."""
    flag = segid == subj_seg
    sa_rel = sa - subj_start  # payload: position within RS_i

    # --- upward: values lcp[t] = lcp(SA[t-1], SA[t]) ---
    k_up, g_up, sa_up, suf_up = flag_scan(lcp, flag, sa_rel)
    has_up = k_up >= 1
    u = jnp.where(has_up, suf_up, NEG1)
    pos_up = sa_up
    gap_up = g_up
    has_up2 = k_up >= 2

    # --- downward: values lcp[t+1], processed in reverse ---
    vals_down = jnp.concatenate([lcp[1:], jnp.full(1, jnp.int32(2**31 - 1))])
    k_dn, g_dn, sa_dn, suf_dn = flag_scan(
        vals_down[::-1], flag[::-1], sa_rel[::-1]
    )
    k_dn = k_dn[::-1]
    g_dn = g_dn[::-1]
    sa_dn = sa_dn[::-1]
    suf_dn = suf_dn[::-1]
    has_down = k_dn >= 1
    d = jnp.where(has_down, suf_dn, NEG1)
    pos_down = sa_dn
    gap_down = g_dn
    has_down2 = k_dn >= 2

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
