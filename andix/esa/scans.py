"""Device-side scan primitives for matching statistics.

``segmented_min_scan``: inclusive min-scan with resets, evaluated two-level —
an in-chunk ``lax.scan`` vectorized across chunks (O(N) work, ``chunk``
sequential steps) plus a ``lax.associative_scan`` over the (few) chunk
carries.  This is the device analogue of
``andix.esa.matchstats_np.segmented_min_scan``; a plain
``lax.associative_scan`` over all N elements would do O(N log N) work and
memory traffic, which dominates at genome scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF32 = jnp.int32(2**31 - 1)


def _fs_combine(a, b):
    """Window-composition monoid for flag scans.

    State fields (k, pre, g, sa, suf): number of flags (capped at 2), min of
    values before the first flag, value-gap recorded at the last flag, sa
    payload of the last flag, min of values after the last flag.  Identity:
    (0, INF, INF, -1, INF)."""
    k1, p1, g1, s1, f1 = a
    k2, p2, g2, s2, f2 = b
    k = jnp.minimum(k1 + k2, 2)
    has1 = k1 > 0
    has2 = k2 > 0
    pre = jnp.where(has1, p1, jnp.minimum(p1, p2))
    sa_ = jnp.where(has2, s2, s1)
    bridge = jnp.minimum(f1, p2)
    g = jnp.where(
        has2,
        jnp.where(k2 >= 2, g2, jnp.where(has1, bridge, INF32)),
        g1,
    )
    suf = jnp.where(has2, f2, jnp.where(has1, bridge, INF32))
    return (k, pre, g, sa_, suf)


@functools.partial(jax.jit, static_argnames=("chunk",))
def flag_scan(values: jax.Array, flags: jax.Array, sa_vals: jax.Array,
              chunk: int = 1024):
    """Inclusive scan of the flag-window monoid: per position returns

    * ``k``   — number of flagged entries seen so far (capped at 2),
    * ``g``   — min of values in (second-last flag, last flag] (the LCP
      between the two nearest flagged suffixes),
    * ``sa``  — payload (suffix position) of the last flagged entry,
    * ``suf`` — min of values in (last flag, here] (the LCP to the nearest
      flagged suffix).

    Flagged elements contribute their value to the gap ending at them and
    then reset the running min.  This carries everything the matching
    statistics need in one contiguous pass — no random gathers.  Same
    two-level evaluation as ``segmented_min_scan``."""
    n = values.shape[0]
    nb = -(-n // chunk)
    pad = nb * chunk - n
    v = jnp.concatenate([values.astype(jnp.int32), jnp.full(pad, INF32)])
    fl = jnp.concatenate([flags.astype(bool), jnp.zeros(pad, dtype=bool)])
    sv = jnp.concatenate(
        [sa_vals.astype(jnp.int32), jnp.full(pad, jnp.int32(-1))]
    )

    def t2(x):
        return x.reshape(nb, chunk).T  # (chunk, nb)

    k_e = t2(fl.astype(jnp.int32))
    pre_e = t2(v)
    sa_e = t2(jnp.where(fl, sv, -1))
    g_e = jnp.full((chunk, nb), INF32)
    suf_e = jnp.full((chunk, nb), INF32)

    def step(carry, x):
        out = _fs_combine(carry, x)
        return out, out

    ident = (
        jnp.zeros(nb, jnp.int32),
        jnp.full(nb, INF32),
        jnp.full(nb, INF32),
        jnp.full(nb, jnp.int32(-1)),
        jnp.full(nb, INF32),
    )
    final, states = jax.lax.scan(step, ident, (k_e, pre_e, g_e, sa_e, suf_e))

    # exclusive chunk prefixes via associative scan over chunk summaries
    inc = jax.lax.associative_scan(_fs_combine, final)
    prefix = tuple(
        jnp.concatenate([i0[None], x[:-1]])
        for i0, x in zip(
            (jnp.int32(0), INF32, INF32, jnp.int32(-1), INF32), inc
        )
    )
    combined = _fs_combine(tuple(p[None, :] for p in prefix), states)

    def back(x):
        return x.T.reshape(-1)[:n]

    k, _, g, sa_, suf = combined
    return back(k), back(g), back(sa_), back(suf)


@functools.partial(jax.jit, static_argnames=("chunk",))
def segmented_min_scan(values: jax.Array, resets: jax.Array,
                       chunk: int = 1024) -> jax.Array:
    """out[t] = values[t] if resets[t] else min(out[t-1], values[t]).

    ``values`` int32, ``resets`` bool.  Padding uses resets=True so the tail
    never leaks into real lanes.
    """
    n = values.shape[0]
    nb = -(-n // chunk)
    pad = nb * chunk - n
    v = jnp.concatenate([values.astype(jnp.int32), jnp.full(pad, INF32)])
    r = jnp.concatenate([resets.astype(bool), jnp.ones(pad, dtype=bool)])
    v2 = v.reshape(nb, chunk).T  # (chunk, nb): scan over in-chunk offset
    r2 = r.reshape(nb, chunk).T

    def step(carry, x):
        cur, seen = carry
        vj, rj = x
        cur = jnp.where(rj, vj, jnp.minimum(cur, vj))
        seen = seen | rj
        return (cur, seen), (cur, seen)

    init = (jnp.full(nb, INF32), jnp.zeros(nb, dtype=bool))
    (cur_last, seen_last), (out2, seen2) = jax.lax.scan(step, init, (v2, r2))
    # out2/seen2: (chunk, nb)

    # carry across chunks: inclusive segmented scan over chunk summaries
    def combine(a, b):
        sa_, ma = a
        sb, mb = b
        return sa_ | sb, jnp.where(sb, mb, jnp.minimum(ma, mb))

    seen_inc, min_inc = jax.lax.associative_scan(
        combine, (seen_last, cur_last)
    )
    # exclusive prefix for each chunk: identity (False, INF) shifted right
    prefix = jnp.concatenate([jnp.array([INF32]), min_inc[:-1]])

    out2 = jnp.where(seen2, out2, jnp.minimum(prefix[None, :], out2))
    return out2.T.reshape(-1)[:n]
