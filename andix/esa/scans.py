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
