"""Prefix-doubling suffix array on device (jax.lax.sort).

The TPU-native replacement for libdivsufsort (reference ``esa_init_SA``,
src/esa.c:294-304): O(log n) rounds, each one big multi-key device sort of
(rank, rank_at_offset_k, index) int32 triples — exactly the kind of regular,
memory-bandwidth-bound bulk primitive XLA maps well onto TPU.

Two refinements over plain doubling:

* **Early exit** — rounds stop once all ranks are distinct (real genomes
  resolve long before the worst case; near-identical strains need rounds up
  to their longest shared run).
* **Bucketed tail rounds** (Larsson–Sadakane style) — once the tied
  fraction drops below ``ANDIX_BUCKET_FRAC`` (default 1/4), only the
  still-tied SA slots are gathered into a compact buffer, sorted, and
  scattered back.  Ranks use *bucket-head* semantics (rank = SA position of
  the first element of the group), so splitting a group assigns new ranks
  without renumbering anything outside it.  On families of near-identical
  genomes the tied set shrinks geometrically with width, so the tail
  rounds cost O(tied) instead of O(n) — the difference between ~10 and
  ~3.5 full-size sorts per block.

Symbols are int32 (bytes + unique per-segment separators >= 256, see
``andix.esa.joint``), so no 64-bit keys are needed: two int32 sort keys
replace one packed int64 key.

Rank levels (one array per width) keep the property "equal rank at width w
⟺ equal w-prefix" under bucket-head semantics, which is all the level-walk
LCP (``device_pipeline.lcp_from_levels``) needs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


BASE_WIDTH = 4  # initial prefix width of the packed-init path

# Contract for packed=True (the block-text device paths): every non-padding
# symbol lies in [1, PACK_CLAMP - 2] (bytes 33..255 plus separators
# 256+seg, seg < ~760), and padding symbols are >= 2^20, strictly
# increasing, and form the text tail.  Arbitrary alphabets (tests, oracle
# comparisons) must use packed=False.
PACK_CLAMP = 1023

INT_MAX = jnp.int32(2**31 - 1)

# switch to bucketed rounds when tied fraction falls below this
_BUCKET_FRAC = float(os.environ.get("ANDIX_BUCKET_FRAC", "0.25"))
_MIN_BUCKET_T = 1 << 12  # smallest compact-buffer bucket


def _heads_and_tied(keys_changed: jax.Array, length: int):
    """Bucket-head ranks (in sorted order) + tied count from a sorted-order
    change mask.  head[t] = largest group start <= t."""
    iota = jnp.arange(length, dtype=jnp.int32)
    head_sorted = jax.lax.cummax(jnp.where(keys_changed, iota, 0))
    same_prev = ~keys_changed
    same_next = jnp.concatenate([same_prev[1:], jnp.zeros(1, bool)])
    tied = jnp.sum((same_prev | same_next).astype(jnp.int32))
    return head_sorted, tied


@functools.partial(jax.jit, static_argnames=("length", "packed"))
def _initial_ranks(sym: jax.Array, length: int, packed: bool = False):
    """Initial prefix ranks: width 1 (exact, any alphabet) or width
    BASE_WIDTH via ONE two-key sort (packed=True, block-text contract).

    Packed: key1 is the full symbol (keeps separators and the strictly
    increasing padding exactly ordered); key2 packs the next three symbols
    clamped to 10 bits.  Clamping is monotone, so it can only merge orders
    into ties — never invert them — and under the contract above the only
    clamped values are tail padding, whose window patterns are unique per
    position, so no information the later doubling rounds can't see is
    lost.  Out-of-range positions pack as 0 < every real symbol, matching
    shorter-suffix-sorts-first (only padding suffixes reach out of range).

    Returns (rank, tied): bucket-head ranks in text order, tied = number of
    positions whose group has >= 2 members (0 ⟺ fully resolved)."""
    idx = jnp.arange(length, dtype=jnp.int32)
    s = sym.astype(jnp.int32)

    if not packed:
        k1s, order = jax.lax.sort((s, idx), num_keys=1)
        changed = jnp.concatenate(
            [jnp.ones(1, bool), k1s[1:] != k1s[:-1]]
        )
    else:
        def clamp_at(j):
            sh = jnp.concatenate(
                [s[j:], jnp.zeros(min(j, length), jnp.int32)]
            )
            return jnp.minimum(sh, PACK_CLAMP)

        key2 = (clamp_at(1) << 20) | (clamp_at(2) << 10) | clamp_at(3)
        k1s, k2s, order = jax.lax.sort((s, key2, idx), num_keys=2)
        changed = jnp.concatenate(
            [jnp.ones(1, bool), (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])]
        )
    head_sorted, tied = _heads_and_tied(changed, length)
    rank = jnp.zeros(length, jnp.int32).at[order].set(head_sorted)
    return rank, tied, order


@functools.partial(jax.jit, static_argnames=("length",))
def _doubling_round(rank: jax.Array, k: jax.Array, length: int):
    """Full-size doubling round: sort every position by
    (rank, rank_at_offset_k).  Returns (new_rank, tied, order)."""
    idx = jnp.arange(length, dtype=jnp.int32)
    shifted = idx + k
    key2 = jnp.where(shifted < length, rank[shifted % length], jnp.int32(-1))
    r1, r2, order = jax.lax.sort((rank, key2, idx), num_keys=2)
    changed = jnp.concatenate(
        [jnp.ones(1, bool), (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])]
    )
    head_sorted, tied = _heads_and_tied(changed, length)
    new_rank = jnp.zeros(length, jnp.int32).at[order].set(head_sorted)
    return new_rank, tied, order


@functools.partial(jax.jit, static_argnames=("tp",))
def _extract_tied(rank: jax.Array, sa: jax.Array, tp: int):
    """Compact the tied SA slots into a tp-sized buffer (ascending slots;
    padding slot = N which every scatter drops)."""
    n = sa.shape[0]
    head = rank[sa]
    iota = jnp.arange(n, dtype=jnp.int32)
    same_prev = jnp.concatenate(
        [jnp.zeros(1, bool), head[1:] == head[:-1]]
    )
    same_next = jnp.concatenate([same_prev[1:], jnp.zeros(1, bool)])
    tied = same_prev | same_next
    pos = jnp.cumsum(tied.astype(jnp.int32)) - 1
    target = jnp.where(tied, pos, tp)
    slots = jnp.full(tp, n, jnp.int32).at[target].set(iota, mode="drop")
    sa_vals = jnp.full(tp, n, jnp.int32).at[target].set(sa, mode="drop")
    return slots, sa_vals


@functools.partial(jax.jit, static_argnames=("tp",))
def _bucketed_round(
    rank: jax.Array,  # int32[N] bucket-head ranks, text order
    sa: jax.Array,  # int32[N]
    slots: jax.Array,  # int32[tp] ascending tied SA slots (pad = N)
    sa_vals: jax.Array,  # int32[tp] sa[slots] (pad = N)
    k: jax.Array,  # scalar offset
    tp: int,
):
    """One tail round over the tied buffer only: gather keys, sort tp
    entries, scatter the permutation back into sa and the split heads back
    into rank, then compact the still-tied subset for the next round.
    Returns (rank, sa, slots', sa_vals', tied_next)."""
    n = sa.shape[0]
    real = sa_vals < n
    head = jnp.where(real, rank[jnp.minimum(sa_vals, n - 1)], INT_MAX)
    shifted = sa_vals + k
    key2 = jnp.where(
        real & (shifted < n), rank[shifted % n], jnp.int32(-1)
    )
    h_s, k2_s, sav_s = jax.lax.sort((head, key2, sa_vals), num_keys=2)

    changed = jnp.concatenate(
        [jnp.ones(1, bool), (h_s[1:] != h_s[:-1]) | (k2_s[1:] != k2_s[:-1])]
    )
    # sorted entries land in the ascending tied slots; a subgroup's head is
    # the slot of its first element
    new_head = jax.lax.cummax(jnp.where(changed, slots, -1))
    sa = sa.at[slots].set(sav_s, mode="drop")
    # pads (sav_s == n) scatter out of range and are dropped — clamping
    # them to n-1 instead could clobber a real update to rank[n-1]
    rank = rank.at[sav_s].set(new_head, mode="drop")

    real_s = h_s != INT_MAX
    same_prev = jnp.concatenate(
        [jnp.zeros(1, bool), new_head[1:] == new_head[:-1]]
    ) & real_s
    same_next = jnp.concatenate([same_prev[1:], jnp.zeros(1, bool)])
    tied = (same_prev | same_next) & real_s
    tied_next = jnp.sum(tied.astype(jnp.int32))

    pos = jnp.cumsum(tied.astype(jnp.int32)) - 1
    target = jnp.where(tied, pos, tp)
    new_slots = jnp.full(tp, n, jnp.int32).at[target].set(slots, mode="drop")
    new_sa_vals = jnp.full(tp, n, jnp.int32).at[target].set(
        sav_s, mode="drop"
    )
    return rank, sa, new_slots, new_sa_vals, tied_next


def _bucket_t(t: int) -> int:
    b = _MIN_BUCKET_T
    while b < t:
        b *= 2
    return b


def _doubling_loop(
    sym: jax.Array, packed: bool, collect: bool,
    max_levels: int | None = None,
):
    """Shared driver: full-size rounds with early exit, switching to
    bucketed tail rounds once the tied fraction drops below
    ANDIX_BUCKET_FRAC.  Returns (sa, levels) — levels only filled when
    ``collect`` (all-distinct final levels are never appended, see
    ``suffix_array_device_collect``).  When ``max_levels`` is given and the
    text would need more rank levels than that (pathologically repetitive
    inputs, e.g. identical genomes, where nothing resolves early), level
    collection is abandoned — levels comes back None and the caller falls
    back to a non-level LCP (memory stays bounded either way)."""
    length = int(sym.shape[0])
    if length == 0:
        z = jnp.zeros(0, jnp.int32)
        return z, [z]
    rank, tied, order = _initial_ranks(sym, length, packed)
    levels = [rank]
    t = int(tied)
    if t == 0:
        return _sa_from_rank(rank, length), levels
    k = BASE_WIDTH if packed else 1

    def push(r):
        nonlocal levels
        if collect and levels is not None:
            if max_levels is not None and len(levels) >= max_levels:
                levels = None  # overflow: abandon collection, keep sorting
            else:
                levels.append(r)

    # full-size rounds
    sa = order
    while t > length * _BUCKET_FRAC:
        rank, tied, sa = _doubling_round(
            rank, jnp.int32(min(k, length)), length
        )
        t = int(tied)
        if t == 0:
            return sa, levels
        push(rank)
        if k >= length:
            return sa, levels
        k *= 2

    # bucketed tail rounds over the still-tied slots only
    tp = _bucket_t(t)
    slots, sa_vals = _extract_tied(rank, sa, tp)
    while True:
        rank, sa, slots, sa_vals, tied = _bucketed_round(
            rank, sa, slots, sa_vals, jnp.int32(min(k, length)), tp
        )
        t = int(tied)
        if t == 0:
            return sa, levels
        push(rank)
        if k >= length:
            return sa, levels
        k *= 2
        new_tp = _bucket_t(t)
        if new_tp < tp:  # shrink the buffer (slices are cheap on device)
            slots = slots[:new_tp]
            sa_vals = sa_vals[:new_tp]
            tp = new_tp


@functools.partial(jax.jit, static_argnames=("length",))
def _sa_from_rank(rank: jax.Array, length: int):
    return (
        jnp.zeros(length, jnp.int32)
        .at[rank]
        .set(jnp.arange(length, dtype=jnp.int32))
    )


def suffix_array_device(sym: jax.Array, packed: bool = False) -> jax.Array:
    """Suffix array of an int32 symbol array, computed on device.

    Python-level round loop with early exit (one scalar readback per round);
    each round is a fully jitted device sort.  ``packed=True`` (block-text
    contract, see ``_initial_ranks``) starts from width-BASE_WIDTH ranks.
    """
    sa, _ = _doubling_loop(sym, packed, collect=False)
    return sa


def suffix_array_device_collect(
    sym: jax.Array, packed: bool = False, max_levels: int | None = None
):
    """Like ``suffix_array_device`` but also returns the rank array of every
    width as a list (width base, 2*base, 4*base, ... with base = BASE_WIDTH
    when packed else 1) for the level-walk LCP
    (``device_pipeline.lcp_from_levels``; sub-base remainders are finished
    by direct symbol compares there).  Early exit still applies — the level
    list stops once ranks are distinct, which bounds both rounds and level
    memory by the data's actual repeat structure.

    A level whose ranks are all distinct is never appended (unless it is
    the only one): distinct width-W ranks mean every adjacent LCP is < W,
    and the remaining widths sum to W - 1 plus the sub-base compares — the
    walk stays exact with one less full-size gather pass.

    With ``max_levels``, returns (sa, None) when the input would need more
    levels than the budget (see ``_doubling_loop``)."""
    return _doubling_loop(sym, packed, collect=True, max_levels=max_levels)


def suffix_array(sym: np.ndarray) -> np.ndarray:
    """NumPy in / NumPy out wrapper."""
    sym_d = jnp.asarray(np.ascontiguousarray(sym, dtype=np.int32))
    return np.asarray(jax.device_get(suffix_array_device(sym_d)))


def suffix_array_fixed_rounds(
    sym: jax.Array, rounds: int, packed: bool = False
) -> jax.Array:
    """Fully traced variant with a static round count (for jit/sharding
    validation paths like ``dryrun_multichip`` where host round-trips are
    not possible).  ``rounds`` must satisfy base * 2**rounds >= len(sym)
    with base = BASE_WIDTH when packed else 1."""
    length = int(sym.shape[0])
    rank, _, _ = _initial_ranks(sym, length, packed)
    order = _sa_from_rank(rank, length)
    k = BASE_WIDTH if packed else 1
    for _ in range(rounds):
        rank, _, order = _doubling_round(rank, jnp.int32(min(k, length)), length)
        k *= 2
    return order
