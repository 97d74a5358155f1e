"""Prefix-doubling suffix array on device (jax.lax.sort).

The TPU-native replacement for libdivsufsort (reference ``esa_init_SA``,
src/esa.c:294-304): O(log n) rounds, each one big multi-key device sort of
(rank, rank_at_offset_k, index) int32 triples — exactly the kind of regular,
memory-bandwidth-bound bulk primitive XLA maps well onto TPU.  Rounds stop
early once all ranks are distinct (real genomes resolve long before the
worst case; near-identical strains need rounds up to their longest shared
run).

Symbols are int32 (bytes + unique per-segment separators >= 256, see
``andix.esa.joint``), so no 64-bit keys are needed: two int32 sort keys
replace one packed int64 key.
"""

from __future__ import annotations

import functools

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
    shorter-suffix-sorts-first (only padding suffixes reach out of range)."""
    idx = jnp.arange(length, dtype=jnp.int32)
    s = sym.astype(jnp.int32)

    if not packed:
        k1s, order = jax.lax.sort((s, idx), num_keys=1)
        changed = jnp.concatenate(
            [
                jnp.zeros(1, jnp.int32),
                (k1s[1:] != k1s[:-1]).astype(jnp.int32),
            ]
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
            [
                jnp.zeros(1, jnp.int32),
                ((k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])).astype(
                    jnp.int32
                ),
            ]
        )
    rank_sorted = jnp.cumsum(changed, dtype=jnp.int32)
    rank = jnp.zeros(length, jnp.int32).at[order].set(rank_sorted)
    max_rank = rank_sorted[-1]
    return rank, max_rank


@functools.partial(jax.jit, static_argnames=("length",))
def _doubling_round(rank: jax.Array, k: jax.Array, length: int):
    idx = jnp.arange(length, dtype=jnp.int32)
    shifted = idx + k
    key2 = jnp.where(shifted < length, rank[shifted % length], jnp.int32(-1))
    r1, r2, order = jax.lax.sort((rank, key2, idx), num_keys=2)
    changed = jnp.concatenate(
        [
            jnp.zeros(1, jnp.int32),
            ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(jnp.int32),
        ]
    )
    rank_sorted = jnp.cumsum(changed, dtype=jnp.int32)
    new_rank = jnp.zeros(length, jnp.int32).at[order].set(rank_sorted)
    return new_rank, rank_sorted[-1], order


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
    length = int(sym.shape[0])
    if length == 0:
        return jnp.zeros(0, jnp.int32)
    rank, max_rank = _initial_ranks(sym, length, packed)
    if int(max_rank) == length - 1:
        return _sa_from_rank(rank, length)
    k = BASE_WIDTH if packed else 1
    while True:
        rank, max_rank, order = _doubling_round(
            rank, jnp.int32(min(k, length)), length
        )
        if int(max_rank) == length - 1 or k >= length:
            return order
        k *= 2


def suffix_array_device_collect(sym: jax.Array, packed: bool = False):
    """Like ``suffix_array_device`` but also returns the rank array of every
    width as a list (width base, 2*base, 4*base, ... with base = BASE_WIDTH
    when packed else 1) for the level-walk LCP
    (``device_pipeline.lcp_from_levels``; sub-base remainders are finished
    by direct symbol compares there).  Early exit still applies — the level
    list stops once ranks are distinct, which bounds both rounds and level
    memory by the data's actual repeat structure.

    A final level whose ranks are all distinct is dropped (unless it is the
    only one): distinct width-W ranks mean every adjacent LCP is < W, and
    the remaining widths sum to W - 1 plus the sub-base compares — the walk
    stays exact with one less full-size gather pass."""
    length = int(sym.shape[0])
    if length == 0:
        return jnp.zeros(0, jnp.int32), [jnp.zeros(0, jnp.int32)]
    rank, max_rank = _initial_ranks(sym, length, packed)
    levels = [rank]
    if int(max_rank) == length - 1:
        return _sa_from_rank(rank, length), levels
    k = BASE_WIDTH if packed else 1
    while True:
        rank, max_rank, order = _doubling_round(
            rank, jnp.int32(min(k, length)), length
        )
        distinct = int(max_rank) == length - 1
        if not distinct:
            levels.append(rank)
        if distinct or k >= length:
            return order, levels
        k *= 2


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
    rank, _ = _initial_ranks(sym, length, packed)
    order = _sa_from_rank(rank, length)
    k = BASE_WIDTH if packed else 1
    for _ in range(rounds):
        rank, _, order = _doubling_round(rank, jnp.int32(min(k, length)), length)
        k *= 2
    return order
