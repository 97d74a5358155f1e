"""Compressed event fetch: device pack -> host decode must be
bit-identical to the raw (lane, q, s, len) stream in lane-major chain
order, including escape records (large first-q, long anchors, diagonal
jumps)."""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from andix.chain import evpack  # noqa: E402


def _roundtrip(lane, q, s, ln, n_lanes, k=None):
    cnt = len(lane)
    k = k or max(16, 1 << int(max(cnt, 1) - 1).bit_length())
    a = np.zeros(k, np.int64)
    b = np.zeros(k, np.int64)
    a[:cnt] = (lane.astype(np.int64) << 32) | ln.astype(np.int64)
    b[:cnt] = (q.astype(np.int64) << 32) | s.astype(np.int64)
    enc = evpack.encode_events(
        jnp.asarray(a), jnp.asarray(b), jnp.int32(cnt), k, n_lanes
    )
    packed, esc, counts, n_esc, esc_ovf = jax.device_get(enc)
    assert not bool(esc_ovf)
    lanes2, q2, s2, ln2 = evpack.decode_events(
        packed, esc, counts, int(n_esc), cnt
    )
    # reference: stable lane-major ordering of the input
    order = np.argsort(lane, kind="stable")
    np.testing.assert_array_equal(lanes2, lane[order])
    np.testing.assert_array_equal(q2, q[order])
    np.testing.assert_array_equal(s2, s[order])
    np.testing.assert_array_equal(ln2, ln[order])


def test_chainlike_stream():
    rng = np.random.default_rng(5)
    n_lanes = 37
    events = []
    for lane in range(n_lanes):
        if lane % 5 == 0:
            continue  # empty lanes
        qpos = int(rng.integers(0, 2_000_000))  # big first q -> escape
        diag = int(rng.integers(-500_000, 500_000))
        for _ in range(int(rng.integers(1, 40))):
            ln = int(rng.integers(10, 300))
            if rng.random() < 0.1:
                diag += int(rng.integers(-100_000, 100_000))  # escape
            if rng.random() < 0.05:
                ln = int(rng.integers(70_000, 200_000))  # escape
            # subject positions are non-negative by construction
            s_pos = max(qpos + diag, 0)
            events.append((lane, qpos, s_pos, ln))
            qpos += ln + 1 + int(rng.integers(0, 200))
    rng.shuffle(events)  # interleaved buffer order... per-lane order kept
    # ...but per-lane chain order must be preserved: sort by (lane, q)
    events.sort(key=lambda e: (e[0], e[1]))
    arr = np.array(events, dtype=np.int64).T
    _roundtrip(
        arr[0].astype(np.int32), arr[1].astype(np.int32),
        arr[2].astype(np.int32), arr[3].astype(np.int32), n_lanes,
    )


def test_empty_and_tiny():
    z = np.zeros(0, np.int32)
    _roundtrip(z, z, z, z, 8, k=16)
    _roundtrip(
        np.array([3], np.int32), np.array([123456], np.int32),
        np.array([99], np.int32), np.array([7], np.int32), 8, k=16,
    )


def test_all_escapes():
    n = 300
    rng = np.random.default_rng(9)
    lane = np.sort(rng.integers(0, 4, n)).astype(np.int32)
    q = np.sort(rng.integers(0, 1 << 30, n)).astype(np.int32)
    s = rng.integers(0, 1 << 30, n).astype(np.int32)
    ln = rng.integers(0, 1 << 20, n).astype(np.int32)
    # per-lane q must ascend: sort within lanes
    for l in range(4):
        m = lane == l
        q[m] = np.sort(q[m])
    _roundtrip(lane, q, s, ln, 16)
