"""ctypes bindings for the native host runtime (libandix.so).

Native components mirror the reference's native pieces (SURVEY.md §2.2):
the Φ-LCP construction (reference uses C at src/esa.c:373-426) and the
anchor-chain replay (the sequential heart of src/process.c:141-214).  The
library is compiled on first use with g++; ``available()`` reports whether
that worked so callers can fall back to the NumPy/Python paths.
"""

from __future__ import annotations

import ctypes
import warnings

import numpy as np

_lib = None
_load_error: str | None = None


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        from .build import build

        path = build()
        lib = ctypes.CDLL(path)
    except Exception as e:  # pragma: no cover - env without toolchain
        _load_error = str(e)
        return None

    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.lcp_from_sa.argtypes = [
        i32p, i32p, ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int,
    ]
    lib.lcp_from_sa.restype = None

    lib.dist_anchor_replay.argtypes = [
        i32p, u8p, i32p, u8p, ctypes.c_int64, u8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, i64p,
    ]
    lib.dist_anchor_replay.restype = None

    lib.dist_anchor_replay_batch.argtypes = [
        i32p, u8p, i32p, u8p, ctypes.c_int64, u8p, i64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, i64p,
    ]
    lib.dist_anchor_replay_batch.restype = None

    lib.count_from_anchors_batch.argtypes = [
        i32p, i32p, i32p, i64p, ctypes.c_int64, ctypes.c_int64, u8p, i64p,
        i64p, u8p, i64p, ctypes.c_int, ctypes.c_int, i64p,
    ]
    lib.count_from_anchors_batch.restype = None

    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _load_error


def lcp_from_sa(sym: np.ndarray, sa: np.ndarray, threads: int = 0) -> np.ndarray:
    """Adjacent LCP array via the native parallel Φ algorithm."""
    lib = _load()
    assert lib is not None
    n = len(sa)
    sym = np.ascontiguousarray(sym, dtype=np.int32)
    sa = np.ascontiguousarray(sa, dtype=np.int32)
    lcp = np.empty(n, dtype=np.int32)
    phi = np.empty(n, dtype=np.int32)
    plcp = np.empty(n, dtype=np.int32)
    lib.lcp_from_sa(sym, sa, n, lcp, phi, plcp, threads)
    return lcp


def dist_anchor_replay(
    matchlen: np.ndarray,
    unique: np.ndarray,
    pos_s: np.ndarray,
    rs: np.ndarray,
    query: np.ndarray,
    threshold: int,
    exact_counts: bool,
) -> np.ndarray:
    lib = _load()
    assert lib is not None
    counts = np.zeros(16, dtype=np.int64)
    lib.dist_anchor_replay(
        np.ascontiguousarray(matchlen, dtype=np.int32),
        np.ascontiguousarray(unique, dtype=np.uint8),
        np.ascontiguousarray(pos_s, dtype=np.int32),
        np.ascontiguousarray(rs, dtype=np.uint8),
        len(rs),
        np.ascontiguousarray(query, dtype=np.uint8),
        len(query),
        threshold,
        1 if exact_counts else 0,
        counts,
    )
    return counts


def count_from_anchors_batch(
    ev_q: np.ndarray,
    ev_s: np.ndarray,
    ev_len: np.ndarray,
    bounds: np.ndarray,
    sg: int,
    g: int,
    subjects_rs: list,
    thresholds,
    query_blob: np.ndarray,
    q_off: np.ndarray,
    exact_counts: bool,
    threads: int = 0,
) -> np.ndarray:
    """16-cell counts for every lane of a subject group from its anchor
    events (lane-sorted, chain order).  Returns int64[sg, g, 16]."""
    lib = _load()
    assert lib is not None
    rs_off = np.zeros(sg + 1, dtype=np.int64)
    parts = []
    for k in range(sg):
        rs = subjects_rs[k] if k < len(subjects_rs) else None
        ln = 0 if rs is None else len(rs)
        rs_off[k + 1] = rs_off[k] + ln
        if ln:
            parts.append(np.ascontiguousarray(rs, dtype=np.uint8))
    rs_blob = (
        np.concatenate(parts) if parts else np.zeros(1, dtype=np.uint8)
    )
    thr = np.zeros(sg, dtype=np.int64)
    for k in range(min(sg, len(thresholds))):
        thr[k] = int(thresholds[k])
    counts = np.zeros((sg, g, 16), dtype=np.int64)
    qb = np.zeros(len(q_off), dtype=np.int64)
    qb[:] = q_off
    query_blob = np.ascontiguousarray(query_blob, dtype=np.uint8)
    if len(query_blob) == 0:
        query_blob = np.zeros(1, dtype=np.uint8)
    lib.count_from_anchors_batch(
        np.ascontiguousarray(ev_q, dtype=np.int32),
        np.ascontiguousarray(ev_s, dtype=np.int32),
        np.ascontiguousarray(ev_len, dtype=np.int32),
        np.ascontiguousarray(bounds, dtype=np.int64),
        sg, g, rs_blob, rs_off, thr, query_blob, qb,
        1 if exact_counts else 0, threads, counts.reshape(-1),
    )
    return counts


def dist_anchor_replay_batch(
    matchlen: np.ndarray,
    unique: np.ndarray,
    pos_s: np.ndarray,
    rs: np.ndarray,
    query_blob: np.ndarray,
    q_off: np.ndarray,
    threshold: int,
    exact_counts: bool,
    threads: int = 0,
) -> np.ndarray:
    """Replay all queries against one subject; returns int64[npairs, 16]."""
    lib = _load()
    assert lib is not None
    npairs = len(q_off) - 1
    counts = np.zeros((npairs, 16), dtype=np.int64)
    lib.dist_anchor_replay_batch(
        np.ascontiguousarray(matchlen, dtype=np.int32),
        np.ascontiguousarray(unique, dtype=np.uint8),
        np.ascontiguousarray(pos_s, dtype=np.int32),
        np.ascontiguousarray(rs, dtype=np.uint8),
        len(rs),
        np.ascontiguousarray(query_blob, dtype=np.uint8),
        np.ascontiguousarray(q_off, dtype=np.int64),
        npairs,
        threshold,
        1 if exact_counts else 0,
        threads,
        counts,
    )
    return counts
