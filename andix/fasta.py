"""FASTA input.

Host-side replacement for the reference's vendored pfasta parser
(``libs/pfasta.c``) and I/O plumbing (``src/io.c``).  Instead of a buffered
fd state machine with SSE2 whitespace scanning, the whole file is read once
and split with vectorized NumPy byte ops — parsing is not on the TPU critical
path (SURVEY.md §2.2).

Parsing rules preserved from pfasta:

* the file must start with ``>`` (``pfasta_init``),
* record name = first whitespace-delimited word after ``>`` and must be
  non-empty (``pfasta_read_name``),
* the rest of the header line is a comment (``pfasta_read_comment``),
* sequence data = all non-whitespace on subsequent lines until the next
  ``>`` header; an empty sequence is an error (``pfasta_read_sequence``).
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

from . import sequence as seqmod
from .runtime import Context


class FastaError(Exception):
    pass


@dataclasses.dataclass
class RawRecord:
    name: str
    comment: str
    data: np.ndarray  # raw uint8 sequence bytes (unnormalized)


def _read_bytes(file_name: str) -> bytes:
    if file_name == "-":
        return sys.stdin.buffer.read()
    with open(file_name, "rb") as fh:
        return fh.read()


_GT = ord(">")
_NL = ord("\n")


def _isalpha(c: int) -> bool:
    return 65 <= c <= 90 or 97 <= c <= 122


def parse_fasta_bytes(blob: bytes):
    """Parse one FASTA blob into raw records with pfasta-exact semantics
    (libs/pfasta.c:330-482): records are a sequence of whitespace-delimited
    words; a record is a ``>``-word (name), the rest of that line
    (comment), then words starting with a letter, ``-`` or ``*``; any other
    word start ends the record and must be the next ``>``.  Error messages
    and their line numbers match pfasta byte for byte, and records parsed
    before an error are returned alongside it (the reference pushes each
    record before the failing read, src/io.c:214-226).

    Returns (records, errstr | None)."""
    if len(blob) == 0:
        return [], "File is empty."
    if blob[0] != _GT:
        return [], "File must start with '>'."

    arr = np.frombuffer(blob, dtype=np.uint8)
    n = len(arr)
    ws = (arr == 32) | ((arr >= 9) & (arr <= 13))
    newline_pos = np.nonzero(arr == _NL)[0]

    def line_of(i: int) -> int:
        # a newline terminates its own line
        return int(np.searchsorted(newline_pos, i, side="left")) + 1

    eof_line = len(newline_pos) + 1

    # tokenize into maximal non-whitespace words: each word spans
    # [starts[i], ends[i]) with ends[i] the next whitespace byte (or EOF)
    is_start = ~ws
    is_start[1:] &= ws[:-1]
    starts = np.nonzero(is_start)[0]
    ws_idx = np.nonzero(ws)[0]
    if len(ws_idx):
        nxt = np.searchsorted(ws_idx, starts)
        ends = np.where(
            nxt < len(ws_idx), ws_idx[np.minimum(nxt, len(ws_idx) - 1)], n
        )
    else:
        ends = np.full(len(starts), n, dtype=np.int64)

    records: list[RawRecord] = []
    W = len(starts)
    w = 0
    while w < W:
        s = int(starts[w])
        c = int(arr[s])
        if c != _GT:
            return records, (
                f"Expected '>' but found '{chr(c)}' on line {line_of(s)}."
            )

        # --- name (pfasta_read_name, libs/pfasta.c:352-386) ---
        e = int(ends[w])
        if e >= n:  # '>' or name word runs into EOF
            return records, (
                f"Unexpected EOF in name on line {line_of(s)}."
            )
        if e == s + 1:
            return records, f"Empty name on line {line_of(s)}."
        name = blob[s + 1 : e].decode("utf-8", errors="replace")

        # --- comment (pfasta_read_comment, :388-430): rest of the header
        # line; a header line never ending in a newline is an error ---
        nl_i = int(np.searchsorted(newline_pos, e, side="left"))
        if nl_i >= len(newline_pos):
            return records, (
                f"Unexpected EOF in comment on line {line_of(s)}."
            )
        eol = int(newline_pos[nl_i])
        comment = (
            blob[e + 1 : eol].decode("utf-8", errors="replace")
            if int(arr[e]) != _NL
            else ""
        )

        # --- sequence (pfasta_read_sequence, :434-482): words starting
        # with a letter, '-' or '*'; other word starts end the record ---
        w += 1
        while w < W and starts[w] < eol:  # words inside the comment
            w += 1
        parts = []
        while w < W:
            s2 = int(starts[w])
            c2 = int(arr[s2])
            if not (_isalpha(c2) or c2 == 45 or c2 == 42):
                break
            parts.append(arr[s2 : int(ends[w])])
            w += 1
        if not parts:
            bad_line = line_of(int(starts[w])) if w < W else eof_line
            return records, f"Empty sequence on line {bad_line}."
        data = parts[0] if len(parts) == 1 else np.concatenate(parts)
        records.append(RawRecord(name=name, comment=comment, data=data))

    return records, None


def read_fasta(file_name: str, ctx: Context) -> list[seqmod.Seq]:
    """Read and normalize all sequences of one file (reference ``read_fasta``,
    src/io.c:196-233).  Parse failures are soft errors; records parsed
    before the failure are kept, matching the reference's read loop."""
    try:
        blob = _read_bytes(file_name)
    except OSError as e:
        ctx.soft_err(f"{file_name}: {e.strerror}")
        return []

    records, err = parse_fasta_bytes(blob)
    if err is not None:
        ctx.soft_err(f"{file_name}: {err}")

    out = []
    for rec in records:
        data, non_acgt = seqmod.normalize(rec.data)
        if non_acgt:
            ctx.non_acgt = True
        out.append(seqmod.Seq(data=data, name=rec.name))
    return out


def read_fasta_join(file_name: str, ctx: Context) -> list[seqmod.Seq]:
    """Join mode: merge all contigs of a file into one sequence named after
    the file basename without extension (reference ``read_fasta_join``,
    src/io.c:159-189)."""
    singles = read_fasta(file_name, ctx)
    if not singles:
        return []
    joined = seqmod.join([s.data for s in singles])

    base = os.path.basename(file_name)
    dot = base.find(".")
    name = base if dot == -1 else base[:dot]
    return [seqmod.Seq(data=joined, name=name)]


def read_into_string_vector(file_name: str, ctx: Context) -> list[str]:
    """Read a file of file names, one per line, skipping empty lines
    (reference ``read_into_string_vector``, src/io.c:103-144)."""
    try:
        if file_name == "-":
            lines = sys.stdin.read().splitlines()
        else:
            with open(file_name, "r") as fh:
                lines = fh.read().splitlines()
    except OSError as e:
        ctx.soft_err(f"{file_name}: {e.strerror}")
        return []
    return [ln for ln in lines if ln]
