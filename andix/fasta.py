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


def parse_fasta_bytes(blob: bytes) -> list[RawRecord]:
    """Parse one FASTA blob into raw records."""
    if len(blob) == 0:
        raise FastaError("Expected '>' but found EOF on line 1.")
    if blob[0:1] != b">":
        raise FastaError(
            f"Expected '>' but found '{chr(blob[0])}' on line 1."
        )

    arr = np.frombuffer(blob, dtype=np.uint8)
    # Header lines: '>' at position 0 or right after a '\n'.
    gt = arr == ord(">")
    at_line_start = np.zeros(len(arr), dtype=bool)
    at_line_start[0] = True
    newline = arr == ord("\n")
    at_line_start[1:] = newline[:-1]
    header_starts = np.nonzero(gt & at_line_start)[0]

    records: list[RawRecord] = []
    newline_pos = np.nonzero(newline)[0]
    for idx, h in enumerate(header_starts):
        # header line spans h .. eol (first newline at or after h)
        nl_idx = int(np.searchsorted(newline_pos, h))
        eol = int(newline_pos[nl_idx]) if nl_idx < len(newline_pos) else len(arr)
        header = blob[h + 1 : eol].decode("utf-8", errors="replace")
        parts = header.split(None, 1)
        if not parts or not parts[0]:
            line_no = int(np.searchsorted(newline_pos, h)) + 1
            raise FastaError(f"Empty name on line {line_no}.")
        name = parts[0]
        comment = parts[1] if len(parts) > 1 else ""

        body_start = eol + 1
        body_end = (
            int(header_starts[idx + 1]) if idx + 1 < len(header_starts) else len(arr)
        )
        body = arr[body_start:body_end]
        # drop all whitespace (space, tab, CR, LF, VT, FF)
        ws = (body == 32) | ((body >= 9) & (body <= 13))
        data = body[~ws]
        if len(data) == 0:
            line_no = int(np.searchsorted(newline_pos, h)) + 2
            raise FastaError(f"Empty sequence on line {line_no}.")
        records.append(RawRecord(name=name, comment=comment, data=data))

    return records


def read_fasta(file_name: str, ctx: Context) -> list[seqmod.Seq]:
    """Read and normalize all sequences of one file (reference ``read_fasta``,
    src/io.c:196-233).  Parse failures are soft errors that skip the file."""
    try:
        blob = _read_bytes(file_name)
    except OSError as e:
        ctx.soft_err(f"{file_name}: {e.strerror}")
        return []

    try:
        records = parse_fasta_bytes(blob)
    except FastaError as e:
        ctx.soft_err(f"{file_name}: {e}")
        return []

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
