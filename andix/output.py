"""PHYLIP matrix printing, warnings, coverage, progress.

Output parity with reference ``src/io.c:246-338`` (``print_distances``,
``print_coverages``): same averaging, scientific-notation switch, 10-char name
padding, NaN / low-homology warnings, and warning emission order; and with the
stderr progress meter of ``src/dist_hack.h:40-44,74-87``.
"""

from __future__ import annotations

import math
import sys

import numpy as np

from . import model as modelmod
from .model import CountMatrix
from .runtime import Context
from .sequence import Seq


def print_distances(M: list[list[CountMatrix]], sequences: list[Seq], n: int,
                    warnings: bool, ctx: Context, out=None) -> None:
    """Pretty-print the distance matrix (reference ``print_distances``,
    src/io.c:246-322)."""
    out = out if out is not None else sys.stdout
    DD = np.zeros((n, n), dtype=np.float64)
    use_scientific = False

    for i in range(n):
        for j in range(n):
            datum = M[i][j]
            if ctx.verbose < 2:  # not F_EXTRA_VERBOSE
                datum = modelmod.model_average(M[i][j], M[j][i])

            dist = 0.0 if i == j else modelmod.estimate(datum, ctx.model)
            DD[i, j] = dist

            if 0.0 < dist < 0.001:
                use_scientific = True

            if math.isnan(dist) and warnings:
                ctx.soft_err(
                    f"For the two sequences '{sequences[i].name}' and "
                    f"'{sequences[j].name}' the distance computation failed "
                    f"and is reported as nan. Please refer to the "
                    f"documentation for further details."
                )

            if not math.isnan(dist) and i < j and warnings:
                coverage1 = modelmod.model_coverage(M[i][j])
                coverage2 = modelmod.model_coverage(M[j][i])
                if coverage1 < 0.2 or coverage2 < 0.2:
                    ctx.soft_err(
                        f"For the two sequences '{sequences[i].name}' and "
                        f"'{sequences[j].name}' very little homology was "
                        f"found ({coverage1:f} and {coverage2:f}, "
                        f"respectively)."
                    )

    print(n, file=out)
    for i in range(n):
        name = sequences[i].name
        if ctx.truncate_names:
            name = name[:10]
        row = [f"{name:<10s}"]
        for j in range(n):
            row.append(_fmt(DD[i, j], use_scientific))
        print(" ".join(row), file=out)


def _fmt(d: float, scientific: bool) -> str:
    # C printf "%1.4e" / "%1.4f"; Python matches both (incl. "nan").
    return f"{d:1.4e}" if scientific else f"{d:1.4f}"


def print_coverages(M: list[list[CountMatrix]], n: int, out=None) -> None:
    """Reference ``print_coverages``, src/io.c:329-338 (note the trailing
    space per cell)."""
    out = out if out is not None else sys.stdout
    print("\nCoverage:", file=out)
    for i in range(n):
        print(
            "".join(f"{modelmod.model_coverage(M[i][j]):1.4e} " for j in range(n)),
            file=out,
        )


class ProgressMeter:
    """stderr progress meter: ``\\rComparing n sequences: xx.x% (k/total)``
    (reference ``src/dist_hack.h:40-44,74-87``)."""

    def __init__(self, n: int, enabled: bool):
        self.n = n
        self.total = n * n - n
        self.count = 0
        self.enabled = enabled
        if enabled:
            print(
                f"Comparing {n} sequences: {0.0:5.1f}% (0/{self.total})",
                end="",
                file=sys.stderr,
                flush=True,
            )

    def advance(self, k: int) -> None:
        self.count += k
        if self.enabled:
            pct = 100.0 * self.count / self.total if self.total else 100.0
            print(
                f"\rComparing {self.n} sequences: {pct:5.1f}% "
                f"({self.count}/{self.total})",
                end="",
                file=sys.stderr,
                flush=True,
            )

    def done(self) -> None:
        if self.enabled:
            print(", done.", file=sys.stderr)
