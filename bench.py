"""andix benchmark: genome pairs/sec/chip on an eco29-like synthetic family.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config via env:
  ANDIX_BENCH_GENOMES  (default 8)   number of genomes
  ANDIX_BENCH_LENGTH   (default 1_000_000) genome length in bp
  ANDIX_BENCH_BACKEND  (default jax) jax | numpy

Baseline: the only hard number the reference publishes is 0.613 s wall for a
2x1 Mbp pairwise run on one thread (docs/manual/andi-manual.tex:266-279,
recorded in BASELINE.md), i.e. 2/0.613 = 3.26 ordered pairs/s/thread at
1 Mbp.  The north-star target is beating andi on a 64-core node; the manual
measures 1.69x on 2 threads (84% efficiency), so the baseline here is
3.26 * 64 * 0.84 = 175 ordered 1 Mbp-pairs/s for a full 64-core node.
vs_baseline > 1 means one TPU chip beats that node estimate.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC_64CORE = (2.0 / 0.613) * 64 * 0.84  # ~175.4


def make_family(n_genomes: int, length: int, seed: int = 2026):
    rng = np.random.default_rng(seed)
    nucl = np.frombuffer(b"ACGT", dtype=np.uint8)
    base = nucl[rng.integers(0, 4, length)]
    from andix.sequence import Seq

    seqs = [Seq(base, "g0")]
    rates = [0.005, 0.01, 0.02, 0.03, 0.05, 0.08, 0.12]
    for k in range(1, n_genomes):
        rate = rates[(k - 1) % len(rates)]
        codes = np.searchsorted(nucl, base)
        hit = rng.random(length) < rate
        mut = nucl[(codes + np.where(hit, rng.integers(1, 4, length), 0)) % 4]
        seqs.append(Seq(mut, f"g{k}"))
    return seqs


def main() -> int:
    n_genomes = int(os.environ.get("ANDIX_BENCH_GENOMES", "8"))
    length = int(os.environ.get("ANDIX_BENCH_LENGTH", "1000000"))
    backend_name = os.environ.get("ANDIX_BENCH_BACKEND", "jax")

    from andix import pipeline
    from andix.runtime import Context

    ctx = Context()
    if backend_name == "jax":
        from andix.esa.backend_jax import JaxBackend

        backend = JaxBackend()
        # no warmup run: compiles hit the persistent XLA cache
        # (ANDIX_JAX_CACHE); a warmup at a different size would only compile
        # extra buckets
    else:
        backend = pipeline.NumpyBackend()

    seqs = make_family(n_genomes, length)
    t0 = time.time()
    M = pipeline.calculate_matrix(seqs, ctx, backend=backend)
    elapsed = time.time() - t0

    # sanity: the matrix must be non-degenerate
    from andix import model as mm

    d01 = mm.estimate_jc(mm.model_average(M[0][1], M[1][0]))
    assert 0.001 < d01 < 0.02, f"bench sanity failed: d(g0,g1)={d01}"

    pairs = n_genomes * n_genomes - n_genomes
    pairs_per_sec = pairs / elapsed
    # scale baseline to this genome length (andi's scan is ~linear in length)
    baseline = BASELINE_PAIRS_PER_SEC_64CORE * (1_000_000 / length)

    print(
        json.dumps(
            {
                "metric": f"ordered genome pairs/sec/chip "
                f"({n_genomes}x{length//1000}kbp, JC)",
                "value": round(pairs_per_sec, 3),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / baseline, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
