"""andix — TPU-native anchor-distance engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of EvolBioInf/andi:
alignment-free estimation of evolutionary distances between closely related
genomes via the anchor-distance method (Haubold, Klötzl & Pfaffelhuber 2015).

Architecture (TPU-first, not a port):

* Enhanced-suffix-array construction (reference: ``src/esa.c``) is recast as a
  prefix-doubling rank-sort over a *generalized* suffix array of all subject
  strings, built with ``jax.lax.sort`` on device (``andix.esa.doubling``).
* The per-query-position longest-match search (``src/esa.c:441-656``,
  ``get_match_cached``) becomes *matching statistics for every query position
  at once*, computed with segmented min-scans over the joint SA/LCP arrays
  (``andix.esa.matchstats``).  No pointer-chasing tree descent.
* The path-dependent anchor-chaining scan (``src/process.c:141-214``,
  ``dist_anchor``) is replayed over the precomputed match-statistic arrays by
  a small native C++ host runtime (``andix.chain``), preserving reference
  semantics exactly (lucky anchors, diagonal pairing, skip advance).
* Distance estimators and the multinomial bootstrap (``src/model.c``) are
  float64 host math with a seedable PRNG (``andix.model``) — fixing the
  reference's irreproducible ``time(NULL)`` seeding (``src/andi.c:272-279``).
* The N×N pair grid shards across a TPU mesh by subject blocks
  (``andix.parallel``), the TPU-native equivalent of the OpenMP loops in
  ``src/dist_hack.h``.
"""

__version__ = "0.1.0"

import os as _os

# Multi-host init MUST precede everything else: several andix modules
# create jnp constants at import time, which initializes the XLA backend,
# after which jax.distributed.initialize refuses to run.
from ._distributed import maybe_init_distributed as _maybe_init_distributed

_maybe_init_distributed()

import jax

# Estimator math must be float64 to match the reference's C doubles
# (SURVEY.md §7 "Numerics").  Integer sort keys in the doubling kernel use
# multi-key int32 sorts, so x64 is not required on the hot path; enabling it
# globally only affects tiny host-side reductions.
jax.config.update("jax_enable_x64", True)

# XLA compiles are expensive on tunneled TPU backends (tens of seconds per
# sort shape).  All device entry points use padded shape buckets, and the
# persistent cache makes recompiles once-per-machine instead of once-per-run.
# The cache is split per platform: remote-compile services (tunneled TPU
# setups) may AOT CPU entries with mismatched host CPU features, and
# reloading those on the local CPU spams cpu_aot_loader warnings on stderr.
_plat = (_os.environ.get("JAX_PLATFORMS") or "").split(",")[0]
_cache_dir = _os.environ.get(
    "ANDIX_JAX_CACHE",
    # CPU compiles are fast and reloading AOT CPU entries spams benign
    # cpu_aot_loader warnings (XLA's prefer-no-scatter pseudo-features) on
    # stderr, so the persistent cache is accelerator-only by default
    "0" if _plat == "cpu"
    else _os.path.join(_os.path.expanduser("~"), ".cache", "andix-jax"),
)
if _cache_dir and _cache_dir != "0":
    try:  # pragma: no cover - best effort
        _os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
