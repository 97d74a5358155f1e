"""Test harness config: force CPU JAX with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md test strategy §4)."""

import os

# Force CPU JAX with 8 virtual devices.  The axon TPU sitecustomize imports
# jax at interpreter startup and pins jax_platforms to the tunneled TPU, so
# env vars set here are too late — but backends initialize lazily, so
# flipping the config before the first device use still works.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("ANDIX_MIN_BUCKET", "1024")  # small pads for test sizes
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


NUCL = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_dna(rng, n):
    return NUCL[rng.integers(0, 4, n)]


def mutate(rng, seq, rate):
    """Substitute each site with prob ``rate`` to a uniformly different base
    (the reference's test generator semantics, test/test_fasta.cxx:49-55
    with -r raw rate)."""
    codes = np.searchsorted(NUCL, seq)
    hit = rng.random(len(seq)) < rate
    shift = rng.integers(1, 4, len(seq))
    return NUCL[(codes + np.where(hit, shift, 0)) % 4]


@pytest.fixture
def dna():
    return random_dna


@pytest.fixture
def mutator():
    return mutate


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules: the full suite
    accumulates hundreds of XLA:CPU programs across 227 tests and the
    compiler segfaulted (LLVM OOM) in the last module twice; per-module
    cache clearing keeps peak host memory bounded."""
    yield
    import jax

    jax.clear_caches()
