"""Multi-host init — import-safe (no jnp constants, no backend touch).

``jax.distributed.initialize`` must run before ANYTHING initializes the
XLA backend, and several andix modules create jnp scalar constants at
import time.  This module therefore only imports ``os`` and ``jax`` and is
invoked from ``andix/__init__`` — before any other andix import can touch
a device — whenever a coordinator is configured (SURVEY.md §5 distributed
row; reference has no equivalent, its parallelism is OpenMP shared memory,
src/dist_hack.h:8,16).

Env contract (per host):
  ANDIX_COORDINATOR    host:port of process 0 (required to opt in)
  ANDIX_NUM_PROCESSES  total process count   (optional with JAX clusters)
  ANDIX_PROCESS_ID     this process's index  (optional with JAX clusters)
"""

from __future__ import annotations

import os

_initialized = False


def maybe_init_distributed() -> bool:
    """Idempotent ``jax.distributed.initialize`` from ANDIX_COORDINATOR[/
    ANDIX_NUM_PROCESSES/ANDIX_PROCESS_ID] or the JAX auto-detected cluster
    env.  Single-host runs (no coordinator configured) skip silently."""
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("ANDIX_COORDINATOR")
    if coord is None:
        return False
    import jax

    kwargs = {"coordinator_address": coord}
    if "ANDIX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["ANDIX_NUM_PROCESSES"])
    if "ANDIX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["ANDIX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True
