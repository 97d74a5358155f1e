"""Multi-chip pair-grid sharding over a TPU mesh.

TPU-native replacement for the reference's OpenMP pair scheduler
(``src/dist_hack.h``): the N×N comparison grid is sharded by *subject rows*
across a 1-D device mesh ("s" axis).  Each device builds the joint suffix
array for its subject block (device-local sorts), computes matching
statistics for its subjects, and the per-row stat tiles are merged with an
``all_gather`` over the mesh — collectives ride ICI instead of shared
memory.  Queries are replicated (they are small: forward strands only).

The sharded step is fully traced (fixed doubling rounds, level-walk LCP from
``device_pipeline``), so it works under ``jit`` + ``shard_map`` with no host
round trips — validated by ``__graft_entry__.dryrun_multichip`` on a virtual
CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 top-level API (check_vma keyword)
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
except ImportError:  # pragma: no cover - older jax (check_rep keyword)
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, *, mesh, in_specs, out_specs):
        return _shard_map_old(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )

from .esa import device_pipeline


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("s",))


def sharded_matchstats_fn(mesh: Mesh, rounds: int, local_subjects: int):
    """Build the jitted sharded step.

    Inputs (leading axis = device shard):
      texts       int32[P, B]      padded joint text per device block
      seg_starts  int64[P, S+1]    segment table per block
      subj_segs   int32[P, L]      local subject segment ids (-1 = padding)
      subj_starts int32[P, L]
      tqs         int32[P, QB]     query text positions per block

    Returns replicated (ml, un, ps) of shape [P, L, QB]: every device holds
    all rows after the all_gather (the distance-matrix tile merge).
    """

    def per_device(text, seg_start, subj_seg, subj_start, tq):
        text = text[0]
        seg_start = seg_start[0]
        tq = tq[0]
        sa, levels = device_pipeline.suffix_array_with_levels(text, rounds)
        lcp = device_pipeline.lcp_from_levels(sa, levels, text)
        mls, uns, pss = [], [], []
        for l in range(local_subjects):
            ml, un, ps = device_pipeline.esa_matchstats_step(
                text, seg_start, subj_seg[0, l], subj_start[0, l], tq, sa, lcp
            )
            mls.append(ml)
            uns.append(un)
            pss.append(ps)
        ml = jnp.stack(mls)  # [L, QB]
        un = jnp.stack(uns)
        ps = jnp.stack(pss)
        # merge row tiles across the mesh (ICI collective)
        ml_all = jax.lax.all_gather(ml, "s")  # [P, L, QB]
        un_all = jax.lax.all_gather(un, "s")
        ps_all = jax.lax.all_gather(ps, "s")
        return ml_all, un_all, ps_all

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("s"), P("s"), P("s"), P("s"), P("s")),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sharded)


def round_robin_blocks(n_subjects: int, n_devices: int) -> list[list[int]]:
    """Contiguous split of subject indices across devices."""
    per = -(-n_subjects // n_devices)
    return [
        list(range(d * per, min(n_subjects, (d + 1) * per)))
        for d in range(n_devices)
    ]
