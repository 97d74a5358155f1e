"""JAX/TPU block backend: device sorts + device scans, host LCP + replay.

Per subject block:

* joint text symbols -> device; suffix array via prefix-doubling
  ``lax.sort`` rounds (``doubling``),
* adjacent LCP on host via the native parallel Φ implementation (the one
  device<->host round trip of the build; SA down, LCP up),
* per-subject matching statistics fully on device (``matchstats_jax``),
  gathered at query positions and fetched once per subject.

The per-subject compiled program is shared across subjects (subject id is a
traced scalar) and across blocks of equal padded size.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from . import doubling, matchstats_jax, sa_numpy
from .joint import BlockLayout


@dataclasses.dataclass
class BlockContext:
    layout: BlockLayout
    q_genomes: list[int]  # genome ids in blob order
    q_off: np.ndarray  # int64[g+1] offsets into the query blob
    query_blob: np.ndarray  # uint8 concatenated forward sequences
    # backend handles
    sa_d: jax.Array
    lcp_d: jax.Array
    segid_d: jax.Array
    tq_d: jax.Array  # int32 SA positions of blob elements


def _query_blob(layout: BlockLayout):
    genomes = [int(g) for g in layout.genome_ids]
    spans = [layout.query_span(g) for g in genomes]
    q_off = np.zeros(len(genomes) + 1, dtype=np.int64)
    parts = []
    qpos = []
    for k, (qs, qe) in enumerate(spans):
        q_off[k + 1] = q_off[k] + (qe - qs)
        parts.append(layout.sym[qs:qe].astype(np.uint8))
        qpos.append(np.arange(qs, qe, dtype=np.int64))
    blob = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    qpos_all = np.concatenate(qpos) if qpos else np.zeros(0, np.int64)
    return genomes, q_off, blob, qpos_all


class JaxBackend:
    name = "jax"

    def __init__(self, threads: int = 0):
        self.threads = threads

    def prepare_block(self, layout: BlockLayout) -> BlockContext:
        sym_d = jnp.asarray(layout.sym)
        sa_d = doubling.suffix_array_device(sym_d)
        sa = np.asarray(jax.device_get(sa_d))
        if native.available():
            lcp = native.lcp_from_sa(layout.sym, sa, self.threads)
        else:  # pragma: no cover - toolchain-less fallback
            lcp = sa_numpy.lcp_array(layout.sym, sa)
        lcp_d = jnp.asarray(lcp.astype(np.int32))

        seg_start_d = jnp.asarray(layout.seg_start.astype(np.int64))
        segid_d = (
            jnp.searchsorted(seg_start_d, sa_d.astype(jnp.int64), side="right")
            - 1
        ).astype(jnp.int32)

        genomes, q_off, blob, qpos_all = _query_blob(layout)
        isa_d = matchstats_jax.inverse_sa_device(sa_d)
        tq_d = isa_d[jnp.asarray(qpos_all.astype(np.int32))]
        return BlockContext(
            layout=layout,
            q_genomes=genomes,
            q_off=q_off,
            query_blob=blob,
            sa_d=sa_d,
            lcp_d=lcp_d,
            segid_d=segid_d,
            tq_d=tq_d,
        )

    def subject_stats(self, ctx: BlockContext, subject_genome: int):
        layout = ctx.layout
        subj_seg = int(
            np.nonzero(
                (layout.genome_ids == subject_genome) & layout.is_subject
            )[0][0]
        )
        subj_start = int(layout.seg_start[subj_seg])
        ml, un, ps = matchstats_jax.match_stats_device(
            ctx.sa_d,
            ctx.lcp_d,
            ctx.segid_d,
            jnp.int32(subj_seg),
            jnp.int32(subj_start),
        )
        ml_q, un_q, ps_q = matchstats_jax.gather_query_stats(ml, un, ps, ctx.tq_d)
        ml_h, un_h, ps_h = jax.device_get((ml_q, un_q, ps_q))
        return (
            np.asarray(ml_h, dtype=np.int32),
            np.asarray(un_h, dtype=bool),
            np.asarray(ps_h, dtype=np.int32),
        )
