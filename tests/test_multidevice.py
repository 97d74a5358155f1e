"""Multi-device tests on the 8-virtual-CPU mesh: block distribution across
devices and the shard_map dryrun path."""

import numpy as np

import jax

from andix import pipeline
from andix.esa.backend_jax import JaxBackend
from andix.runtime import Context
from andix.sequence import Seq


def grid_counts(M, n):
    return np.stack([[M[i][j].counts for j in range(n)] for i in range(n)])


class TestDeviceDistribution:
    def test_multidevice_equals_single(self, rng, dna, mutator):
        assert len(jax.devices()) == 8
        base = dna(rng, 600)
        seqs = [Seq(base, "g0")] + [
            Seq(mutator(rng, base, 0.02 + 0.02 * k), f"g{k+1}")
            for k in range(5)
        ]
        ctx = Context()
        n = len(seqs)
        single = pipeline.calculate_matrix(
            seqs, ctx, JaxBackend(), block_syms=1 << 27
        )
        # small blocks force one block per device
        multi = pipeline.calculate_matrix(
            seqs, ctx, JaxBackend(), block_syms=6000
        )
        assert (grid_counts(single, n) == grid_counts(multi, n)).all()


class TestShardMapDryrun:
    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out[0].shape == (1024,)
