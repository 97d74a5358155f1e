"""Per-iteration cost attribution of the sx walk kernel on the live chip.

Times chain_walk_flat_sx directly (no segmented driver): fixed iteration
budgets over synthetic related pairs, varying lane count and unroll, plus
a max_iters=0 floor run (dispatch + state fetch only).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def sync(a):
    return int(np.asarray(jax.device_get(a)).ravel()[0])


def main():
    from bench import make_family
    from andix.esa import subject_index
    from andix.esa.backend_jax import bucket, device_text, level_budget
    from andix.esa import joint, doubling
    from andix.chain.walk_sx import chain_walk_flat_sx
    from andix.sequence import subject_init
    from andix.runtime import Context

    n, length = 4, 1_000_000
    seqs = make_family(n, length)
    subjects = [subject_init(s, Context().anchor_p_value) for s in seqs]
    Lp = bucket(2 * length + 2)
    cache_k = 12

    sg = 4
    salcp = jnp.zeros((sg, 2, Lp), jnp.int32)
    sw = jnp.zeros((sg, Lp // 16), jnp.int64)
    cache2 = jnp.zeros((sg, (1 << (2 * cache_k)) + 1), jnp.int32)
    t0 = time.time()
    for k in range(sg):
        lay = joint.build_block({k: subjects[k].rs}, {})
        sym_d = device_text(lay, Lp)
        sa_d, lcp_d, ovf, w, c = subject_index.fused_build(
            sym_d, jnp.int32(lay.n), cache_k, "hybrid",
            doubling.wide_base_width(1, True), level_budget(Lp),
        )
        salcp, sw, cache2 = subject_index.acc_idx(
            salcp, sw, cache2, sa_d, lcp_d, w, c, jnp.int32(k)
        )
    sync(salcp[0, 0])
    print(f"index build {sg}x{Lp}: {time.time()-t0:.2f}s", flush=True)

    # query words
    parts = []
    qw_base = np.zeros(n, np.int32)
    pos = 0
    for g in range(n):
        qw_base[g] = pos
        parts.append(seqs[g].data)
        parts.append(np.zeros(1, np.uint8))
        pos += length + 1
    blob2 = np.concatenate(parts)
    blob2 = np.concatenate(
        [blob2, np.zeros((-len(blob2)) % 16 + 16, np.uint8)]
    )
    qw = subject_index.device_pack_words_u8(jnp.asarray(blob2))
    sync(qw[:1].astype(jnp.int32))

    nreal = jnp.full(sg, 2 * length + 2, jnp.int32)
    results = {}
    for lanes, K, iters, unroll in [
        (512, 8, 512, 8),
        (2048, 32, 512, 8),
        (8192, 128, 512, 8),
        (16384, 128, 512, 8),
        (32768, 128, 512, 8),
        (2048, 32, 0, 8),
    ]:
        # lanes = pairs x K segments; pairs = n*(n-1) = 12 -> pad rows
        pairs = [(s, g) for s in range(sg) for g in range(n) if s != g]
        seg = length // K
        rows, qwb, rl, thr, seg_end, pos0 = [], [], [], [], [], []
        li = 0
        while li < lanes:
            s, g = pairs[li % len(pairs)]
            j = (li // len(pairs)) % K
            rows.append(s)
            qwb.append(int(qw_base[g]))
            rl.append(subjects[s].len * 2 + 1)
            thr.append(subjects[s].threshold)
            pos0.append(j * seg)
            seg_end.append(min((j + 1) * seg, length))
            li += 1
        z = np.zeros(lanes, np.int32)
        args = [
            jnp.asarray(np.asarray(x, np.int32))
            for x in (rows, qwb, rl, thr, seg_end, pos0, z, z, z)
        ]
        ecap = 1 << 20
        t0 = time.time()
        out = chain_walk_flat_sx(
            salcp, sw, cache2, nreal, qw, *args,
            jnp.int32(max(iters, 0)), jnp.int32(1 << 30),
            cache_k, ecap, unroll,
        )
        sync(out[4][None])
        cold = time.time() - t0
        t0 = time.time()
        out = chain_walk_flat_sx(
            salcp, sw, cache2, nreal, qw, *args,
            jnp.int32(max(iters, 0)), jnp.int32(1 << 30),
            cache_k, ecap, unroll,
        )
        it_done = sync(out[4][None])
        warm = time.time() - t0
        key = f"lanes{lanes}_it{iters}_u{unroll}"
        per_it = warm / max(it_done, 1) * 1e3
        results[key] = {
            "cold_s": round(cold, 2), "warm_s": round(warm, 3),
            "iters": it_done, "ms_per_iter": round(per_it, 3),
            "ns_per_lane_iter": round(per_it * 1e6 / lanes, 1),
        }
        print(key, results[key], flush=True)

    with open("MICROBENCH_SX.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
