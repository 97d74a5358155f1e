"""Post-eco29 TPU experiments: pallas scan A/B, tables anatomy,
SA bucket-frac A/B, HBM peak measurement.  Sections via argv."""
import sys, time, os
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")

def sync(a): return int(np.asarray(jax.device_get(a)).ravel()[0])
section = sys.argv[1] if len(sys.argv) > 1 else "all"

if section in ("scan", "all"):
    from andix.esa import scans
    print("pallas probe:", scans._pallas_available(), flush=True)
    N = 25165824
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
    flags = jnp.asarray(rng.random(N) < 0.3)
    sa = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    for mode in ("xla", "pallas"):
        os.environ["ANDIX_FLAG_SCAN"] = mode
        try:
            t0 = time.time()
            out = scans.flag_scan(vals, flags, sa)
            sync(out[0][:1])
            print(f"flag_scan[{mode}] compile+run: {time.time()-t0:.2f}s", flush=True)
            for t in range(2):
                t0 = time.time()
                out = scans.flag_scan(vals, flags, sa)
                sync(out[0][:1])
                print(f"flag_scan[{mode}] warm{t}: {time.time()-t0:.3f}s", flush=True)
            if mode == "pallas":
                os.environ["ANDIX_FLAG_SCAN"] = "xla"
                ref = scans.flag_scan(vals, flags, sa)
                eq = all(bool((np.asarray(a) == np.asarray(b)).all())
                         for a, b in zip(ref, out))
                print("pallas == xla on TPU:", eq, flush=True)
        except Exception as e:
            print(f"flag_scan[{mode}] FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
    os.environ.pop("ANDIX_FLAG_SCAN", None)

if section in ("mem", "all"):
    # HBM peak during a 2 x 5 Mbp block build (footprint tuning)
    import bench as benchmod
    from andix.runtime import Context
    from andix.sequence import subject_init
    from andix.esa import joint
    from andix.esa.backend_jax import JaxBackend
    seqs = benchmod.make_family(2, 5_000_000)
    subjects = [subject_init(s, Context().anchor_p_value) for s in seqs]
    be = JaxBackend()
    dev = jax.devices()[0]
    def stats(tag):
        try:
            m = dev.memory_stats()
            print(f"mem[{tag}]: inuse={m.get('bytes_in_use',0)/2**30:.2f}G "
                  f"peak={m.get('peak_bytes_in_use',0)/2**30:.2f}G", flush=True)
        except Exception as e:
            print(f"mem[{tag}] unavailable: {e}", flush=True)
    stats("start")
    layout = joint.build_block({i: subjects[i].rs for i in range(2)}, {})
    ctx = be.prepare_block(layout)
    sync(ctx.tq_d[:1])
    stats("after prepare_block")
    n = ctx.sa_d.shape[0]
    print(f"padded_n={n} ({n/2**20:.1f}M syms)", flush=True)
