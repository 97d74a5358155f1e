"""Flat-lane vs grid gather cost inside a while_loop (segmented-walk tuning)."""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/MICROBENCH_FLAT.json"
QB = 8388608
SG = 8
ITERS = 20000
results = {"platform": jax.devices()[0].platform, "iters": ITERS}

def log(m): print(m, file=sys.stderr, flush=True)
def sync(a): return int(np.asarray(jax.device_get(a)).ravel()[0])

key = jax.random.PRNGKey(0)
table2d = jax.random.randint(key, (SG, QB), 0, QB, dtype=jnp.int32)

def run(label, shape, body_extra, n_iters=ITERS):
    @jax.jit
    def loop(n, table2d):
        def body(st):
            i, x = st
            return i + 1, body_extra(i, x, table2d)
        def cond(st): return st[0] < n
        z = jnp.zeros(shape, jnp.int32)
        i, x = jax.lax.while_loop(cond, body, (jnp.int32(0), z))
        return x.reshape(-1)[:1] + i
    t0 = time.time(); sync(loop(jnp.int32(100), table2d))
    log(f"  {label} compile+100: {time.time()-t0:.2f}s")
    t0 = time.time(); sync(loop(jnp.int32(n_iters), table2d))
    dt = time.time() - t0
    results[label] = {"s": round(dt,3), "us_per_iter": round(dt/n_iters*1e6,2)}
    log(f"  {label}: {dt:.2f}s = {dt/n_iters*1e6:.1f}us/iter")

# grid: [8, 64] indices via take_along_axis (512 elements)
def grid(i, x, t):
    return (x + jnp.take_along_axis(t, (x + i) % QB, axis=1)) % QB
run("grid_8x64", (8, 64), grid)

# flat gathers at various lane counts
def make_flat(lanes):
    rowoff = (jnp.arange(lanes, dtype=jnp.int32) % SG) * QB
    def flat(i, x, t):
        t1 = t.reshape(-1)
        return (x + t1[rowoff + (x + i) % QB]) % QB
    return flat
for lanes in (64, 512, 4096):
    run(f"flat_{lanes}", (lanes,), make_flat(lanes))

# flat x10 chained (chase-like) at 512
def flat10(i, x, t):
    t1 = t.reshape(-1)
    rowoff = (jnp.arange(512, dtype=jnp.int32) % SG) * QB
    for _ in range(10):
        x = (x + t1[rowoff + x % QB]) % QB
    return x
run("flat512_x10", (512,), flat10)

def grid10(i, x, t):
    for _ in range(10):
        x = (x + jnp.take_along_axis(t, x % QB, axis=1)) % QB
    return x
run("grid_8x64_x10", (8, 64), grid10)

with open(out, "w") as f: json.dump(results, f, indent=1)
log("DONE")
