"""Where must the reshape live to avoid the 268MB-per-iteration copy?"""
import json, sys, time
import jax, jax.numpy as jnp, numpy as np
QB = 8388608; SG = 8; ITERS = 20000
def log(m): print(m, file=sys.stderr, flush=True)
def sync(a): return int(np.asarray(jax.device_get(a)).ravel()[0])
key = jax.random.PRNGKey(0)
table2d = jax.random.randint(key, (SG, QB), 0, QB, dtype=jnp.int32)
table1d = table2d.reshape(-1)  # materialized once on device

def run(label, loopfn, *args, n_iters=ITERS):
    t0 = time.time(); sync(loopfn(jnp.int32(100), *args))
    log(f"  {label} compile+100: {time.time()-t0:.2f}s")
    t0 = time.time(); sync(loopfn(jnp.int32(n_iters), *args))
    dt = time.time() - t0
    log(f"  {label}: {dt:.2f}s = {dt/n_iters*1e6:.1f}us/iter")

rowoff = (jnp.arange(512, dtype=jnp.int32) % SG) * QB

# A: reshape hoisted before the while_loop, same program
@jax.jit
def loopA(n, t2):
    t1 = t2.reshape(-1)
    def body(st):
        i, x = st
        return i + 1, (x + t1[rowoff + (x + i) % QB]) % QB
    z = jnp.zeros(512, jnp.int32)
    i, x = jax.lax.while_loop(lambda st: st[0] < n, body, (jnp.int32(0), z))
    return x[:1] + i
run("A_reshape_hoisted", loopA, table2d)

# B: 1-D array passed as argument (reshape in a previous program)
@jax.jit
def loopB(n, t1):
    def body(st):
        i, x = st
        return i + 1, (x + t1[rowoff + (x + i) % QB]) % QB
    z = jnp.zeros(512, jnp.int32)
    i, x = jax.lax.while_loop(lambda st: st[0] < n, body, (jnp.int32(0), z))
    return x[:1] + i
run("B_1d_argument", loopB, table1d)

# C: 2-D gather with explicit row/col indices (no reshape at all)
@jax.jit
def loopC(n, t2):
    rows = jnp.arange(512, dtype=jnp.int32) % SG
    def body(st):
        i, x = st
        return i + 1, (x + t2[rows, (x + i) % QB]) % QB
    z = jnp.zeros(512, jnp.int32)
    i, x = jax.lax.while_loop(lambda st: st[0] < n, body, (jnp.int32(0), z))
    return x[:1] + i
run("C_2d_pair_index", loopC, table2d)
log("DONE")
