"""Does a lax.cond around the gather re-materialize the hoisted reshape?"""
import sys, time
import jax, jax.numpy as jnp, numpy as np
QB = 8388608; SG = 8; ITERS = 20000
def log(m): print(m, file=sys.stderr, flush=True)
def sync(a): return int(np.asarray(jax.device_get(a)).ravel()[0])
key = jax.random.PRNGKey(0)
table2d = jax.random.randint(key, (SG, QB), 0, QB, dtype=jnp.int32)
rowoff = (jnp.arange(512, dtype=jnp.int32) % SG) * QB

def run(label, loopfn, *args, n_iters=ITERS):
    t0 = time.time(); sync(loopfn(jnp.int32(100), *args))
    log(f"  {label} compile+100: {time.time()-t0:.2f}s")
    t0 = time.time(); sync(loopfn(jnp.int32(n_iters), *args))
    dt = time.time() - t0
    log(f"  {label}: {dt:.2f}s = {dt/n_iters*1e6:.1f}us/iter")

# D: hoisted reshape + gather inside an (always-taken) lax.cond
@jax.jit
def loopD(n, t2):
    t1 = t2.reshape(-1)
    def body(st):
        i, x = st
        def taken(x):
            return (x + t1[rowoff + x % QB]) % QB
        x = jax.lax.cond(i >= 0, taken, lambda x: x, x)
        return i + 1, x
    z = jnp.zeros(512, jnp.int32)
    i, x = jax.lax.while_loop(lambda st: st[0] < n, body, (jnp.int32(0), z))
    return x[:1] + i
run("D_cond_gather_reshape_hoisted", loopD, table2d)

# E: same but the cond is rarely taken (every 64th iter)
@jax.jit
def loopE(n, t2):
    t1 = t2.reshape(-1)
    def body(st):
        i, x = st
        def taken(x):
            return (x + t1[rowoff + x % QB]) % QB
        x = jax.lax.cond(i % 64 == 0, taken, lambda x: x, x)
        return i + 1, x
    z = jnp.zeros(512, jnp.int32)
    i, x = jax.lax.while_loop(lambda st: st[0] < n, body, (jnp.int32(0), z))
    return x[:1] + i
run("E_cond_rare_gather", loopE, table2d)
log("DONE")
