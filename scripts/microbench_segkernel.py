"""Bisect chain_walk_flat's per-iteration cost: which ingredient is slow?"""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np
from andix.esa import rmq

QB = 8388608; SG = 8; N = 25165824; LB = 512
ITERS = 2000
def log(m): print(m, file=sys.stderr, flush=True)
def sync(a): return int(np.asarray(jax.device_get(a)).ravel()[0])

key = jax.random.PRNGKey(0)
# stats: matchlen ~16, never unique -> no anchors, took always (gap>thr)
ml = jax.random.randint(key, (SG*QB,), 12, 24, dtype=jnp.int32)
mlun = ml  # no UNIQ bit
ps = jnp.zeros(SG*QB, jnp.int32)
v = jnp.arange(QB, dtype=jnp.int32)
jump2 = jnp.minimum(v + 17, QB - 1)
jump = jnp.tile(jump2, SG)
isa = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
lcp = jax.random.randint(key, (N,), 0, 50, dtype=jnp.int32)
rm = rmq.build(lcp)

rowoff = ((jnp.arange(LB, dtype=jnp.int32) // 64) % SG) * QB
qoff = jnp.zeros(LB, jnp.int32)
qs = jnp.zeros(LB, jnp.int32)
ss = jnp.zeros(LB, jnp.int32)
rl = jnp.full(LB, QB, jnp.int32)
thr = jnp.full(LB, 20, jnp.int32)
seg_end = jnp.full(LB, QB - 64, jnp.int32)
pos0 = jnp.arange(LB, dtype=jnp.int32) * 64
lq0 = pos0 - 22; ls0 = jnp.zeros(LB, jnp.int32); ll0 = jnp.zeros(LB, jnp.int32)

UNIQ_BIT = jnp.int32(1 << 30)

def make_kernel(ecap, chase, unroll, with_events=True, with_lce=True,
                force_lucky=False):
    @jax.jit
    def kern(isa, rm, mlun1, ps1, jump1, rowoff, qoff, qs, ss, rl, thr,
             seg_end, pos0, lq0, ls0, ll0, max_iters, max_events):
        lb = rowoff.shape[0]
        lane_iota = jnp.arange(lb, dtype=jnp.int32)
        tbase = rowoff + qoff
        def lce(a_text, b_text):
            t1 = isa[a_text]; t2 = isa[b_text]
            return rmq.range_min(rm, jnp.minimum(t1,t2)+1, jnp.maximum(t1,t2))
        def one_step(pos, lq, ls, ll, fin, evn):
            probe = ~fin
            gap0 = pos - lq - ll
            took = probe & (gap0 > thr)
            def jump_and_chase(pos):
                safe_q = jnp.where(probe, pos, 0)
                pos_qj = jnp.where(took, jump1[tbase + safe_q] - qoff, pos)
                for _ in range(chase):
                    can = took & (pos_qj < seg_end)
                    safe_j = jnp.where(can, pos_qj, 0)
                    nxt = jump1[tbase + safe_j] - qoff
                    pos_qj = jnp.where(can & (nxt != pos_qj), nxt, pos_qj)
                return pos_qj
            pos_qj = jax.lax.cond(jnp.any(took), jump_and_chase, lambda p: p, pos)
            in_range = probe & (pos_qj < seg_end)
            probe_b = tbase + jnp.where(in_range, pos_qj, 0)
            probe_t = qs + jnp.where(in_range, pos_qj, 0)
            advance = pos_qj - lq
            gap = advance - ll
            try_s = ls + advance
            lucky_pre = in_range & (try_s < rl) & (gap >= 0) & (gap <= thr)
            if force_lucky:
                lucky_pre = in_range
            if with_lce:
                lucky_len = jax.lax.cond(
                    jnp.any(lucky_pre),
                    lambda: jnp.where(lucky_pre,
                        lce(probe_t, ss + jnp.where(lucky_pre, try_s, 0)), 0),
                    lambda: jnp.zeros(lb, jnp.int32))
            else:
                lucky_len = jnp.zeros(lb, jnp.int32)
            lucky_found = lucky_pre & (lucky_len >= thr)
            vv = mlun1[probe_b]
            aml = vv & (UNIQ_BIT - 1)
            aun = (vv & UNIQ_BIT) != 0
            found = in_range & (lucky_found | (aun & (aml >= thr)))
            this_len = jnp.where(lucky_found, lucky_len, aml)
            this_s = jnp.where(lucky_found, try_s, ps1[probe_b])
            lq = jnp.where(found, pos_qj, lq)
            ls = jnp.where(found, this_s, ls)
            ll = jnp.where(found, this_len, ll)
            pos = jnp.where(probe,
                jnp.where(in_range, pos_qj + this_len + 1, pos_qj), pos)
            evn = evn + found.astype(jnp.int32)
            fin = fin | (probe & ((pos >= seg_end) | (evn >= max_events)))
            return pos, lq, ls, ll, fin, evn, found, pos_qj, this_s, this_len
        def cond(state): return jnp.any(~state[4]) & (state[-1] < max_iters)
        def body(state):
            (pos, lq, ls, ll, fin, evn, ev_a, ev_b, ev_cnt, ovf, it) = state
            founds, qjs, ths, tls = [], [], [], []
            for _ in range(unroll):
                (pos, lq, ls, ll, fin, evn, found, pos_qj, this_s, this_len
                 ) = one_step(pos, lq, ls, ll, fin, evn)
                founds.append(found); qjs.append(pos_qj); ths.append(this_s); tls.append(this_len)
            if with_events:
                f = jnp.concatenate(founds).astype(jnp.int32)
                excl = jnp.cumsum(f, dtype=jnp.int32) - f
                slot = jnp.where(f > 0, ev_cnt + excl, ecap)
                lanes_k = jnp.concatenate([lane_iota]*unroll).astype(jnp.int64)
                lane_len = (lanes_k << 32) | jnp.concatenate(tls).astype(jnp.int64)
                q_s = (jnp.concatenate(qjs).astype(jnp.int64) << 32) | jnp.concatenate(ths).astype(jnp.int64)
                ev_a = ev_a.at[slot].set(lane_len, mode="drop")
                ev_b = ev_b.at[slot].set(q_s, mode="drop")
                total = jnp.sum(f, dtype=jnp.int32)
                ev_cnt = ev_cnt + total
                ovf = ovf | (ev_cnt > ecap)
            return (pos, lq, ls, ll, fin, evn, ev_a, ev_b, ev_cnt, ovf, it+1)
        fin0 = pos0 >= seg_end
        init = (pos0, lq0, ls0, ll0, fin0, jnp.zeros(lb, jnp.int32),
                jnp.zeros(ecap, jnp.int64), jnp.zeros(ecap, jnp.int64),
                jnp.zeros((), jnp.int32), jnp.bool_(False), jnp.zeros((), jnp.int32))
        fr = jax.lax.while_loop(cond, body, init)
        return fr[0][:1] + fr[-1]
    return kern

def run(label, kern, n_iters=ITERS):
    args = (isa, rm, mlun, ps, jump, rowoff, qoff, qs, ss, rl, thr,
            seg_end, pos0, lq0, ls0, ll0)
    t0 = time.time(); sync(kern(*args, jnp.int32(50), jnp.int32(1<<28)))
    log(f"  {label} compile+50: {time.time()-t0:.1f}s")
    t0 = time.time(); sync(kern(*args, jnp.int32(n_iters), jnp.int32(1<<28)))
    dt = time.time() - t0
    log(f"  {label}: {dt:.2f}s = {dt/n_iters*1e6:.0f}us/iter")

ECAP = 4194304
run("full", make_kernel(ECAP, 12, 4))
run("no_events", make_kernel(ECAP, 12, 4, with_events=False))
run("no_lce", make_kernel(ECAP, 12, 4, with_lce=False))
run("chase0", make_kernel(ECAP, 0, 4))
run("unroll1", make_kernel(ECAP, 12, 1))
run("ecap_small", make_kernel(65536, 12, 4))
log("DONE")
