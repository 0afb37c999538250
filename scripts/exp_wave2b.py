"""Follow-up wave2 measurements: einsum direct to limbs-first layout,
idx fetch at V=32, end shape checks."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(7)

_x = jnp.zeros(())
_g = jax.jit(lambda x: x + 1)
np.asarray(_g(_x))
_t0 = time.perf_counter()
for _ in range(20):
    np.asarray(_g(_x))
RTT = (time.perf_counter() - _t0) / 20
print(f"RTT {RTT*1e3:.1f} ms", flush=True)


def timeit(f, *a, iters=5):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*a))
    return (time.perf_counter() - t0) / iters - RTT


def p(msg):
    print(msg, flush=True)


N = 1 << 22
W = 22

for M in (720896, 720896 * 4):
    G = M // 128
    rows = jnp.asarray(
        rng.integers(0, 1 << 16, (M, 128), dtype=np.int64)
        .astype(np.uint32))
    lsel = jnp.asarray(
        rng.integers(0, 4, (M,), dtype=np.int64).astype(np.int32))
    eye = jnp.eye(128, dtype=jnp.float32)

    @jax.jit
    def extract_lf(rows, lsel):
        r3 = rows.reshape(G, 128, 128)
        ls = lsel.reshape(G, 128, 1)
        sel = r3[:, :, 0:32]
        for l in range(1, 4):
            sel = jnp.where(ls == l, r3[:, :, 32 * l:32 * l + 32], sel)
        t = jnp.einsum("gpw,pq->wgq", sel.astype(jnp.float32), eye,
                       precision=jax.lax.Precision.HIGHEST)
        return t.astype(jnp.uint32)  # (32, G, 128) limbs-first

    out = np.asarray(extract_lf(rows, lsel))
    r_np = np.asarray(rows).reshape(G, 128, 128)
    l_np = np.asarray(lsel).reshape(G, 128)
    ok = True
    for g in range(2):
        for pt in range(0, 128, 17):
            l = l_np[g, pt]
            if not (out[:, g, pt] == r_np[g, pt, 32 * l:32 * l + 32]).all():
                ok = False
    dt = timeit(jax.jit(lambda r, s: extract_lf(r, s).sum()), rows, lsel,
                iters=5)
    p(f"einsum select+transpose->limbs-first ({M} rows): ok={ok} "
      f"{dt*1e3:.2f} ms")

# idx fetch at V=32
V = 32
order = jnp.asarray(
    rng.integers(0, N, (W, N), dtype=np.int64).astype(np.int32))
brow = jnp.asarray(
    rng.integers(0, N // V, (W, 4096, 1), dtype=np.int64).astype(np.int32))


@jax.jit
def idx_rows32(order, brow):
    o3 = order.reshape(W, N // V, V)
    return jnp.take_along_axis(o3, brow, axis=1).sum()


dt = timeit(idx_rows32, order, brow, iters=5)
nv = W * 4096 * V
p(f"V=32 idx fetch ({W}x4096 rows of {V}): {dt*1e3:.2f} ms "
  f"({dt/nv*1e9:.1f} ns/val)")

# gather at the bench's packed-table shape: (2^20, 128) table
tblp = jnp.asarray(
    rng.integers(0, 1 << 16, (N // 4, 128), dtype=np.int64)
    .astype(np.uint32))
idx = jnp.asarray(
    rng.integers(0, N // 4, (720896 * 4,), dtype=np.int64)
    .astype(np.int32))
dt = timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum()), tblp, idx,
            iters=3)
p(f"take (2^20,128) m=2.9M: {dt*1e3:.1f} ms ({dt/idx.shape[0]*1e9:.1f} "
  f"ns/row)")
