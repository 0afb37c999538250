"""Characterize XLA take on the real chip: per-row cost vs row width,
table size, m, index sortedness. Determines the MSM gather design."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def timeit(f, *a, iters=5):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*a))
    return (time.perf_counter() - t0) / iters


def bench_take(log_rows, width, m, sort_idx=False, note=""):
    n = 1 << log_rows
    tbl = jnp.asarray(rng.integers(0, 2**32, (n, width), dtype=np.uint64)
                      .astype(np.uint32))
    idx = rng.integers(0, n, (m,), dtype=np.int64).astype(np.int32)
    if sort_idx:
        idx = np.sort(idx)
    idx = jnp.asarray(idx)

    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    dt = timeit(f, tbl, idx)
    dt -= RTT
    print(f"take tbl=(2^{log_rows},{width}) m=2^{int(np.log2(m))}"
          f"{' sorted' if sort_idx else ''}{note}: {dt*1e3:.1f} ms "
          f"({dt/m*1e9:.1f} ns/row, {m*width*4/dt/1e9:.1f} GB/s useful)",
          flush=True)
    del tbl


# calibrate RTT
x = jnp.zeros(())
g = jax.jit(lambda x: x + 1)
np.asarray(g(x))
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(g(x))
RTT = (time.perf_counter() - t0) / 20
print(f"RTT {RTT*1e3:.1f} ms", flush=True)

M = 1 << 20
bench_take(22, 32, M)
bench_take(22, 16, M)
bench_take(22, 64, M)
bench_take(22, 128, M)
bench_take(22, 256, M >> 1)
bench_take(22, 512, M >> 2)
bench_take(20, 32, M)
bench_take(18, 32, M)
bench_take(22, 32, M, sort_idx=True)
bench_take(22, 128, M, sort_idx=True)
