"""Profile the wave MSM's stages in isolation on a real chip:
sort/bounds, gather+transpose, madd kernel, full window_sums.

Each stage is wrapped to return a tiny checksum so completion is
observable without pulling large arrays through the axon tunnel.
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.msm_wave import MSMWave

fctx = FieldCtx.get(Fq)
rng = np.random.default_rng(7)


def timeit(f, *a, iters=5):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*a))
    return (time.perf_counter() - t0) / iters


def main(logn=22, c=12, v=8):
    n = 1 << logn
    k = fctx.k
    rows = jnp.asarray(
        rng.integers(0, 2**16, (n, 2 * k), dtype=np.uint64)
        .astype(np.uint32))
    sc = np.zeros((n, k), dtype=np.uint32)
    sc[:, :] = rng.integers(0, 2**16, (n, k), dtype=np.uint64)
    sc[:, -1] &= 0x3FFF
    sc = jnp.asarray(sc)
    ctx = MSMWave(fctx, n, c=c, v=v)
    w, b, wbv = ctx.w, ctx.b, ctx.wbv
    print(f"n=2^{logn} c={c} v={v}: W={w} B={b} WBV={wbv}", flush=True)

    @jax.jit
    def sort_stage(scalars):
        digits = ctx._digits(scalars)
        order = jnp.argsort(digits, axis=1).astype(jnp.int32)
        sd = jnp.take_along_axis(digits, order, axis=1)
        return order.sum() + sd.sum()

    dt = timeit(sort_stage, sc)
    print(f"digits+argsort: {dt*1e3:.1f} ms", flush=True)

    pos = jnp.asarray(
        rng.integers(0, n, (b * v, w), dtype=np.int64).astype(np.int32))
    order_t = jnp.asarray(
        rng.integers(0, n, (n, w), dtype=np.int64).astype(np.int32))

    @jax.jit
    def gather_stage(order_t, pos, points_rows):
        idx = jnp.take_along_axis(order_t, pos, axis=0)
        idx = idx.reshape(b, v, w).transpose(2, 0, 1).reshape(-1)
        pts = jnp.take(points_rows, idx, axis=0)
        return pts.T.reshape(2 * k, wbv // 128, 128).sum()

    dt = timeit(gather_stage, order_t, pos, rows, iters=10)
    print(f"gather+transpose per wave: {dt*1e3:.2f} ms "
          f"({dt/wbv*1e9:.1f} ns/row)", flush=True)

    @jax.jit
    def gather_only(pos, points_rows):
        idx = pos.reshape(-1)[:wbv]
        pts = jnp.take(points_rows, idx, axis=0)
        return pts.sum()

    dt = timeit(gather_only, pos, rows, iters=10)
    print(f"row gather only per wave: {dt*1e3:.2f} ms", flush=True)

    state = jnp.zeros((3 * k, wbv // 128, 128), dtype=jnp.uint32)
    pts_lf = jnp.asarray(
        rng.integers(0, 2**16, (2 * k, wbv // 128, 128), dtype=np.uint64)
        .astype(np.uint32))
    vmask = jnp.ones((wbv // 128, 128), dtype=jnp.uint32)

    @jax.jit
    def madd_fast_stage(state, pts, vmask):
        st, fl = ctx.pc.madd_affine_fast(state, pts, vmask)
        return st.sum() + fl.sum()

    dt = timeit(madd_fast_stage, state, pts_lf, vmask, iters=10)
    nm = wbv * 14
    print(f"madd_affine_fast per wave: {dt*1e3:.2f} ms "
          f"(~{nm/dt/1e6:.0f} M mont-mul/s)", flush=True)

    @jax.jit
    def madd_masked_stage(state, pts, vmask):
        return ctx.pc.madd_affine_masked(state, pts, vmask).sum()

    dt = timeit(madd_masked_stage, state, pts_lf, vmask, iters=10)
    print(f"madd_affine_masked per wave: {dt*1e3:.2f} ms", flush=True)

    @jax.jit
    def ws_stage(rows, sc):
        return ctx._window_sums.__wrapped__(ctx, rows, sc).sum() \
            if hasattr(ctx._window_sums, "__wrapped__") else None

    dt = timeit(lambda r, s: ctx._window_sums(r, s), rows, sc, iters=3)
    print(f"window_sums total: {dt*1e3:.0f} ms -> {n/dt/1e3:.0f} k pts/s",
          flush=True)


if __name__ == "__main__":
    logn = int(os.environ.get("LOGN", "22"))
    c = int(os.environ.get("C", "12"))
    v = int(os.environ.get("V", "8"))
    main(logn, c, v)
