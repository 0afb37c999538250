"""Full-size pieces of the DMA-gather wave pipeline:
(a) pipelined (1,128)-row DMA gather rate at M=720896
(b) XLA (M,128)->(128,M) full-lane transpose
(c) 4-way lane-group select
(d) take_along_axis index gather (order_t indirection)
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *a, iters=5):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*a))
    return (time.perf_counter() - t0) / iters


def make_row_gather(m, block=2048, depth=32):
    """table (T, 8, 128) u32; idx (m,) i32 of sub-rows (j -> tile j//8,
    sublane j%8); out (m//8, 8, 128)."""

    def kernel(idx_ref, tbl_ref, o_ref, sem):
        def issue(i):
            j = idx_ref[i]
            return pltpu.make_async_copy(
                tbl_ref.at[j // 8, pl.ds(j % 8, 1)],
                o_ref.at[i // 8, pl.ds(i % 8, 1)],
                sem.at[i % depth],
            )

        def pro(i, _):
            issue(i).start()
            return 0

        jax.lax.fori_loop(0, depth, pro, 0)

        def body(i, _):
            issue(i - depth).wait()
            issue(i).start()
            return 0

        jax.lax.fori_loop(depth, block, body, 0)

        def epi(i, _):
            issue(block - depth + i).wait()
            return 0

        jax.lax.fori_loop(0, depth, epi, 0)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m // 8, 8, 128), jnp.uint32),
            grid=(m // block,),
            in_specs=[
                pl.BlockSpec((block,), lambda g: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((block // 8, 8, 128),
                                   lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        )(idx, table)

    return run


def main():
    logn = 22
    n = 1 << logn
    m = 720896
    rng = np.random.default_rng(0)
    # table: n points, 32 words each, packed 4/row, 32/tile
    tbl_flat = rng.integers(0, 2**32, (n, 32), dtype=np.uint64) \
        .astype(np.uint32)
    table3 = jnp.asarray(tbl_flat.reshape(n // 32, 8, 128))
    pt_idx = rng.integers(0, n, (m,), dtype=np.int64).astype(np.int32)
    # sub-row index: point j lives in sub-row j//4
    row_idx = jnp.asarray(pt_idx // 4)
    lsel = jnp.asarray(pt_idx % 4)

    for block, depth in ((2048, 16), (2048, 32), (4096, 64)):
        try:
            g = make_row_gather(m, block=block, depth=depth)
            out = np.asarray(g(table3, row_idx))
        except Exception as e:
            print(f"gather block={block} depth={depth} FAILED: "
                  f"{str(e)[:140]}", flush=True)
            continue
        # verify a few rows
        want = tbl_flat.reshape(-1, 128)[np.asarray(row_idx[:100])]
        got = out.reshape(-1, 128)[:100]
        ok = (want == got).all()
        dt = timeit(lambda t, i: g(t, i).sum(), table3, row_idx)
        print(f"gather block={block} depth={depth}: ok={ok} "
              f"{dt*1e3:.2f} ms ({dt/m*1e9:.1f} ns/row, "
              f"{m*512/dt/1e9:.0f} GB/s)", flush=True)

    rows = jnp.asarray(
        rng.integers(0, 2**32, (m, 128), dtype=np.uint64)
        .astype(np.uint32))

    @jax.jit
    def transpose_stage(rows):
        return rows.T.sum()

    dt = timeit(transpose_stage, rows)
    print(f"transpose (M,128)->(128,M): {dt*1e3:.2f} ms", flush=True)

    @jax.jit
    def extract_stage(rows, lsel):
        t = rows.T  # (128, M)
        t4 = t.reshape(4, 32, m)
        out = jnp.zeros((32, m), jnp.uint32)
        for l in range(4):
            out = jnp.where(lsel[None, :] == l, t4[l], out)
        return out.sum()

    dt = timeit(extract_stage, rows, lsel)
    print(f"transpose+select -> (32,M): {dt*1e3:.2f} ms", flush=True)

    order_t = jnp.asarray(
        rng.integers(0, n, (n, 22), dtype=np.int64).astype(np.int32))
    pos = jnp.asarray(
        rng.integers(0, n, (m // 22 * 22 // 22, 22), dtype=np.int64)
        .astype(np.int32))

    @jax.jit
    def idx_stage(order_t, pos):
        return jnp.take_along_axis(order_t, pos, axis=0).sum()

    dt = timeit(idx_stage, order_t, pos)
    print(f"take_along_axis idx gather ({pos.shape}): {dt*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
