"""Experiment: row-gather throughput — XLA take vs Pallas DMA gather.

The wave MSM's bottleneck is gathering random 128-byte point rows from
an HBM table (ROADMAP item 2). Measures ns/row for both paths.
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


def make_dma_gather(n_rows_out: int, row_words: int, block: int = 1024,
                    depth: int = 8):
    """Returns fn(table (N, row_words) u32, idx (n_rows_out,) i32) ->
    (n_rows_out, row_words) u32, gathering rows via pipelined DMAs."""

    def kernel(idx_ref, tbl_ref, o_ref, sem):
        def issue(i):
            return pltpu.make_async_copy(
                tbl_ref.at[idx_ref[i]], o_ref.at[i], sem.at[i % depth]
            )

        def prologue(i, _):
            issue(i).start()
            return 0

        jax.lax.fori_loop(0, depth, prologue, 0)

        def body(i, _):
            issue(i - depth).wait()
            issue(i).start()
            return 0

        jax.lax.fori_loop(depth, block, body, 0)

        def epilogue(i, _):
            issue(block - depth + i).wait()
            return 0

        jax.lax.fori_loop(0, depth, epilogue, 0)

    grid = (n_rows_out // block,)

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_rows_out, row_words),
                                           jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block,), lambda g: (g,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((block, row_words), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        )(idx, table)

    return run


def main():
    logn = 22
    n = 1 << logn
    m = 1 << 20  # rows gathered
    words = 32
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, (n, words), dtype=np.uint64)
                        .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (m,), dtype=np.int64)
                      .astype(np.int32))

    # XLA take
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    f(table, idx).block_until_ready()
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        f(table, idx).block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"XLA take: {dt*1e3:.1f} ms, {dt/m*1e9:.1f} ns/row, "
          f"{m*words*4/dt/1e9:.1f} GB/s")
    want = np.asarray(f(table, idx))

    for block, depth in ((1024, 8), (2048, 16), (4096, 32)):
        g = make_dma_gather(m, words, block=block, depth=depth)
        try:
            out = np.asarray(g(table, idx))
        except Exception as e:
            print(f"DMA gather block={block} depth={depth} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}")
            continue
        assert (out == want).all(), "DMA gather wrong"
        t0 = time.perf_counter()
        for _ in range(iters):
            g(table, idx).block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        print(f"DMA gather block={block} depth={depth}: {dt*1e3:.1f} ms, "
              f"{dt/m*1e9:.1f} ns/row, {m*words*4/dt/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
