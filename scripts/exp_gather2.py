"""Debug: find a Pallas DMA row-gather variant that compiles on the
axon toolchain, then measure ns/row vs XLA take."""

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


def variant_a(n_out, words, block=512, depth=8):
    """Scalar-prefetch indices; per-row DMA with 2-D (1, words) slices."""

    def kernel(idx_ref, tbl_ref, o_ref, sem):
        g = pl.program_id(0)
        base = g * block

        def issue(i):
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(idx_ref[base + i], 1), :],
                o_ref.at[pl.ds(i, 1), :],
                sem.at[i % depth],
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_out // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, words), lambda g, *_: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_out, words), jnp.uint32),
            grid_spec=grid_spec,
        )(idx, table)

    return run


def variant_b(n_out, words, block=512, depth=8):
    """Like A but output stays in ANY (HBM) and DMA goes HBM->HBM."""

    def kernel(idx_ref, tbl_ref, o_ref, sem):
        g = pl.program_id(0)
        base = g * block

        def issue(i):
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(idx_ref[base + i], 1), :],
                o_ref.at[pl.ds(base + i, 1), :],
                sem.at[i % depth],
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_out // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )

    @jax.jit
    def run(table, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_out, words), jnp.uint32),
            grid_spec=grid_spec,
        )(idx, table)

    return run


def main():
    logn = 20
    n = 1 << logn
    m = 1 << 18
    words = 32
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**32, (n, words), dtype=np.uint64)
                        .astype(np.uint32))
    idx = jnp.asarray(rng.integers(0, n, (m,), dtype=np.int64)
                      .astype(np.int32))

    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
    np.asarray(f(table, idx))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        np.asarray(f(table, idx))
    dt = (time.perf_counter() - t0) / iters
    print(f"XLA take: {dt*1e3:.1f} ms, {dt/m*1e9:.1f} ns/row", flush=True)
    want = np.asarray(jax.jit(lambda t, i: jnp.take(t, i, axis=0))(
        table, idx))

    for name, maker in (("A-vmem", variant_a), ("B-hbm", variant_b)):
        for block, depth in ((512, 8), (2048, 16)):
            try:
                g = maker(m, words, block=block, depth=depth)
                out = np.asarray(g(table, idx))
            except Exception as e:
                msg = str(e).replace("\n", " ")[:300]
                print(f"{name} block={block} depth={depth} FAILED: "
                      f"{type(e).__name__}: {msg}", flush=True)
                continue
            ok = (out == want).all()
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(g(table, idx).sum())
            dt = (time.perf_counter() - t0) / iters
            print(f"{name} block={block} depth={depth}: ok={ok} "
                  f"{dt*1e3:.1f} ms, {dt/m*1e9:.1f} ns/row", flush=True)


if __name__ == "__main__":
    main()
