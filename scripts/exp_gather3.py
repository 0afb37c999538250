"""Bisect which Pallas feature crashes the axon remote compiler."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def attempt(name, fn, *args):
    try:
        out = np.asarray(fn(*args))
        print(f"{name}: OK {out.ravel()[:4]}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


table = jnp.asarray(np.arange(256 * 32, dtype=np.uint32).reshape(256, 32))
idx = jnp.asarray(np.array([3, 1, 2, 0] * 2, dtype=np.int32))


# T1: PrefetchScalarGridSpec, no DMA
def t1():
    def kernel(s_ref, in_ref, o_ref):
        o_ref[:] = in_ref[:] + s_ref[0]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((256, 32), lambda g, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((256, 32), lambda g, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda t, i: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 32), jnp.uint32),
        grid_spec=gs)(i.astype(jnp.uint32), t))(table, idx)


# T2: static make_async_copy ANY->VMEM scratch -> out
def t2():
    def kernel(in_ref, o_ref, scratch, sem):
        dma = pltpu.make_async_copy(in_ref, scratch, sem)
        dma.start()
        dma.wait()
        o_ref[:] = scratch[:]

    return jax.jit(lambda t: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, 32), jnp.uint32),
                        pltpu.SemaphoreType.DMA(())],
    )(t))(table)


# T3: dynamic-offset DMA, index from SMEM input
def t3():
    def kernel(i_ref, in_ref, o_ref, sem):
        j = i_ref[0]
        dma = pltpu.make_async_copy(
            in_ref.at[pl.ds(j, 8), :], o_ref, sem)
        dma.start()
        dma.wait()

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(i, t))(table, idx)


# T4: loop of per-row dynamic DMAs, single semaphore, wait each
def t4():
    def kernel(i_ref, in_ref, o_ref, sem):
        def body(r, _):
            dma = pltpu.make_async_copy(
                in_ref.at[pl.ds(i_ref[r], 1), :],
                o_ref.at[pl.ds(r, 1), :], sem)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(i, t))(table, idx)


# T5: T4 + semaphore ARRAY + pipelined start/wait
def t5():
    depth = 4

    def kernel(i_ref, in_ref, o_ref, sem):
        def issue(r):
            return pltpu.make_async_copy(
                in_ref.at[pl.ds(i_ref[r], 1), :],
                o_ref.at[pl.ds(r, 1), :], sem.at[r % depth])

        def pro(r, _):
            issue(r).start()
            return 0

        jax.lax.fori_loop(0, depth, pro, 0)

        def body(r, _):
            issue(r - depth).wait()
            issue(r).start()
            return 0

        jax.lax.fori_loop(depth, 8, body, 0)

        def epi(r, _):
            issue(8 - depth + r).wait()
            return 0

        jax.lax.fori_loop(0, depth, epi, 0)

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )(i, t))(table, idx)


attempt("T1 prefetch-grid-spec", t1)
attempt("T2 static-dma", t2)
attempt("T3 dynamic-dma-smem-idx", t3)
attempt("T4 per-row-dma-loop", t4)
attempt("T5 pipelined-sem-array", t5)
