"""Bisect 2: which dynamic addressing forms compile on axon Mosaic."""

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
        msg = str(e).replace("\n", " ")[:120]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


table = jnp.asarray(np.arange(256 * 32, dtype=np.uint32).reshape(256, 32))
idx = jnp.asarray(np.array([3, 1, 2, 0] * 2, dtype=np.int32))


# T6: dynamic DST of DMA (src static), dst VMEM out
def t6():
    def kernel(i_ref, in_ref, o_ref, sem):
        j = i_ref[0]
        dma = pltpu.make_async_copy(
            in_ref.at[pl.ds(0, 8), :], o_ref.at[pl.ds(j, 8), :], sem)
        dma.start()
        dma.wait()

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(i, t))(table, idx)


# T7: integer .at[j] indexing on src
def t7():
    def kernel(i_ref, in_ref, o_ref, sem):
        j = i_ref[0]
        dma = pltpu.make_async_copy(in_ref.at[j], o_ref.at[0], sem)
        dma.start()
        dma.wait()

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(i, t))(table, idx)


# T8: dynamic multiple-of-8 offset
def t8():
    def kernel(i_ref, in_ref, o_ref, sem):
        j = i_ref[0] * 8
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


# T9: dynamic VMEM->VMEM load (no DMA): o[r] = scratch[idx[r]]
def t9():
    def kernel(i_ref, in_ref, o_ref):
        def body(r, _):
            j = i_ref[r]
            o_ref[pl.ds(r, 1), :] = in_ref[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((256, 32), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, t))(table, idx)


# T10: index_map reading scalar-prefetch ref (pipelined gather)
def t10():
    def kernel(s_ref, in_ref, o_ref):
        o_ref[:] = in_ref[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(8,),
        in_specs=[pl.BlockSpec((1, 32), lambda g, s: (s[g], 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 32), lambda g, s: (g, 0),
                               memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda t, i: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 32), jnp.uint32),
        grid_spec=gs)(i, t))(table, idx)


# T11: dynamic gather via vector load o_ref[:] = in_ref[jnp vector idx, :]
def t11():
    def kernel(i_ref, in_ref, o_ref):
        v = i_ref[:]  # (8,) int32 in SMEM? use as jnp index
        o_ref[:] = in_ref[v, :]

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((256, 32), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, t))(table, idx)


import os
sel = os.environ.get("SEL", "")
tests = {"6": ("T6 dyn-dst-dma", t6), "7": ("T7 int-at-dma", t7),
         "8": ("T8 aligned-dyn-dma", t8), "9": ("T9 dyn-vmem-load", t9),
         "10": ("T10 prefetch-index-map", t10),
         "11": ("T11 vector-index-vmem", t11)}
print("start", sel, flush=True)
if sel in tests:
    attempt(*tests[sel])
    raise SystemExit


# T12: 3-D table (T, 8, 128); dynamic major-dim DMA
def t12():
    table3 = jnp.asarray(
        np.arange(32 * 8 * 128, dtype=np.uint32).reshape(32, 8, 128))

    def kernel(i_ref, in_ref, o_ref, sem):
        def body(r, _):
            dma = pltpu.make_async_copy(
                in_ref.at[i_ref[r]], o_ref.at[r], sem)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(i, table3))(table, idx)


# T13: T12 + semaphore-array pipelining (the real gather shape)
def t13():
    table3 = jnp.asarray(
        np.arange(32 * 8 * 128, dtype=np.uint32).reshape(32, 8, 128))
    depth = 4

    def kernel(i_ref, in_ref, o_ref, sem):
        def issue(r):
            return pltpu.make_async_copy(
                in_ref.at[i_ref[r]], o_ref.at[r], sem.at[r % depth])

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
        out_shape=jax.ShapeDtypeStruct((8, 8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )(i, table3))(table, idx)


tests["12"] = ("T12 major-dim-dyn-dma", t12)
tests["13"] = ("T13 pipelined-major-dyn-dma", t13)
if sel in ("12", "13"):
    attempt(*tests[sel])


# T14: dynamic sublane-offset (1,128) DMA from 3-D table
def t14():
    table3 = jnp.asarray(
        np.arange(32 * 8 * 128, dtype=np.uint32).reshape(32, 8, 128))

    def kernel(i_ref, in_ref, o_ref, sem):
        def body(r, _):
            j = i_ref[r]
            q = j // 8
            s = j % 8
            dma = pltpu.make_async_copy(
                in_ref.at[q, pl.ds(s, 1)], o_ref.at[r], sem)
            dma.start()
            dma.wait()
            return 0

        jax.lax.fori_loop(0, 8, body, 0)

    return jax.jit(lambda t, i: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 1, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )(i, table3))(table, idx)


tests["14"] = ("T14 dyn-sublane-1x128-dma", t14)
if sel == "14":
    attempt(*tests[sel])
