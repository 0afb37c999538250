"""Madd kernel layout shootout at wave2 bench shapes (run on real TPU).

Compares, at wbv = W*B*V lanes of the 2^22 c=12 v=8 config:
  a) madd_affine_fast        — pts limbs-first (2K, M, 128), contiguous tiles
  b) madd_affine_fast_packed — pts point-major (M, 2K, 128), strided slices
  c) extract einsum variants: point-major 'gpw,pq->gwq' vs limbs-first
     'gpw,pq->wgq' (one MXU pass either way; the second needs no kernel-side
     strided reads downstream)
  d) composed gather+extract+madd chains for both layouts
and scans the PCurve sub-block size. Usage: python scripts/exp_madd_layout.py
"""
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
from fawkes_crypto_tpu.ff.pfield import PField
from fawkes_crypto_tpu.ops.pcurve import PCurve

fctx = FieldCtx.get(Fq)


def timeit(f, *a, iters=10):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main(g_cnt=5632):
    k = fctx.k
    wbv = g_cnt * 128
    pf = PField.get(fctx.fld)
    rng = np.random.default_rng(0)
    # valid-looking limb data (16-bit limbs)
    state = jnp.asarray(
        rng.integers(0, 1 << 16, size=(3 * k, g_cnt, 128), dtype=np.uint32))
    pts_lf = jnp.asarray(
        rng.integers(0, 1 << 16, size=(2 * k, g_cnt, 128), dtype=np.uint32))
    pts_pm = jnp.asarray(np.ascontiguousarray(
        np.asarray(pts_lf).transpose(1, 0, 2)))
    valid = jnp.ones((g_cnt, 128), dtype=np.uint32)
    rows = jnp.asarray(
        rng.integers(0, 1 << 16, size=(wbv, 128), dtype=np.uint32))
    lsel = jnp.asarray(rng.integers(0, 4, size=(wbv,), dtype=np.int32))
    table = jnp.asarray(
        rng.integers(0, 1 << 16, size=(1 << 22, 2 * k), dtype=np.uint32))
    packed = table.reshape(-1, 128)
    jf = jnp.asarray(rng.integers(0, 1 << 22, size=(wbv,), dtype=np.int32))

    print(f"g_cnt={g_cnt} wbv={wbv} k={k}", flush=True)
    for sub in (8, 16, 32):
        pc = PCurve(pf, sub=sub)
        dt = timeit(lambda: pc.madd_affine_fast(state, pts_lf, valid))
        print(f"sub={sub:2d} madd_fast limbs-first : {dt*1e3:7.2f} ms "
              f"= {dt/wbv*1e9:5.1f} ns/lane", flush=True)
        dt = timeit(lambda: pc.madd_affine_fast_packed(state, pts_pm, valid))
        print(f"sub={sub:2d} madd_fast point-major : {dt*1e3:7.2f} ms "
              f"= {dt/wbv*1e9:5.1f} ns/lane", flush=True)

    eye = jnp.eye(128, dtype=jnp.float32)
    row_words = 2 * k
    pack = 128 // row_words

    def extract_pm(rows, lsel):
        r3 = rows.reshape(g_cnt, 128, 128)
        ls = lsel.reshape(g_cnt, 128, 1)
        sel = r3[:, :, 0:row_words]
        for l in range(1, pack):
            sel = jnp.where(
                ls == l, r3[:, :, l * row_words:(l + 1) * row_words], sel)
        t = jnp.einsum("gpw,pq->gwq", sel.astype(jnp.float32), eye,
                       precision=jax.lax.Precision.HIGHEST)
        return t.astype(jnp.uint32)

    def extract_lf(rows, lsel):
        r3 = rows.reshape(g_cnt, 128, 128)
        ls = lsel.reshape(g_cnt, 128, 1)
        sel = r3[:, :, 0:row_words]
        for l in range(1, pack):
            sel = jnp.where(
                ls == l, r3[:, :, l * row_words:(l + 1) * row_words], sel)
        t = jnp.einsum("gpw,pq->wgq", sel.astype(jnp.float32), eye,
                       precision=jax.lax.Precision.HIGHEST)
        return t.astype(jnp.uint32)

    je_pm = jax.jit(extract_pm)
    je_lf = jax.jit(extract_lf)
    dt = timeit(je_pm, rows, lsel)
    print(f"extract point-major          : {dt*1e3:7.2f} ms", flush=True)
    dt = timeit(je_lf, rows, lsel)
    print(f"extract limbs-first          : {dt*1e3:7.2f} ms", flush=True)

    # sanity: same data
    a = np.asarray(je_pm(rows, lsel)).transpose(1, 0, 2)
    b = np.asarray(je_lf(rows, lsel))
    assert (a == b).all()

    pc = PCurve(pf, sub=8)

    @jax.jit
    def chain_pm(st, jf):
        r = jnp.take(packed, jf // pack, axis=0)
        pts = extract_pm(r, (jf % pack).astype(jnp.int32))
        st2, fl = pc.madd_affine_fast_packed(st, pts, valid)
        return st2, fl

    @jax.jit
    def chain_lf(st, jf):
        r = jnp.take(packed, jf // pack, axis=0)
        pts = extract_lf(r, (jf % pack).astype(jnp.int32))
        st2, fl = pc.madd_affine_fast(st, pts, valid)
        return st2, fl

    dt = timeit(chain_pm, state, jf)
    print(f"chain gather+extract+madd PM : {dt*1e3:7.2f} ms "
          f"= {dt/wbv*1e9:5.1f} ns/lane", flush=True)
    dt = timeit(chain_lf, state, jf)
    print(f"chain gather+extract+madd LF : {dt*1e3:7.2f} ms "
          f"= {dt/wbv*1e9:5.1f} ns/lane", flush=True)

    # correctness cross-check of the two chains
    s1, _ = chain_pm(state, jf)
    s2, _ = chain_lf(state, jf)
    assert (np.asarray(s1) == np.asarray(s2)).all()
    print("chains match", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
