"""Stage profile of MSMWave2 at bench shapes: sort+bounds, index fetch,
packed gather, extract, madd, and the composed body. Run on real TPU."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import fawkes_crypto_tpu
fawkes_crypto_tpu.enable_compile_cache()
import jax, functools
import jax.numpy as jnp
import numpy as np
from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.msm_wave2 import MSMWave2
from fawkes_crypto_tpu.ops.tablegen import gen_distinct_rows, random_scalar_limbs

fctx = FieldCtx.get(Fq)

def timeit(f, *a, iters=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

def main(logn=22, c=12, v=8):
    n = 1 << logn
    ctx = MSMWave2(fctx, n, c=c, v=v)
    w, b, k, wbv = ctx.w, ctx.b, ctx.k, ctx.wbv
    pack, row_words = ctx.pack, ctx.row_words
    g_cnt = wbv // 128
    pc = ctx.pc
    table = gen_distinct_rows(fctx, n, chunk=min(n, 1 << 22))
    np.asarray(table)
    scalars = jnp.asarray(random_scalar_limbs(n, fctx.k, seed=7))
    packed = table.reshape(-1, 128)
    print(f"n=2^{logn} W={w} B={b} V={v} wbv={wbv} g_cnt={g_cnt}", flush=True)

    # stage 1: sort + bounds
    @jax.jit
    def sort_only(sc):
        digits = ctx._digits(sc)
        iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (w, n))
        sd, order = jax.lax.sort_key_val(digits, iota, dimension=1)
        return sd.sum() + order.sum()
    print(f"sort_key_val (W,N): {timeit(sort_only, scalars)*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(3)
    jf = jnp.asarray(rng.integers(0, n, size=wbv, dtype=np.int32))
    order_v = jnp.asarray(rng.integers(0, n, size=(w, n//v, v), dtype=np.int32))
    brow = jnp.asarray(rng.integers(0, n//v, size=(w, b), dtype=np.int32))

    # stage 2: index fetch (V-aligned row fetch)
    @jax.jit
    def idx_fetch(ov, br):
        j = jnp.take_along_axis(ov, br[:, :, None], axis=1)
        return j.reshape(-1).sum()
    dt = timeit(idx_fetch, order_v, brow)
    print(f"idx fetch (W,B,V): {dt*1e3:.2f} ms = {dt/ (w*b)*1e9:.1f} ns/row", flush=True)

    # stage 3: packed gather
    @jax.jit
    def gather(pk_, j):
        rows = jnp.take(pk_, j // pack, axis=0)
        return rows.astype(jnp.uint32).sum()
    dt = timeit(gather, packed, jf)
    print(f"packed gather (WBV,128): {dt*1e3:.2f} ms = {dt/wbv*1e9:.1f} ns/row", flush=True)

    # stage 4: gather + extract
    eye = jnp.eye(128, dtype=jnp.float32)
    @jax.jit
    def gath_extract(pk_, j):
        rows = jnp.take(pk_, j // pack, axis=0)
        lsel = (j % pack).astype(jnp.int32)
        r3 = rows.reshape(g_cnt, 128, 128)
        ls = lsel.reshape(g_cnt, 128, 1)
        sel = r3[:, :, 0:row_words]
        for l in range(1, pack):
            sel = jnp.where(ls == l, r3[:, :, l*row_words:(l+1)*row_words], sel)
        t = jnp.einsum("gpw,pq->gwq", sel.astype(jnp.float32), eye,
                       precision=jax.lax.Precision.HIGHEST)
        return t.astype(jnp.uint32).sum()
    dt = timeit(gath_extract, packed, jf)
    print(f"gather+extract: {dt*1e3:.2f} ms = {dt/wbv*1e9:.1f} ns/row", flush=True)

    # stage 5: madd alone
    state = jnp.zeros((3*k, g_cnt, 128), dtype=jnp.uint32)
    pts = jnp.asarray(rng.integers(0, 1<<30, size=(g_cnt, 2*k, 128), dtype=np.int64).astype(np.uint32))
    vmask = jnp.ones((g_cnt, 128), dtype=jnp.uint32)
    @jax.jit
    def madd(st, q, m):
        st2, flags = pc.madd_affine_fast_packed(st, q, m)
        return st2[0].sum() + flags.sum()
    dt = timeit(madd, state, pts, vmask)
    print(f"madd_fast_packed: {dt*1e3:.2f} ms = {dt/wbv*1e9:.1f} ns/lane", flush=True)
    @jax.jit
    def maddm(st, q, m):
        return pc.madd_affine_masked_packed(st, q, m)[0].sum()
    dt = timeit(maddm, state, pts, vmask)
    print(f"madd_masked_packed: {dt*1e3:.2f} ms = {dt/wbv*1e9:.1f} ns/lane", flush=True)

    # stage 6: full window_sums for reference
    dt = timeit(ctx._window_sums, table, scalars, iters=2)
    print(f"window_sums total: {dt*1e3:.0f} ms", flush=True)

if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
