"""Scan PCurve madd block size (sub) for madd_affine_fast_packed at wave2
shapes."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import fawkes_crypto_tpu
fawkes_crypto_tpu.enable_compile_cache()
import jax
import jax.numpy as jnp
import numpy as np
from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.pfield import PField
from fawkes_crypto_tpu.ops.pcurve import PCurve

pf = PField.get(Fq)
k = pf.k
g_cnt = 5632
rng = np.random.default_rng(3)

def timeit(f, *a, iters=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

state = jnp.asarray(rng.integers(0, 1<<30, size=(3*k, g_cnt, 128), dtype=np.int64).astype(np.uint32))
pts = jnp.asarray(rng.integers(0, 1<<30, size=(g_cnt, 2*k, 128), dtype=np.int64).astype(np.uint32))
vmask = jnp.ones((g_cnt, 128), dtype=jnp.uint32)
wbv = g_cnt * 128
for sub in (4, 8, 16, 32, 64):
    pc = PCurve(pf, sub=sub)
    def madd(st, q, m, pc=pc):
        st2, flags = pc.madd_affine_fast_packed(st, q, m)
        return st2[0].sum() + flags.sum()
    try:
        dt = timeit(jax.jit(madd), state, pts, vmask)
        print(f"sub={sub}: {dt*1e3:.2f} ms = {dt/wbv*1e9:.1f} ns/lane", flush=True)
    except Exception as e:
        print(f"sub={sub}: FAILED {type(e).__name__}: {e}", flush=True)
