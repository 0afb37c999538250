"""Measure the pieces of the planned wave2 MSM schedule on a real chip:

1. sort variants: monolithic (W, N) argsort vs batched sub-block sorts
2. einsum-based select+transpose (MXU) vs XLA transpose
3. packed madd kernel: pts as (sb, 2K, 128) blocks, limb tile =
   pts_ref[:, i, :] (compile + throughput)
4. V-aligned idx row fetch vs per-element take_along_axis
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

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ff.pfield import PField

fctx = FieldCtx.get(Fq)
pf = PField.get(Fq)
rng = np.random.default_rng(7)

# calibrate RTT
_x = jnp.zeros(())
_g = jax.jit(lambda x: x + 1)
np.asarray(_g(_x))
_t0 = time.perf_counter()
for _ in range(20):
    np.asarray(_g(_x))
RTT = (time.perf_counter() - _t0) / 20
print(f"RTT {RTT*1e3:.1f} ms", flush=True)


def timeit(f, *a, iters=5):
    np.asarray(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(f(*a))
    return (time.perf_counter() - t0) / iters - RTT


def p(msg):
    print(msg, flush=True)


N = 1 << 22
W = 22

# ---- 1. sort variants -------------------------------------------------------
digits = jnp.asarray(
    rng.integers(0, 1 << 12, (W, N), dtype=np.int64).astype(np.int32))

dt = timeit(jax.jit(lambda d: jnp.argsort(d, axis=1).sum()), digits, iters=3)
p(f"argsort (W={W}, 2^22) axis=1: {dt*1e3:.0f} ms")

d1 = digits[0]
dt = timeit(jax.jit(lambda d: jnp.argsort(d).sum()), d1, iters=3)
p(f"argsort single (2^22,): {dt*1e3:.0f} ms")

for sub_log in (16, 18, 20):
    sub = 1 << sub_log
    db = digits.reshape(W * (N // sub), sub)
    dt = timeit(jax.jit(lambda d: jnp.argsort(d, axis=1).sum()), db, iters=3)
    p(f"argsort batched ({W * (N // sub)}, 2^{sub_log}): {dt*1e3:.0f} ms")

# sort_key_val alternative
iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (W, N))


@jax.jit
def skv(d, i):
    sd, si = jax.lax.sort_key_val(d, i, dimension=1)
    return sd.sum() + si.sum()


dt = timeit(skv, digits, iota, iters=3)
p(f"sort_key_val (W, 2^22): {dt*1e3:.0f} ms")

# ---- 2. einsum select+transpose --------------------------------------------
M = 720896
G = M // 128
rows = jnp.asarray(
    rng.integers(0, 1 << 16, (M, 128), dtype=np.int64).astype(np.uint32))
lsel = jnp.asarray(rng.integers(0, 4, (M,), dtype=np.int64).astype(np.int32))
eye = jnp.eye(128, dtype=jnp.float32)


@jax.jit
def extract_einsum(rows, lsel):
    r3 = rows.reshape(G, 128, 128)
    ls = lsel.reshape(G, 128, 1)
    sel = jnp.zeros((G, 128, 32), jnp.uint32)
    for l in range(4):
        sel = jnp.where(ls == l, r3[:, :, 32 * l:32 * l + 32], sel)
    t = jnp.einsum("gpw,pq->gwq", sel.astype(jnp.float32), eye,
                   precision=jax.lax.Precision.HIGHEST)
    return t.astype(jnp.uint32)


out = np.asarray(extract_einsum(rows, lsel))
# verify vs numpy
r_np = np.asarray(rows).reshape(G, 128, 128)
l_np = np.asarray(lsel).reshape(G, 128)
want = np.zeros((G, 32, 128), dtype=np.uint32)
for g in range(2):
    for pt in range(128):
        l = l_np[g, pt]
        want[g, :, pt] = r_np[g, pt, 32 * l:32 * l + 32]
ok = (out[:2] == want[:2]).all()
dt = timeit(jax.jit(lambda r, s: extract_einsum(r, s).sum()), rows, lsel,
            iters=5)
p(f"einsum select+transpose (720896 rows): ok={ok} {dt*1e3:.2f} ms")

# ---- 3. packed madd kernel --------------------------------------------------
from fawkes_crypto_tpu.ops.pcurve import (  # noqa: E402
    PCurve,
    _ec_madd_affine_fast_lists,
)

pc = PCurve.get(pf)
k = pf.k
sub = 8


def packed_kernel(s_ref, p_ref, m_ref, o_ref, f_ref):
    s = pc._point_from_ref(s_ref)
    x2 = [p_ref[:, i, :] for i in range(k)]
    y2 = [p_ref[:, k + i, :] for i in range(k)]
    x3, y3, z3, need_dbl = _ec_madd_affine_fast_lists(pf, s, x2, y2)
    valid = m_ref[:] > 0
    out = (
        pf.f_select(valid, x3, s[0]),
        pf.f_select(valid, y3, s[1]),
        pf.f_select(valid, z3, s[2]),
    )
    pc._point_to_ref(o_ref, out)
    f_ref[:] = jnp.where(need_dbl & valid, 1, 0).astype(jnp.uint32)


@jax.jit
def packed_madd(state, pts, valid):
    m = state.shape[1]
    sb = min(sub, m)
    spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                        memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((sb, 2 * k, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((sb, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        packed_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(state.shape, state.dtype),
            jax.ShapeDtypeStruct(valid.shape, jnp.uint32),
        ),
        grid=(m // sb,),
        in_specs=[spec, pspec, mspec],
        out_specs=(spec, mspec),
    )(state, pts, valid)


state = jnp.zeros((3 * k, G, 128), dtype=jnp.uint32)
pts_packed = jnp.asarray(
    rng.integers(0, 1 << 16, (G, 2 * k, 128), dtype=np.int64)
    .astype(np.uint32))
vmask = jnp.ones((G, 128), dtype=jnp.uint32)
try:
    dt = timeit(jax.jit(
        lambda s, q, m: sum(x.sum() for x in packed_madd(s, q, m))),
        state, pts_packed, vmask, iters=5)
    p(f"packed madd_affine_fast (720896 lanes): {dt*1e3:.2f} ms")
except Exception as e:
    p(f"packed madd FAILED: {str(e)[:200]}")

# ---- 4. V-aligned idx row fetch --------------------------------------------
V = 8
order = jnp.asarray(
    rng.integers(0, N, (W, N), dtype=np.int64).astype(np.int32))
brow = jnp.asarray(
    rng.integers(0, N // V, (W, 4096, 1), dtype=np.int64).astype(np.int32))


@jax.jit
def idx_rows(order, brow):
    o3 = order.reshape(W, N // V, V)
    return jnp.take_along_axis(o3, brow, axis=1).sum()


dt = timeit(idx_rows, order, brow, iters=5)
nv = W * 4096 * V
p(f"V-aligned idx fetch ({W}x4096 rows of {V}): {dt*1e3:.2f} ms "
  f"({dt/nv*1e9:.1f} ns/val)")

posel = jnp.asarray(
    rng.integers(0, N, (4096 * V, W), dtype=np.int64).astype(np.int32))


@jax.jit
def idx_elems(order, pos):
    return jnp.take_along_axis(order.T, pos, axis=0).sum()


dt = timeit(idx_elems, order, posel, iters=5)
p(f"per-element idx fetch ({4096*V}x{W}): {dt*1e3:.2f} ms "
  f"({dt/nv*1e9:.1f} ns/val)")
