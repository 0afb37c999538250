"""Experiment: wave MSM throughput at larger N on one chip (scalars
random, points synthetic rows — throughput doesn't depend on values,
correctness is covered by validate_tpu/check_msm)."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax
import numpy as np
import jax.numpy as jnp

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.msm_wave import MSMWave

fctx = FieldCtx.get(Fq)
rng = np.random.default_rng(7)


def bench(logn, c, v, iters=3):
    n = 1 << logn
    rows = jnp.asarray(
        rng.integers(0, 2**16, (n, 2 * fctx.k), dtype=np.uint64)
        .astype(np.uint32))
    sc = np.zeros((n, fctx.k), dtype=np.uint32)
    sc[:, :] = rng.integers(0, 2**16, (n, fctx.k), dtype=np.uint64)
    sc[:, -1] &= 0x3FFF  # < 2^254
    sc = jnp.asarray(sc)
    ctx = MSMWave(fctx, n, c=c, v=v)
    out = np.asarray(ctx._window_sums(rows, sc))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(ctx._window_sums(rows, sc))
    dt = (time.perf_counter() - t0) / iters
    print(f"2^{logn} c={c} v={v}: {dt*1e3:.0f} ms, {n/dt/1e3:.0f} k pts/s")


for args in [(18, 12, 8), (20, 12, 8), (22, 12, 8), (20, 13, 4),
             (20, 14, 2)]:
    bench(*args)
