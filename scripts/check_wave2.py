"""Correctness + throughput of MSMWave2 vs host oracle on the real chip.

Usage: python scripts/check_wave2.py [logn] [c] [v]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ff.limbs import limbs_to_ints
from fawkes_crypto_tpu.native import cext
from fawkes_crypto_tpu.native.bn_pairing import G1_GEN, g_mul
from fawkes_crypto_tpu.ops.msm_wave import MSMWave, encode_points_affine_rows
from fawkes_crypto_tpu.ops.msm_wave2 import MSMWave2
from fawkes_crypto_tpu.ops.tablegen import gen_distinct_rows, random_scalar_limbs

fctx = FieldCtx.get(Fq)


def main(logn=18, c=12, v=8):
    n = 1 << logn
    print(f"n=2^{logn} c={c} v={v}", flush=True)
    t0 = time.perf_counter()
    table = gen_distinct_rows(fctx, n, chunk=min(n, 1 << 22))
    np.asarray(table)
    print(f"tablegen {time.perf_counter()-t0:.1f}s", flush=True)
    scalars = random_scalar_limbs(n, fctx.k, seed=7)

    ctx2 = MSMWave2(fctx, n, c=c, v=v)
    t0 = time.perf_counter()
    r2 = ctx2.msm(table, scalars)
    print(f"wave2 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    r2 = ctx2.msm(table, scalars)
    dt2 = time.perf_counter() - t0
    print(f"wave2 warm: {dt2*1e3:.0f} ms = {n/dt2/1e3:.0f} k pts/s",
          flush=True)

    # oracle: C++ host MSM on a subsample is impossible (full MSM needed);
    # compare against MSMWave (validated in round 2) instead.
    ctx1 = MSMWave(fctx, n, c=12, v=8)
    t0 = time.perf_counter()
    r1 = ctx1.msm(table, scalars)
    print(f"wave1 compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    r1 = ctx1.msm(table, scalars)
    dt1 = time.perf_counter() - t0
    print(f"wave1 warm: {dt1*1e3:.0f} ms = {n/dt1/1e3:.0f} k pts/s",
          flush=True)
    print(f"MATCH: {r1 == r2}  speedup {dt1/dt2:.2f}x", flush=True)
    if r1 != r2:
        print(f"wave1={r1}\nwave2={r2}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
