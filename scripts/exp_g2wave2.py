"""Chip validation of the G2 packed-gather wave MSM (MSMWave2 g2=True):
correctness vs the chip-validated wave1 G2 path AND the C++ host
Pippenger, plus warm timings. Usage: python scripts/exp_g2wave2.py [logn]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.native import cext
from fawkes_crypto_tpu.native.bn_pairing import G2_GEN, g_add
from fawkes_crypto_tpu.ops.msm_wave import (
    MSMWave,
    encode_points_affine_rows_g2,
)
from fawkes_crypto_tpu.ops.msm_wave2 import MSMWave2
from fawkes_crypto_tpu.ops.tablegen import random_scalar_limbs

fctx = FieldCtx.get(Fq)


def main(logn=16):
    n = 1 << logn
    t0 = time.perf_counter()
    pts = []
    acc = G2_GEN
    step = cext.g2_mul(G2_GEN, 0xDEADBEEF) if cext.available() else G2_GEN
    for _ in range(n):
        pts.append(acc)
        acc = g_add(acc, step)
    print(f"n=2^{logn} host G2 chain {time.perf_counter()-t0:.1f}s",
          flush=True)
    rows = encode_points_affine_rows_g2(fctx, pts)
    sc_limbs = random_scalar_limbs(n, fctx.k, seed=3)
    # host ground truth
    sc_ints = []
    arr = np.asarray(sc_limbs)
    for i in range(n):
        v = 0
        for j in range(fctx.k):
            v |= int(arr[i, j]) << (16 * j)
        sc_ints.append(v)
    t0 = time.perf_counter()
    want = cext.g2_msm(pts, sc_ints) if cext.available() else None
    print(f"host g2_msm {time.perf_counter()-t0:.1f}s", flush=True)

    for name, ctx in (
        ("wave2-lf g2", MSMWave2(fctx, n, c=12, v=8, g2=True, lf=True)),
        ("wave1 g2", MSMWave(fctx, n, c=12, v=8, g2=True)),
    ):
        t0 = time.perf_counter()
        r = ctx.msm(rows, sc_limbs)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = ctx.msm(rows, sc_limbs)
        dt = time.perf_counter() - t0
        ok = (want is None) or (r == want)
        print(f"{name}: warm {dt*1e3:.0f} ms = {n/dt/1e3:.0f} k pts/s  "
              f"compile+run {tc:.0f}s  match_host={ok}", flush=True)
        assert ok


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
