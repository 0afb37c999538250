"""Validate + time MSMWave2(lf=True) vs the point-major wave2 and wave1
at a given n on the real chip. Usage: python scripts/scan_wave2lf.py [logn]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.msm_wave import MSMWave
from fawkes_crypto_tpu.ops.msm_wave2 import MSMWave2
from fawkes_crypto_tpu.ops.tablegen import gen_distinct_rows, random_scalar_limbs

fctx = FieldCtx.get(Fq)


def main(logn=22):
    n = 1 << logn
    t0 = time.perf_counter()
    table = gen_distinct_rows(fctx, n, chunk=min(n, 1 << 22))
    np.asarray(table)
    print(f"n=2^{logn} tablegen {time.perf_counter()-t0:.1f}s", flush=True)
    scalars = random_scalar_limbs(n, fctx.k, seed=7)
    ref = None
    configs = [
        ("wave2-lf", dict(c=12, v=8, lf=True)),
        ("wave2-lf", dict(c=13, v=8, lf=True)),
        ("wave2-lf", dict(c=14, v=8, lf=True)),
        ("wave2-pm", dict(c=12, v=8, lf=False)),
        ("wave1", None),
    ]
    for name, kw in configs:
        try:
            if kw is None:
                ctx = MSMWave(fctx, n, c=12, v=8)
            else:
                ctx = MSMWave2(fctx, n, **kw)
            t0 = time.perf_counter()
            r = ctx.msm(table, scalars)
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            r = ctx.msm(table, scalars)
            dt = time.perf_counter() - t0
            ok = (ref is None) or (r == ref)
            if ref is None:
                ref = r
            print(f"{name} {kw}: warm {dt*1e3:.0f} ms = "
                  f"{n/dt/1e3:.0f} k pts/s  compile+run {tc:.0f}s  "
                  f"match={ok}", flush=True)
        except Exception as e:
            print(f"{name} {kw}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
