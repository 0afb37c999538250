"""Scan wave2 configs (c, v) at a given n on the real chip; wave1 c=12
baseline once. Usage: python scripts/scan_wave2.py [logn]"""
import sys, time
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
    configs = [("wave1", MSMWave, 12, 8), ("wave2", MSMWave2, 12, 8),
               ("wave2", MSMWave2, 13, 8), ("wave2", MSMWave2, 14, 4),
               ("wave2", MSMWave2, 16, 1)]
    for name, cls, c, v in configs:
        try:
            ctx = cls(fctx, n, c=c, v=v)
            t0 = time.perf_counter()
            r = ctx.msm(table, scalars)
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            r = ctx.msm(table, scalars)
            dt = time.perf_counter() - t0
            ok = (ref is None) or (r == ref)
            if ref is None:
                ref = r
            print(f"{name} c={c} v={v}: warm {dt*1e3:.0f} ms = "
                  f"{n/dt/1e3:.0f} k pts/s  compile+run {tc:.0f}s  match={ok}",
                  flush=True)
        except Exception as e:
            print(f"{name} c={c} v={v}: FAILED {type(e).__name__}: {e}",
                  flush=True)

if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
