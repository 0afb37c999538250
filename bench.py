"""Headline benchmark: BN254 G1 Pippenger MSM throughput on one TPU chip
at 2^25 DISTINCT points — the primary metric of BASELINE.json/BASELINE.md
— using the packed-gather limbs-first wave MSM (ops/msm_wave2.py) with
chunked (streamed-CRS) scheduling.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
Extra keys: "validated" (the first chunk's result is cross-checked
against the independent wave1 schedule — different windowing, replica
maps and gather path over the same pinned Pallas field kernels) and
"extra" (per-stage wall-clock + an absolute mont-mul-rate estimate so
progress is attributable beyond the soft baseline denominator).

The point table is 2^25 genuinely distinct affine points generated on
device (ops/tablegen.py: pairwise sums of two disjoint generator chains
+ batched Fermat inversion); scalars are uniform 254-bit. vs_baseline is
computed against the reference stack's CPU prover: the ZeroPool rollup
(35,695,616 constraints) proves in 628 s on an i9-9900K
(/root/reference/README.md:54-56) via bellman_ce, whose MSM stage handles
~6x 2^25 G1-equivalent points in roughly 60% of that wall-clock =>
~5.7e5 points/s/CPU. BASELINE.md's north star is the full rollup in
<60 s on a v5p-16.

Env knobs: FAWKES_BENCH_LOGN (default 25), FAWKES_BENCH_CHUNK_LOG (22),
FAWKES_BENCH_VALIDATE (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_MSM_PPS = 5.7e5  # est. bellman_ce G1 MSM points/s on i9-9900K

# mixed-add mul-equivalents per wave lane (madd-2007-bl 6M+4S ~= 10.5M
# at S ~= 0.9M) — used only for the absolute mont-mul-rate estimate
MADD_MULS = 10.5


def main():
    import fawkes_crypto_tpu

    fawkes_crypto_tpu.enable_compile_cache()

    from fawkes_crypto_tpu.engines.bn256 import Fq
    from fawkes_crypto_tpu.ff.jfield import FieldCtx
    from fawkes_crypto_tpu.ops.msm_wave import MSMWave
    from fawkes_crypto_tpu.ops.msm_wave2 import MSMWave2
    from fawkes_crypto_tpu.ops.tablegen import (
        gen_distinct_rows,
        random_scalar_limbs,
    )

    fctx = FieldCtx.get(Fq)
    logn = int(os.environ.get("FAWKES_BENCH_LOGN", "25"))
    chunk_log = min(int(os.environ.get("FAWKES_BENCH_CHUNK_LOG", "22")),
                    logn)
    do_validate = os.environ.get("FAWKES_BENCH_VALIDATE", "1") != "0"
    n = 1 << logn
    chunk = 1 << chunk_log

    t0 = time.perf_counter()
    table = gen_distinct_rows(fctx, n, chunk=chunk)
    table.block_until_ready()
    t_gen = time.perf_counter() - t0
    scalars = random_scalar_limbs(n, fctx.k, seed=42)

    ctx = MSMWave2(fctx, chunk, c=12, v=8)

    # compile + warm (first chunk compiles the whole pipeline)
    t0 = time.perf_counter()
    first = ctx.msm(table[:chunk], scalars[:chunk])
    t_compile = time.perf_counter() - t0

    validated = None
    t_val = 0.0
    if do_validate:
        # independent schedule cross-check (wave1: row-gather layout,
        # different replica/window maps) on the first chunk
        t0 = time.perf_counter()
        ctx1 = MSMWave(fctx, chunk, c=12, v=8)
        check = ctx1.msm(table[:chunk], scalars[:chunk])
        t_val = time.perf_counter() - t0
        validated = bool(check == first)

    t0 = time.perf_counter()
    res = ctx.msm_chunked(table, scalars)
    dt = time.perf_counter() - t0
    assert res is not None

    value = n / dt
    # every (point, window) pair is one wave madd lane (+V slack already
    # inside the measured time); absolute device mul-rate estimate
    est_muls = value * ctx.w * MADD_MULS
    print(json.dumps({
        "metric": f"msm_g1_points_per_sec_2e{logn}_distinct",
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / BASELINE_MSM_PPS, 3),
        "validated": validated,
        "extra": {
            "kernel": "wave2-lf c=12 v=8",
            "chunk_log2": chunk_log,
            "tablegen_s": round(t_gen, 1),
            "compile_warm_s": round(t_compile, 1),
            "validate_s": round(t_val, 1),
            "msm_s": round(dt, 2),
            "est_mont_muls_per_s": round(est_muls),
        },
    }))
    print(f"[bench] n=2^{logn} gen={t_gen:.1f}s msm={dt:.1f}s "
          f"chunk=2^{chunk_log} validated={validated}", file=sys.stderr)


if __name__ == "__main__":
    main()
