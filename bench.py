"""Headline benchmark: BN254 G1 Pippenger MSM throughput on one TPU chip
at 2^25 DISTINCT points — the primary metric of BASELINE.json/BASELINE.md
— using the Pallas wave MSM with chunked (streamed-CRS) scheduling.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The point table is 2^25 genuinely distinct affine points generated on
device (ops/tablegen.py: pairwise sums of two disjoint generator chains
+ batched Fermat inversion); scalars are uniform 254-bit. vs_baseline is
computed against the reference stack's CPU prover: the ZeroPool rollup
(35,695,616 constraints) proves in 628 s on an i9-9900K
(/root/reference/README.md:54-56) via bellman_ce, whose MSM stage handles
~6x 2^25 G1-equivalent points in roughly 60% of that wall-clock =>
~5.7e5 points/s/CPU. BASELINE.md's north star is the full rollup in
<60 s on a v5p-16.

Env knobs: FAWKES_BENCH_LOGN (default 25), FAWKES_BENCH_CHUNK_LOG (22).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_MSM_PPS = 5.7e5  # est. bellman_ce G1 MSM points/s on i9-9900K


def main():
    import fawkes_crypto_tpu

    fawkes_crypto_tpu.enable_compile_cache()

    from fawkes_crypto_tpu.engines.bn256 import Fq
    from fawkes_crypto_tpu.ff.jfield import FieldCtx
    from fawkes_crypto_tpu.ops.msm_wave import MSMWave
    from fawkes_crypto_tpu.ops.tablegen import (
        gen_distinct_rows,
        random_scalar_limbs,
    )

    fctx = FieldCtx.get(Fq)
    logn = int(os.environ.get("FAWKES_BENCH_LOGN", "25"))
    chunk_log = min(int(os.environ.get("FAWKES_BENCH_CHUNK_LOG", "22")),
                    logn)
    n = 1 << logn
    chunk = 1 << chunk_log

    t0 = time.perf_counter()
    table = gen_distinct_rows(fctx, n, chunk=chunk)
    table.block_until_ready()
    t_gen = time.perf_counter() - t0
    scalars = random_scalar_limbs(n, fctx.k, seed=42)

    ctx = MSMWave(fctx, chunk, c=12, v=8)

    # compile + warm (first chunk compiles the whole pipeline)
    ctx.msm_chunked(table[:chunk], scalars[:chunk])

    t0 = time.perf_counter()
    res = ctx.msm_chunked(table, scalars)
    dt = time.perf_counter() - t0
    assert res is not None

    value = n / dt
    print(json.dumps({
        "metric": f"msm_g1_points_per_sec_2e{logn}_distinct",
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / BASELINE_MSM_PPS, 3),
    }))
    # diagnostics on stderr-adjacent line? keep stdout to the one line.
    import sys

    print(f"[bench] n=2^{logn} gen={t_gen:.1f}s msm={dt:.1f}s "
          f"chunk=2^{chunk_log}", file=sys.stderr)


if __name__ == "__main__":
    main()
