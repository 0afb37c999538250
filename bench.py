"""Headline benchmark: BN254 G1 Pippenger MSM throughput on one TPU chip
(the primary metric named in BASELINE.json) using the Pallas wave MSM.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is computed against the reference stack's CPU prover: the
ZeroPool rollup (35,695,616 constraints) proves in 628 s on an i9-9900K
(/root/reference/README.md:54-56) via bellman_ce, whose MSM stage handles
~6x 2^25 G1-equivalent points in roughly 60% of that wall-clock =>
~5.7e5 points/s/CPU. Beating that number per chip is the parity bar;
BASELINE.md's north star is the full rollup in <60 s on a v5p-16.
"""

from __future__ import annotations

import json
import random
import time

import numpy as np

BASELINE_MSM_PPS = 5.7e5  # est. bellman_ce G1 MSM points/s on i9-9900K


def main():
    import fawkes_crypto_tpu

    fawkes_crypto_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from fawkes_crypto_tpu.engines.bn256 import Fq, Fr
    from fawkes_crypto_tpu.ff.jfield import FieldCtx
    from fawkes_crypto_tpu.native.bn_pairing import G1_GEN, g_add, g_double
    from fawkes_crypto_tpu.ops.msm import encode_scalars
    from fawkes_crypto_tpu.ops.msm_wave import (
        MSMWave,
        encode_points_affine_rows,
    )

    fctx = FieldCtx.get(Fq)
    logn = 18
    n = 1 << logn

    # pseudo-random distinct points: doublings of the generator, cycled
    base = []
    p = G1_GEN
    for _ in range(256):
        base.append(p)
        p = g_double(g_add(p, G1_GEN))
    pts = [base[i % 256] for i in range(n)]

    random.seed(42)
    scalars = [random.randrange(Fr.p) for _ in range(n)]

    dev_pts = encode_points_affine_rows(fctx, pts)
    dev_sc = encode_scalars(scalars, n, fctx.k)
    ctx = MSMWave(fctx, n, c=12, v=8)

    # compile + warmup (transfer forces completion; axon dispatch is async)
    out = np.asarray(ctx._window_sums(dev_pts, dev_sc))

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(ctx._window_sums(dev_pts, dev_sc))
    dt = (time.perf_counter() - t0) / iters

    value = n / dt
    print(json.dumps({
        "metric": f"msm_g1_points_per_sec_2e{logn}",
        "value": round(value, 1),
        "unit": "points/s",
        "vs_baseline": round(value / BASELINE_MSM_PPS, 3),
    }))


if __name__ == "__main__":
    main()
