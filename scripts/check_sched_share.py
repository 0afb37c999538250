"""Chip validation: shared-schedule wave MSM == per-MSM schedules.

The prover's A/B1/B2 MSMs share one scalar vector z; DeviceProver now
sorts once (MSMWave2.schedule) and accumulates three times (msm_sched).
This script validates on the real TPU that msm_sched over a G1 and a G2
table reproduces msm() exactly, and reports the wall-clock split so the
saving is attributable (digit sort was ~229 ms/2^22 chunk, ROADMAP 3).

Usage: python scripts/check_sched_share.py [logn]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.msm_wave2 import MSMWave2
from fawkes_crypto_tpu.ops.tablegen import gen_distinct_rows, random_scalar_limbs


def main(logn=20):
    n = 1 << logn
    fctx = FieldCtx.get(Fq)
    table = gen_distinct_rows(fctx, n, chunk=n)
    table.block_until_ready()
    scalars = random_scalar_limbs(n, fctx.k, seed=7)
    # a second "query" table: same points rolled by one (cheap distinct)
    import jax.numpy as jnp

    table2 = jnp.roll(table, 1, axis=0)

    ctx = MSMWave2(fctx, n, c=12, v=8)
    # baseline: two full msm() calls (two sorts)
    a0 = ctx.msm(table, scalars)
    b0 = ctx.msm(table2, scalars)
    t0 = time.perf_counter()
    a0 = ctx.msm(table, scalars)
    b0 = ctx.msm(table2, scalars)
    t_two = time.perf_counter() - t0

    # shared schedule: one sort, two accumulations
    sched = jax.block_until_ready(ctx.schedule(scalars))
    a1 = ctx.msm_sched(table, sched)
    b1 = ctx.msm_sched(table2, sched)
    t0 = time.perf_counter()
    sched = jax.block_until_ready(ctx.schedule(scalars))
    t_sched = time.perf_counter() - t0
    t0 = time.perf_counter()
    a1 = ctx.msm_sched(table, sched)
    b1 = ctx.msm_sched(table2, sched)
    t_acc = time.perf_counter() - t0

    assert a1 == a0, "shared-schedule MSM differs (table 1)"
    assert b1 == b0, "shared-schedule MSM differs (table 2)"
    print(f"n=2^{logn}: two msm() = {t_two:.3f}s ; "
          f"sched {t_sched:.3f}s + 2 acc {t_acc:.3f}s "
          f"=> saving {t_two - (t_sched + t_acc):.3f}s  MATCH")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
