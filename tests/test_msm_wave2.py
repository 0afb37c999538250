"""MSMWave2 (packed-gather limbs-first wave Pippenger) vs the host
oracle, in Pallas interpret mode on the CPU mesh — the differential-test
pattern of SURVEY.md §4.2 for the bench/prover hot kernel
(ops/msm_wave2.py; chip timings in scripts/scan_wave2lf.py)."""

import numpy as np
import pytest
from conftest import heavy_test

# Interpret-mode lowering of the wave kernels on XLA-CPU takes tens of
# GB / tens of minutes on the 2-CPU CI box (same pathology as
# test_lntt_pallas_threshold), so the whole module is heavy-gated; the
# real-TPU path is chip-validated by scripts/scan_wave2lf.py (G1, vs
# wave1 + independent configs), scripts/exp_g2wave2.py (G2, vs the host
# Pippenger) and the /verify drive (prove_many batch vs single proofs).
pytestmark = heavy_test

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.native.bn_pairing import (
    G1_GEN,
    G2_GEN,
    g_add,
    g_mul,
)
from fawkes_crypto_tpu.ops.msm_wave import (
    encode_points_affine_rows,
    encode_points_affine_rows_g2,
)
from fawkes_crypto_tpu.ops.msm_wave2 import MSMWave2
from fawkes_crypto_tpu.ops.tablegen import random_scalar_limbs


@pytest.fixture(scope="module")
def fctx():
    return FieldCtx.get(Fq)


def _scalars_ints(limbs, k):
    arr = np.asarray(limbs)
    out = []
    for i in range(arr.shape[0]):
        v = 0
        for j in range(k):
            v |= int(arr[i, j]) << (16 * j)
        out.append(v)
    return out


def test_wave2_lf_g1_vs_host(fctx):
    n = 512
    pts, acc = [], G1_GEN
    step = g_mul(G1_GEN, 0xBEEF)
    for _ in range(n):
        pts.append(acc)
        acc = g_add(acc, step)
    rows = encode_points_affine_rows(fctx, pts)
    sc = random_scalar_limbs(n, fctx.k, seed=5)
    ctx = MSMWave2(fctx, n, c=8, v=2, lf=True)
    got = ctx.msm(rows, sc)

    ints = _scalars_ints(sc, fctx.k)
    want = None
    for p, s in zip(pts, ints):
        want = g_add(want, g_mul(p, s))
    assert got == want


def test_wave2_g2_vs_host(fctx):
    n = 128
    pts, acc = [], G2_GEN
    step = g_mul(G2_GEN, 0xF00D)
    for _ in range(n):
        pts.append(acc)
        acc = g_add(acc, step)
    rows = encode_points_affine_rows_g2(fctx, pts)
    sc = random_scalar_limbs(n, fctx.k, seed=6)
    ctx = MSMWave2(fctx, n, c=8, v=2, g2=True, lf=True)
    got = ctx.msm(rows, sc)

    ints = _scalars_ints(sc, fctx.k)
    want = None
    for p, s in zip(pts, ints):
        want = g_add(want, g_mul(p, s))
    assert got == want


def test_wave2_batch_vs_host(fctx):
    """Batched schedule: B proofs' scalars over one shared table in one
    wave accumulation (the prove_many dp path)."""
    n, B = 256, 2
    pts, acc = [], G1_GEN
    step = g_mul(G1_GEN, 0xACE)
    for _ in range(n):
        pts.append(acc)
        acc = g_add(acc, step)
    rows = encode_points_affine_rows(fctx, pts)
    import jax.numpy as jnp

    sc = jnp.stack([random_scalar_limbs(n, fctx.k, seed=10 + i)
                    for i in range(B)])
    ctx = MSMWave2(fctx, n, c=8, v=2, lf=True, batch=B)
    got = ctx.msm_batch(rows, sc)
    assert len(got) == B

    for i in range(B):
        ints = _scalars_ints(sc[i], fctx.k)
        want = None
        for pt, s in zip(pts, ints):
            want = g_add(want, g_mul(pt, s))
        assert got[i] == want
