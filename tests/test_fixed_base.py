"""Device fixed-base batch scalar-mul (ops/fixed_base.py) vs the host
oracle — the CRS-generation kernel (reference setup.rs:20 analog)."""

import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.native.bn_pairing import G1_GEN, G2_GEN, g_mul
from fawkes_crypto_tpu.ops.fixed_base import FixedBase
from fawkes_crypto_tpu.ops.msm_wave import decode_points_lf, decode_points_lf_g2
from fawkes_crypto_tpu.ops.tablegen import random_scalar_limbs


def _jac_to_pts(fctx, jac, g2=False):
    k = jac.shape[0] // 3
    flat = jac.reshape(3 * k, -1)
    return (decode_points_lf_g2(fctx, flat) if g2
            else decode_points_lf(fctx, flat))


def test_fixed_base_g1():
    fctx = FieldCtx.get(Fq)
    n = 256
    sc = np.array(random_scalar_limbs(n, fctx.k, bits=32, seed=5))
    sc[0] = 0   # identity case
    fb = FixedBase(fctx, G1_GEN, n, scalar_bits=32, c=8)
    got = _jac_to_pts(fctx, np.asarray(fb.mul_jacobian(sc)))
    rows = np.asarray(fb.mul_affine_rows(sc))
    k = fctx.k
    xs = fctx.decode(np.ascontiguousarray(rows[:, :k]))
    ys = fctx.decode(np.ascontiguousarray(rows[:, k:]))
    for i in range(n):
        s = int(sum(int(v) << (16 * j) for j, v in enumerate(sc[i])))
        want = g_mul(G1_GEN, s) if s else None
        assert got[i] == want, f"jacobian {i}"
        aff = None if (xs[i] == 0 and ys[i] == 0) else (xs[i], ys[i])
        assert aff == want, f"affine {i}"


def test_fixed_base_g2():
    fctx = FieldCtx.get(Fq)
    n = 128
    sc = np.array(random_scalar_limbs(n, fctx.k, bits=24, seed=6))
    sc[0] = 0
    fb = FixedBase(fctx, G2_GEN, n, scalar_bits=24, c=8, g2=True)
    got = _jac_to_pts(fctx, np.asarray(fb.mul_jacobian(sc)), g2=True)
    rows = np.asarray(fb.mul_affine_rows(sc))
    from fawkes_crypto_tpu.native.bn_pairing import Fq2

    k2 = 2 * fctx.k
    for i in range(n):
        s = int(sum(int(v) << (16 * j) for j, v in enumerate(sc[i])))
        want = g_mul(G2_GEN, s) if s else None
        assert got[i] == want, f"jacobian {i}"
        kb = fctx.k
        comps = [fctx.decode(np.ascontiguousarray(
            rows[i:i + 1, j * kb:(j + 1) * kb]))[0] for j in range(4)]
        aff = (None if all(c == 0 for c in comps)
               else (Fq2(comps[0], comps[1]), Fq2(comps[2], comps[3])))
        assert aff == want, f"affine {i}"
