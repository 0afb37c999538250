"""Pallas Fq2 limb-list helpers (ff/pquad.py) + the G2 EC formulas they
power, against the host Fq2/G2 oracle (native/bn_pairing.py). The f_*
helpers are plain traced jnp, so the CPU mesh exercises the exact code
the TPU kernels compile."""

import random

import jax.numpy as jnp
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ff.pquad import PQuadField
from fawkes_crypto_tpu.native.bn_pairing import Fq2

rng = random.Random(43)


def _to_lists(fctx, vals):
    """Fq2 list -> list of 2K (1, len) arrays: c0 limbs then c1 limbs."""
    enc0 = fctx.encode([v.c0 for v in vals])
    enc1 = fctx.encode([v.c1 for v in vals])
    return ([jnp.asarray(enc0[:, i][None, :]) for i in range(fctx.k)]
            + [jnp.asarray(enc1[:, i][None, :]) for i in range(fctx.k)])


def _from_lists(fctx, lists):
    k = fctx.k
    a0 = np.stack([np.asarray(x)[0] for x in lists[:k]], axis=-1)
    a1 = np.stack([np.asarray(x)[0] for x in lists[k:]], axis=-1)
    return [Fq2(x, y) for x, y in zip(fctx.decode(a0), fctx.decode(a1))]


def _rand_fq2(n):
    out = [Fq2(rng.randrange(Fq.p), rng.randrange(Fq.p)) for _ in range(n)]
    out[0] = Fq2(0, 0)
    out[1] = Fq2(Fq.p - 1, Fq.p - 1)
    return out


def test_pquad_ops_vs_host():
    fctx = FieldCtx.get(Fq)
    pq = PQuadField.get(Fq)
    n = 128
    av, bv = _rand_fq2(n), _rand_fq2(n)
    a, b = _to_lists(fctx, av), _to_lists(fctx, bv)

    assert _from_lists(fctx, pq.f_mul(a, b)) == [
        x * y for x, y in zip(av, bv)]
    assert _from_lists(fctx, pq.f_sqr(a)) == [x.square() for x in av]
    assert _from_lists(fctx, pq.f_add(a, b)) == [
        x + y for x, y in zip(av, bv)]
    assert _from_lists(fctx, pq.f_sub(a, b)) == [
        x - y for x, y in zip(av, bv)]
    assert _from_lists(fctx, pq.f_neg(a)) == [-x for x in av]
    assert _from_lists(fctx, pq.f_double(a)) == [x + x for x in av]
    z = np.asarray(pq.f_is_zero(a))[0]
    assert bool(z[0]) and not bool(z[1])


def test_pquad_g2_madd_vs_host():
    """The unified mixed-add body over PQuadField == host G2 adds,
    including double / inverse / infinity branches."""
    from fawkes_crypto_tpu.native.bn_pairing import (
        G2_GEN, g_add, g_mul, g_neg,
    )
    from fawkes_crypto_tpu.ops.pcurve import _ec_madd_affine_lists

    fctx = FieldCtx.get(Fq)
    pq = PQuadField.get(Fq)
    pts_p = [g_mul(G2_GEN, rng.randrange(1, 1 << 62)) for _ in range(6)]
    pts_q = [g_mul(G2_GEN, rng.randrange(1, 1 << 62)) for _ in range(6)]
    pts_q[2] = pts_p[2]           # doubling case
    pts_q[3] = g_neg(pts_p[3])    # inverse case
    pts_q[4] = None               # q at infinity (all-zero row)
    # slot 5: p at infinity via z = 0

    n = len(pts_p)
    zero = Fq2(0, 0)
    one = Fq2(1, 0)
    px = _to_lists(fctx, [p[0] for p in pts_p])
    py = _to_lists(fctx, [p[1] for p in pts_p])
    pz = _to_lists(fctx, [one if i != 5 else zero for i in range(n)])
    qx = _to_lists(fctx, [(q[0] if q else zero) for q in pts_q])
    qy = _to_lists(fctx, [(q[1] if q else zero) for q in pts_q])

    x3, y3, z3 = _ec_madd_affine_lists(pq, (px, py, pz), qx, qy)
    xs, ys, zs = (_from_lists(fctx, t) for t in (x3, y3, z3))
    for i in range(n):
        p_aff = pts_p[i] if i != 5 else None
        want = g_add(p_aff, pts_q[i])
        if zs[i].is_zero():
            assert want is None, f"slot {i}"
        else:
            zi = zs[i].inv()
            zi2 = zi.square()
            assert (xs[i] * zi2, ys[i] * zi2 * zi) == want, f"slot {i}"
