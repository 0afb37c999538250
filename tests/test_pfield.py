"""Pallas field helpers vs host oracle.

The f_* helpers are plain traced jnp functions, so on the CPU test mesh we
exercise them directly (no pallas_call); the TPU kernels wrap the same
code. Layout: limbs-first lists of (S, 128) arrays."""

import random

import jax.numpy as jnp
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ff.pfield import PField

rng = random.Random(41)


def _to_lists(fctx, vals):
    """ints -> list of K (1, len) arrays (limbs-first, batch on lanes)."""
    enc = fctx.encode(vals)  # (N, K) mont
    return [jnp.asarray(enc[:, i][None, :]) for i in range(fctx.k)]


def _from_lists(fctx, lists):
    arr = np.stack([np.asarray(x)[0] for x in lists], axis=-1)
    return fctx.decode(arr)


def test_pfield_ops_vs_host():
    fctx = FieldCtx.get(Fq)
    pf = PField.get(Fq)
    n = 128
    av = [rng.randrange(Fq.p) for _ in range(n)]
    bv = [rng.randrange(Fq.p) for _ in range(n)]
    av[0] = 0
    bv[0] = 0
    av[1] = Fq.p - 1
    bv[1] = Fq.p - 1
    a = _to_lists(fctx, av)
    b = _to_lists(fctx, bv)

    assert _from_lists(fctx, pf.f_mul(a, b)) == [
        x * y % Fq.p for x, y in zip(av, bv)
    ]
    assert _from_lists(fctx, pf.f_sqr(a)) == [x * x % Fq.p for x in av]
    assert _from_lists(fctx, pf.f_add(a, b)) == [
        (x + y) % Fq.p for x, y in zip(av, bv)
    ]
    assert _from_lists(fctx, pf.f_sub(a, b)) == [
        (x - y) % Fq.p for x, y in zip(av, bv)
    ]
    assert _from_lists(fctx, pf.f_neg(a)) == [(-x) % Fq.p for x in av]
    assert _from_lists(fctx, pf.f_double(a)) == [2 * x % Fq.p for x in av]


def test_pcurve_lists_vs_host():
    """The EC limb-list formulas (shared by the Pallas kernels) against the
    host curve oracle — run as plain jnp on CPU."""
    from fawkes_crypto_tpu.native.bn_pairing import (
        G1_GEN, g_add, g_double, g_mul, g_neg,
    )
    from fawkes_crypto_tpu.ops.pcurve import (
        _ec_add_lists, _ec_dbl_lists, _ec_madd_affine_lists,
    )

    fctx = FieldCtx.get(Fq)
    pf = PField.get(Fq)
    pts_p = [g_mul(G1_GEN, rng.randrange(1, 1 << 62)) for _ in range(6)]
    pts_q = [g_mul(G1_GEN, rng.randrange(1, 1 << 62)) for _ in range(6)]
    pts_q[2] = pts_p[2]           # doubling case
    pts_q[3] = g_neg(pts_p[3])    # inverse case
    pts_q[4] = None               # q at infinity
    # p at infinity handled via z = 0 below for slot 5

    def enc(vals):
        return _to_lists(fctx, vals)

    n = len(pts_p)
    px = enc([p[0] for p in pts_p])
    py = enc([p[1] for p in pts_p])
    pz = enc([1 if i != 5 else 0 for i in range(n)])
    qx = enc([(q[0] if q else 0) for q in pts_q])
    qy = enc([(q[1] if q else 0) for q in pts_q])

    x3, y3, z3 = _ec_madd_affine_lists(pf, (px, py, pz), qx, qy)
    xs = _from_lists(fctx, x3)
    ys = _from_lists(fctx, y3)
    zs = _from_lists(fctx, z3)
    p_mod = Fq.p
    for i in range(n):
        p_aff = pts_p[i] if i != 5 else None
        want = g_add(p_aff, pts_q[i])
        if zs[i] % p_mod == 0:
            assert want is None, f"slot {i}"
        else:
            zi = pow(zs[i], -1, p_mod)
            got = (xs[i] * zi * zi % p_mod,
                   ys[i] * zi * zi % p_mod * zi % p_mod)
            assert got == want, f"slot {i}"

    # plain double
    dx, dy, dz = _ec_dbl_lists(pf, px, py, pz)
    xs, ys, zs = (_from_lists(fctx, t) for t in (dx, dy, dz))
    for i in range(n):
        want = g_double(pts_p[i]) if i != 5 else None
        if zs[i] % p_mod == 0:
            assert want is None
        else:
            zi = pow(zs[i], -1, p_mod)
            assert (xs[i] * zi * zi % p_mod,
                    ys[i] * zi * zi % p_mod * zi % p_mod) == want


def test_madd_affine_fast_lists():
    """Fast mixed add (no doubling path): correct on all non-doubling
    branches, flags p == q lanes and keeps their state."""
    from fawkes_crypto_tpu.native.bn_pairing import (
        G1_GEN, g_add, g_mul, g_neg,
    )
    from fawkes_crypto_tpu.ops.pcurve import _ec_madd_affine_fast_lists
    import numpy as np

    fctx = FieldCtx.get(Fq)
    pf = PField.get(Fq)
    pts_p = [g_mul(G1_GEN, rng.randrange(1, 1 << 62)) for _ in range(6)]
    pts_q = [g_mul(G1_GEN, rng.randrange(1, 1 << 62)) for _ in range(6)]
    pts_q[2] = pts_p[2]           # p == q -> need_dbl, state kept
    pts_q[3] = g_neg(pts_p[3])    # p == -q -> infinity
    pts_q[4] = None               # q at infinity
    n = len(pts_p)
    px = _to_lists(fctx, [p[0] for p in pts_p])
    py = _to_lists(fctx, [p[1] for p in pts_p])
    pz = _to_lists(fctx, [1 if i != 5 else 0 for i in range(n)])
    qx = _to_lists(fctx, [(q[0] if q else 0) for q in pts_q])
    qy = _to_lists(fctx, [(q[1] if q else 0) for q in pts_q])

    x3, y3, z3, flag = _ec_madd_affine_fast_lists(pf, (px, py, pz), qx, qy)
    xs, ys, zs = (_from_lists(fctx, t) for t in (x3, y3, z3))
    flags = np.asarray(flag)[0]
    p_mod = Fq.p
    for i in range(n):
        if i == 2:
            assert bool(flags[i]), "p == q must flag need_dbl"
            assert (xs[i], ys[i], zs[i] % p_mod) == (
                pts_p[i][0], pts_p[i][1], 1), "state must be kept"
            continue
        assert not bool(flags[i])
        p_aff = pts_p[i] if i != 5 else None
        want = g_add(p_aff, pts_q[i])
        if zs[i] % p_mod == 0:
            assert want is None, f"slot {i}"
        else:
            zi = pow(zs[i], -1, p_mod)
            assert (xs[i] * zi * zi % p_mod,
                    ys[i] * zi * zi % p_mod * zi % p_mod) == want, f"slot {i}"
