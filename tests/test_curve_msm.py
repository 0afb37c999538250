"""Device curve ops + Pippenger MSM vs the host pairing-module oracle
(native/bn_pairing.py), the differential-test pattern of SURVEY.md §4.2."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import heavy_test

from fawkes_crypto_tpu.engines.bn256 import Fq, Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ff.jquad import QuadCtx
from fawkes_crypto_tpu.native.bn_pairing import (
    G1_GEN,
    G2_GEN,
    g_add,
    g_double,
    g_mul,
    g_neg,
)
from fawkes_crypto_tpu.ops.curve import (
    decode_point_g1,
    decode_point_g2,
    ec_add,
    ec_double,
    encode_points_g1,
    encode_points_g2,
)
from fawkes_crypto_tpu.ops.msm import MSMCtx, encode_scalars, pad_msm_size


def host_msm(points, scalars):
    acc = None
    for pt, s in zip(points, scalars):
        acc = g_add(acc, g_mul(pt, s))
    return acc


@pytest.fixture(scope="module")
def fctx():
    return FieldCtx.get(Fq)


@pytest.fixture(scope="module")
def qctx():
    return QuadCtx.get(Fq)


def _g1_points(n, seed=0):
    rng = np.random.default_rng(seed)
    return [g_mul(G1_GEN, int(rng.integers(1, 1 << 62))) for _ in range(n)]


def test_ec_add_double_vs_host(fctx):
    pts = _g1_points(8)
    qts = _g1_points(8, seed=1)
    dev_p = encode_points_g1(fctx, pts)
    dev_q = encode_points_g1(fctx, qts)
    got = jax.jit(lambda a, b: ec_add(fctx, a, b))(dev_p, dev_q)
    for i, (p, q) in enumerate(zip(pts, qts)):
        one = tuple(c[i] for c in got)
        assert decode_point_g1(fctx, one) == g_add(p, q)
    got_d = jax.jit(lambda a: ec_double(fctx, a))(dev_p)
    for i, p in enumerate(pts):
        one = tuple(c[i] for c in got_d)
        assert decode_point_g1(fctx, one) == g_double(p)


def test_ec_add_edge_cases(fctx):
    p = _g1_points(1)[0]
    cases = [
        (p, None, p),              # P + O = P
        (None, p, p),              # O + P = P
        (p, p, g_double(p)),       # P + P -> doubling path
        (p, g_neg(p), None),       # P + (-P) = O
        (None, None, None),        # O + O = O
    ]
    dev_p = encode_points_g1(fctx, [a for a, _, _ in cases])
    dev_q = encode_points_g1(fctx, [b for _, b, _ in cases])
    got = jax.jit(lambda a, b: ec_add(fctx, a, b))(dev_p, dev_q)
    for i, (_, _, want) in enumerate(cases):
        one = tuple(c[i] for c in got)
        assert decode_point_g1(fctx, one) == want


def test_g2_add_double_vs_host(qctx):
    rng = np.random.default_rng(3)
    pts = [g_mul(G2_GEN, int(rng.integers(1, 1 << 62))) for _ in range(4)]
    qts = [g_mul(G2_GEN, int(rng.integers(1, 1 << 62))) for _ in range(4)]
    dev_p = encode_points_g2(qctx, pts)
    dev_q = encode_points_g2(qctx, qts)
    got = jax.jit(lambda a, b: ec_add(qctx, a, b))(dev_p, dev_q)
    for i, (p, q) in enumerate(zip(pts, qts)):
        one = tuple(c[i] for c in got)
        assert decode_point_g2(qctx, one) == g_add(p, q)


def test_msm_g1_vs_host(fctx):
    n = 32
    rng = np.random.default_rng(5)
    pts = _g1_points(n, seed=4)
    scalars = [int(rng.integers(0, 1 << 63)) * int(rng.integers(0, 1 << 63))
               for _ in range(n)]
    scalars[0] = 0          # zero scalar
    scalars[1] = Fr.p - 1   # max scalar
    npad = pad_msm_size(n)
    dev_pts = encode_points_g1(
        fctx, pts + [None] * (npad - n)
    )
    dev_sc = encode_scalars([s % Fr.p for s in scalars], npad, fctx.k)
    ctx = MSMCtx(fctx, npad)
    got = ctx.jit_msm(dev_pts, dev_sc)
    assert decode_point_g1(fctx, got) == host_msm(pts, scalars)


def test_msm_g1_repeated_points(fctx):
    # duplicate points force the doubling path inside bucket accumulation
    n = 16
    p = _g1_points(1, seed=9)[0]
    pts = [p] * n
    scalars = list(range(n))
    dev_pts = encode_points_g1(fctx, pts)
    dev_sc = encode_scalars(scalars, n, fctx.k)
    ctx = MSMCtx(fctx, n)
    got = ctx.jit_msm(dev_pts, dev_sc)
    assert decode_point_g1(fctx, got) == g_mul(p, sum(scalars))


@heavy_test
def test_msm_g2_vs_host(qctx):
    import random

    n = 16
    rng = np.random.default_rng(6)
    random.seed(6)
    pts = [g_mul(G2_GEN, int(rng.integers(1, 1 << 62))) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]
    dev_pts = encode_points_g2(qctx, pts)
    dev_sc = encode_scalars(scalars, n, QuadCtx.get(Fq).k)
    ctx = MSMCtx(qctx, n)
    got = ctx.jit_msm(dev_pts, dev_sc)
    assert decode_point_g2(qctx, got) == host_msm(pts, scalars)
