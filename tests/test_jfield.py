"""TPU limb field vs the host oracle (differential testing per SURVEY.md §4)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fawkes_crypto_tpu.engines.bn256 import Fq, Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx

rng = random.Random(123)
N = 64


@pytest.fixture(scope="module", params=["Fr", "Fq"])
def ctx(request):
    return FieldCtx.get(Fr if request.param == "Fr" else Fq)


def rand_ints(fld, n=N):
    return [rng.randrange(fld.p) for _ in range(n)]


def test_encode_decode_roundtrip(ctx):
    xs = rand_ints(ctx.fld)
    a = ctx.encode(xs)
    assert ctx.decode(a) == xs
    b = ctx.encode(xs, mont=False)
    assert ctx.decode(b, mont=False) == xs


def test_add_sub(ctx):
    xs, ys = rand_ints(ctx.fld), rand_ints(ctx.fld)
    a, b = jnp.asarray(ctx.encode(xs)), jnp.asarray(ctx.encode(ys))
    got = ctx.decode(ctx.jit_add(a, b))
    want = [(x + y) % ctx.fld.p for x, y in zip(xs, ys)]
    assert got == want
    got = ctx.decode(ctx.jit_sub(a, b))
    want = [(x - y) % ctx.fld.p for x, y in zip(xs, ys)]
    assert got == want


def test_add_edge_cases(ctx):
    p = ctx.fld.p
    xs = [0, 1, p - 1, p - 1, p - 2, 0]
    ys = [0, p - 1, p - 1, 1, 1, p - 1]
    a, b = jnp.asarray(ctx.encode(xs)), jnp.asarray(ctx.encode(ys))
    got = ctx.decode(ctx.jit_add(a, b))
    assert got == [(x + y) % p for x, y in zip(xs, ys)]
    got = ctx.decode(ctx.jit_sub(a, b))
    assert got == [(x - y) % p for x, y in zip(xs, ys)]


def test_mont_mul(ctx):
    xs, ys = rand_ints(ctx.fld), rand_ints(ctx.fld)
    a, b = jnp.asarray(ctx.encode(xs)), jnp.asarray(ctx.encode(ys))
    got = ctx.decode(ctx.jit_mul(a, b))
    want = [(x * y) % ctx.fld.p for x, y in zip(xs, ys)]
    assert got == want


def test_mont_mul_edge(ctx):
    p = ctx.fld.p
    xs = [0, 1, p - 1, p - 1, 2]
    ys = [5, p - 1, p - 1, 1, (p - 1) // 2]
    a, b = jnp.asarray(ctx.encode(xs)), jnp.asarray(ctx.encode(ys))
    got = ctx.decode(ctx.jit_mul(a, b))
    assert got == [(x * y) % p for x, y in zip(xs, ys)]


def test_to_from_mont(ctx):
    xs = rand_ints(ctx.fld, 8)
    raw = jnp.asarray(ctx.encode(xs, mont=False))
    m = ctx.to_mont(raw)
    assert ctx.decode(m) == xs
    back = ctx.from_mont(m)
    assert ctx.decode(back, mont=False) == xs


def test_pow_and_inv(ctx):
    xs = rand_ints(ctx.fld, 8)
    a = jnp.asarray(ctx.encode(xs))
    e = rng.randrange(ctx.fld.p)
    got = ctx.decode(ctx.jit_pow(a, ctx.exp_bits(e)))
    assert got == [pow(x, e, ctx.fld.p) for x in xs]
    inv = ctx.decode(ctx.jit_inv(a))
    assert inv == [pow(x, -1, ctx.fld.p) for x in xs]


def test_is_zero_eq_select(ctx):
    xs = [0, 5, 0, 7]
    a = jnp.asarray(ctx.encode(xs))
    assert list(np.asarray(ctx.is_zero(a))) == [True, False, True, False]
    b = jnp.asarray(ctx.encode([0, 5, 1, 8]))
    assert list(np.asarray(ctx.eq(a, b))) == [True, True, False, False]
    cond = jnp.asarray([True, False, True, False])
    sel = ctx.decode(ctx.select(cond, a, b))
    assert sel == [0, 5, 0, 8]
