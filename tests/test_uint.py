"""NumRepr fixed-width uint semantics vs Python int oracle
(reference ff-uint/tests/ff-uint_tests.rs patterns: overflow flags,
division edge cases, endian IO, string parsing, bit iterators)."""

import random

import pytest

from fawkes_crypto_tpu.ff.uint import U256, U384, NumRepr

rng = random.Random(47)
M256 = (1 << 256) - 1


def test_overflow_flags():
    a = NumRepr(U256, M256)
    one = NumRepr(U256, 1)
    r, f = a.overflowing_add(one)
    assert f and r.x == 0
    r, f = NumRepr(U256, 0).overflowing_sub(one)
    assert f and r.x == M256
    r, f = a.overflowing_mul(a)
    assert f and r.x == (M256 * M256) & M256
    assert a.checked_add(one) is None
    assert a.wrapping_add(one).x == 0
    with pytest.raises(AssertionError):
        _ = a + one


def test_div_mod_random():
    for _ in range(50):
        x = rng.randrange(1 << 256)
        y = rng.randrange(1, 1 << rng.randrange(1, 257))
        q, r = NumRepr(U256, x).div_mod(NumRepr(U256, y))
        assert q.x == x // y and r.x == x % y
    assert NumRepr(U256, 5).checked_div(NumRepr(U256, 0)) is None


def test_endian_io_and_parse():
    x = rng.randrange(1 << 256)
    n = NumRepr(U256, x)
    assert NumRepr.from_le_bytes(U256, n.to_le_bytes()) == n
    assert NumRepr.from_be_bytes(U256, n.to_be_bytes()) == n
    assert NumRepr.from_str(U256, str(x)) == n
    assert NumRepr.from_str(U256, hex(x)) == n


def test_bits_and_cast():
    x = (1 << 200) | 1
    n = NumRepr(U256, x)
    assert n.bit(200) and n.bit(0) and not n.bit(100)
    assert n.leading_zeros() == 55
    assert n.trailing_zeros() == 0
    assert NumRepr(U256, 8).trailing_zeros() == 3
    assert list(n.bit_iter_le())[:2] == [True, False]
    wide = n.to_other(U384)
    assert wide is not None and wide.spec is U384 and wide.x == x
    big = NumRepr(U384, 1 << 300)
    assert big.to_other(U256) is None
    assert len(n.limbs_u64()) == 4


def test_shift_and_bitops():
    x = rng.randrange(1 << 256)
    y = rng.randrange(1 << 256)
    a, b = NumRepr(U256, x), NumRepr(U256, y)
    assert (a << 5).x == (x << 5) & M256
    assert (a >> 7).x == x >> 7
    assert (a & b).x == x & y
    assert (a | b).x == x | y
    assert (a ^ b).x == x ^ y
    assert (~a).x == (~x) & M256
