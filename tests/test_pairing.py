"""BN254 pairing: group laws, bilinearity, non-degeneracy, Frobenius."""

import random

import pytest

from fawkes_crypto_tpu.native.bn_pairing import (
    ATE_LOOP_COUNT,
    B_G2,
    BN_X,
    G1_GEN,
    G2_GEN,
    P,
    R_ORDER,
    Fq2,
    Fq6,
    Fq12,
    final_exponentiation,
    g1_is_on_curve,
    g2_is_in_subgroup,
    g2_is_on_curve,
    g_add,
    g_double,
    g_mul,
    g_neg,
    miller_loop,
    multi_pairing,
    pairing,
)

rng = random.Random(5)


def test_bn_parameters():
    x = BN_X
    assert P == 36 * x**4 + 36 * x**3 + 24 * x**2 + 6 * x + 1
    assert R_ORDER == 36 * x**4 + 36 * x**3 + 18 * x**2 + 6 * x + 1
    assert ATE_LOOP_COUNT == 6 * x + 2


def test_generators_on_curve():
    assert g1_is_on_curve(G1_GEN)
    assert g2_is_on_curve(G2_GEN)
    assert g2_is_in_subgroup(G2_GEN)
    assert g_mul(G1_GEN, R_ORDER) is None


def test_group_laws_g1():
    a, b = rng.randrange(1, R_ORDER), rng.randrange(1, R_ORDER)
    pa, pb = g_mul(G1_GEN, a), g_mul(G1_GEN, b)
    assert g_add(pa, pb) == g_add(pb, pa)
    assert g_add(pa, pb) == g_mul(G1_GEN, a + b)
    assert g_double(pa) == g_mul(G1_GEN, 2 * a)
    assert g_add(pa, g_neg(pa)) is None


def test_group_laws_g2():
    a = rng.randrange(1, R_ORDER)
    qa = g_mul(G2_GEN, a)
    assert g2_is_on_curve(qa)
    assert g_add(qa, g_neg(qa)) is None
    assert g_add(qa, G2_GEN) == g_mul(G2_GEN, a + 1)


def test_fq12_tower():
    def rand2():
        return Fq2(rng.randrange(P), rng.randrange(P))

    def rand12():
        return Fq12(
            Fq6(rand2(), rand2(), rand2()), Fq6(rand2(), rand2(), rand2())
        )

    a, b = rand12(), rand12()
    assert (a * b) * a.inv() == b
    assert a.square() == a * a
    # frobenius is the p-power map
    e = a.frobenius(1)
    assert e * e.inv() == Fq12.one()
    assert a.frobenius(1).frobenius(1) == a.frobenius(2)
    assert a.pow(P) == a.frobenius(1)


def test_pairing_nondegenerate_and_order():
    e = pairing(G2_GEN, G1_GEN)
    assert not e.is_one()
    assert e.pow(R_ORDER).is_one()


def test_pairing_bilinearity():
    a = rng.randrange(2, 2**64)
    b = rng.randrange(2, 2**64)
    e = pairing(G2_GEN, G1_GEN)
    ea = pairing(G2_GEN, g_mul(G1_GEN, a))
    eb = pairing(g_mul(G2_GEN, b), G1_GEN)
    eab = pairing(g_mul(G2_GEN, b), g_mul(G1_GEN, a))
    assert ea == e.pow(a)
    assert eb == e.pow(b)
    assert eab == e.pow(a * b % R_ORDER)


def test_multi_pairing_cancellation():
    # e(aG1, G2) * e(-aG1, G2) == 1
    a = rng.randrange(2, R_ORDER)
    pa = g_mul(G1_GEN, a)
    out = multi_pairing([(pa, G2_GEN), (g_neg(pa), G2_GEN)])
    assert out.is_one()
