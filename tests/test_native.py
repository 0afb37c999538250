"""Native layer: jubjub curve laws, poseidon params/hash, eddsa roundtrip."""

import random

from fawkes_crypto_tpu.engines.bn256 import Fr, Fs, jubjub_bn256
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.ecc import EdwardsPoint, EdwardsPointEx
from fawkes_crypto_tpu.native.eddsaposeidon import (
    eddsaposeidon_sign,
    eddsaposeidon_verify,
)
from fawkes_crypto_tpu.native.poseidon import (
    MerkleProof,
    PoseidonParams,
    poseidon,
    poseidon_merkle_proof_root,
    poseidon_merkle_tree_root,
    poseidon_sponge,
)

rng = random.Random(42)


def rand_fr():
    return Num(Fr, rng.randrange(Fr.p))


def rand_fs():
    return Num(Fs, rng.randrange(Fs.p))


def test_jubjub_generator_on_curve_in_subgroup():
    params = jubjub_bn256()
    g = params.edwards_g
    assert g.is_in_curve(params)
    assert g.into_extended().is_in_subgroup(params)
    assert not g.is_zero()


def test_edwards_group_laws():
    params = jubjub_bn256()
    g = params.edwards_g
    a, b = rand_fs(), rand_fs()
    ga = g.mul(a, params)
    gb = g.mul(b, params)
    # commutativity / homomorphism
    assert ga.add(gb, params) == gb.add(ga, params)
    assert g.mul(a + b, params) == ga.add(gb, params)
    # double == add self
    assert ga.double() == ga.add(ga, params)
    # order
    assert g.mul(Num(Fs, 0), params).is_zero()
    assert g.into_extended().mul(Fs.p, params).is_zero()


def test_montgomery_edwards_roundtrip():
    params = jubjub_bn256()
    p = params.edwards_g.mul(rand_fs(), params)
    m = p.into_montgomery()
    assert m.into_edwards() == p
    # montgomery curve equation: B*y^2 = x^3 + A*x^2 + x
    lhs = params.montgomery_b * m.y.square()
    rhs = m.x.square() * (m.x + params.montgomery_a) + m.x
    assert lhs == rhs


def test_subgroup_decompress():
    params = jubjub_bn256()
    p = params.edwards_g.mul(rand_fs(), params)
    q = EdwardsPoint.subgroup_decompress(p.x, params)
    assert q is not None and q == p


def test_from_scalar_in_subgroup():
    params = jubjub_bn256()
    for _ in range(4):
        p = EdwardsPoint.from_scalar(rand_fr(), params)
        assert p.is_in_curve(params)
        assert p.into_extended().is_in_subgroup(params)


def test_poseidon_params_shape():
    params = PoseidonParams.new(Fr, 4, 8, 54)
    assert len(params.c) == 62 and all(len(row) == 4 for row in params.c)
    assert len(params.m) == 4 and all(len(row) == 4 for row in params.m)
    # deterministic
    params2 = PoseidonParams.new(Fr, 4, 8, 54)
    assert params.c[0][0] == params2.c[0][0]
    assert params.m[3][3] == params2.m[3][3]
    # distinct constants
    assert params.c[0][0] != params.c[0][1]


def test_poseidon_hash_and_sponge():
    params = PoseidonParams.new(Fr, 4, 8, 54)
    xs = [rand_fr() for _ in range(3)]
    h1 = poseidon(xs, params)
    assert h1 == poseidon(list(xs), params)
    assert h1 != poseidon([xs[1], xs[0], xs[2]], params)
    s = poseidon_sponge(xs, params)
    assert s != h1


def test_poseidon_merkle():
    params = PoseidonParams.new(Fr, 3, 8, 53)
    depth = 8
    leaf = rand_fr()
    sibling = [rand_fr() for _ in range(depth)]
    path = [rng.random() < 0.5 for _ in range(depth)]
    root = poseidon_merkle_proof_root(leaf, MerkleProof(sibling, path), params)
    # cross-check against tree root for a 2-leaf tree
    l0, l1 = rand_fr(), rand_fr()
    assert poseidon_merkle_tree_root([l0, l1], params) == poseidon([l0, l1], params)
    assert root != leaf


def test_eddsa_roundtrip():
    params = jubjub_bn256()
    poseidon_params = PoseidonParams.new(Fr, 4, 8, 54)
    sk = rand_fs()
    m = rand_fr()
    s, r = eddsaposeidon_sign(sk, m, poseidon_params, params)
    a_x = params.edwards_g.mul(sk, params).x
    assert eddsaposeidon_verify(s, r, a_x, m, poseidon_params, params)
    # tampered message fails
    assert not eddsaposeidon_verify(s, r, a_x, m + 1, poseidon_params, params)
