"""End-to-end Groth16: setup -> prove -> verify on real circuits.

The poseidon circuit is the reference's minimum end-to-end slice
(SURVEY.md §7 step 5); the depth-8 Merkle circuit mirrors the reference's
heavy test (fawkes-crypto/tests/bellman_groth16.rs:18-47, depth 32 there —
full depth exercised in the bench, 8 keeps CI fast).
"""

import random

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.poseidon import (
    CMerkleProof,
    c_poseidon,
    c_poseidon_merkle_proof_root,
)
from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.poseidon import (
    MerkleProof,
    PoseidonParams,
    poseidon,
    poseidon_merkle_proof_root,
)

rng = random.Random(11)


def rand_fr():
    return Num(Fr, rng.randrange(Fr.p))


def test_groth16_poseidon():
    poseidon_params = PoseidonParams.new(Fr, 4, 8, 54)

    def circuit(pub, sec):
        res = c_poseidon(list(sec), poseidon_params)
        res.assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return tuple(CNum.alloc(cs, None) for _ in range(3))
        return tuple(CNum.alloc(cs, x) for x in v)

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"test")
    # 255 poseidon + 1 inputize + 1 assert_eq gates, + 2 input dummy rows
    assert params.r1cs.num_constraints == 259

    data = [rand_fr() for _ in range(3)]
    h = poseidon(data, poseidon_params)
    inputs, proof = prove(
        params, h, data, circuit, alloc_pub, alloc_sec, seed=b"p"
    )
    assert inputs == [h.x]
    assert verify(params.vk, proof, inputs)
    # wrong input fails
    assert not verify(params.vk, proof, [(h + 1).x])
    # tampered proof fails
    from fawkes_crypto_tpu.backend.groth16.params import Proof
    from fawkes_crypto_tpu.native.bn_pairing import g_double

    bad = Proof(a=g_double(proof.a), b=proof.b, c=proof.c)
    assert not verify(params.vk, bad, inputs)


def test_groth16_merkle_depth8():
    DEPTH = 8
    poseidon_params = PoseidonParams.new(Fr, 3, 8, 53)

    def circuit(pub, sec):
        leaf, proof = sec
        res = c_poseidon_merkle_proof_root(leaf, proof, poseidon_params)
        res.assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return (CNum.alloc(cs, None),
                    CMerkleProof.alloc(cs, None, length=DEPTH))
        leaf, proof = v
        return (CNum.alloc(cs, leaf), CMerkleProof.alloc(cs, proof))

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"test2")

    leaf = rand_fr()
    mp = MerkleProof(
        sibling=[rand_fr() for _ in range(DEPTH)],
        path=[rng.random() < 0.5 for _ in range(DEPTH)],
    )
    root = poseidon_merkle_proof_root(leaf, mp, poseidon_params)
    inputs, proof = prove(
        params, root, (leaf, mp), circuit, alloc_pub, alloc_sec, seed=b"q"
    )
    assert inputs == [root.x]
    assert verify(params.vk, proof, inputs)
    assert not verify(params.vk, proof, [(root + 1).x])
