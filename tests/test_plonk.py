"""PLONK backend end-to-end: setup -> prove -> verify.

The merkle test is the analog of the reference's heavy PLONK test
(/root/reference/fawkes-crypto/tests/plonk.rs:19-49: depth-32 poseidon
Merkle root circuit over KZG k=20); depth 32 runs under
FAWKES_HEAVY_TESTS, depth 4 keeps CI fast (same pattern as the Groth16
e2e tests). The shared gadget sources compile against the PLONK CS via
the signal-class dispatch (circuit/num.py), mirroring the reference's
cfg-gated module swap.
"""

import copy
import random

from conftest import heavy_test

from fawkes_crypto_tpu.backend.plonk import Parameters, prove, setup, verify
from fawkes_crypto_tpu.circuit.plonk import BuildCS, CNum
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

rng = random.Random(23)


def rand_fr():
    return Num(Fr, rng.randrange(Fr.p))


def test_plonk_poseidon():
    pp = PoseidonParams.new(Fr, 4, 8, 54)

    def circuit(pub, sec):
        res = c_poseidon(list(sec), pp)
        res.assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return tuple(CNum.alloc(cs, None) for _ in range(3))
        return tuple(CNum.alloc(cs, x) for x in v)

    params = Parameters.setup(11, seed=b"srs")
    pk = setup(params, circuit, alloc_pub, alloc_sec)

    data = [rand_fr() for _ in range(3)]
    h = poseidon(data, pp)
    inputs, proof = prove(params, pk, h, data, circuit, alloc_pub,
                          alloc_sec, seed=b"p")
    assert inputs == [h.x]
    assert verify(pk.vk, proof, inputs)

    # wrong public input
    assert not verify(pk.vk, proof, [(h + 1).x])
    # tampered evaluation
    bad = copy.deepcopy(proof)
    bad.a_bar = (bad.a_bar + 1) % Fr.p
    assert not verify(pk.vk, bad, inputs)
    # tampered commitment
    bad2 = copy.deepcopy(proof)
    bad2.z = proof.a
    assert not verify(pk.vk, bad2, inputs)
    # deterministic with the same seed
    _, proof2 = prove(params, pk, h, data, circuit, alloc_pub,
                      alloc_sec, seed=b"p")
    assert proof2 == proof


def _merkle_plonk(depth: int, k: int):
    pp = PoseidonParams.new(Fr, 3, 8, 53)

    def circuit(pub, sec):
        leaf, cproof = sec
        res = c_poseidon_merkle_proof_root(leaf, cproof, pp)
        res.assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return (CNum.alloc(cs, None),
                    CMerkleProof.alloc(cs, None, length=depth))
        leaf, proof = v
        return (CNum.alloc(cs, leaf), CMerkleProof.alloc(cs, proof))

    params = Parameters.setup(k, seed=b"srs2")
    pk = setup(params, circuit, alloc_pub, alloc_sec)

    leaf = rand_fr()
    proof_n = MerkleProof(
        [rand_fr() for _ in range(depth)],
        [bool(rng.randrange(2)) for _ in range(depth)],
    )
    root = poseidon_merkle_proof_root(leaf, proof_n, pp)
    inputs, snark = prove(params, pk, root, (leaf, proof_n), circuit,
                          alloc_pub, alloc_sec, seed=b"m")
    assert verify(pk.vk, snark, inputs)
    assert not verify(pk.vk, snark, [(root + 1).x])


def test_plonk_merkle_4():
    _merkle_plonk(4, 13)


@heavy_test
def test_plonk_merkle_32():
    # reference tests/plonk.rs:19-49 (k=20 there; our row layout fits
    # the depth-32 circuit in 2^16)
    _merkle_plonk(32, 16)


def test_plonk_device_path_matches_host():
    """FAWKES_PLONK_DEVICE=1 routes rounds 1-3 through the device
    pipeline (backend/plonk/device.py); same seed => byte-identical
    proof vs the host-oracle path."""
    import os

    pp = PoseidonParams.new(Fr, 4, 8, 54)

    def circuit(pub, sec):
        res = c_poseidon(list(sec), pp)
        res.assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return tuple(CNum.alloc(cs, None) for _ in range(3))
        return tuple(CNum.alloc(cs, x) for x in v)

    params = Parameters.setup(11, seed=b"srs3")
    pk = setup(params, circuit, alloc_pub, alloc_sec)

    data = [rand_fr() for _ in range(3)]
    h = poseidon(data, pp)
    inputs, proof_h = prove(params, pk, h, data, circuit, alloc_pub,
                            alloc_sec, seed=b"d")
    os.environ["FAWKES_PLONK_DEVICE"] = "1"
    try:
        pk.__dict__.pop("_device", None)
        inputs_d, proof_d = prove(params, pk, h, data, circuit,
                                  alloc_pub, alloc_sec, seed=b"d")
    finally:
        os.environ["FAWKES_PLONK_DEVICE"] = "0"
    assert inputs_d == inputs
    assert proof_d == proof_h
    assert verify(pk.vk, proof_d, inputs_d)
