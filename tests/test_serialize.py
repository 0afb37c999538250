"""Wire-format round trips for Proof/VK/Parameters
(reference Parameters::write/read, backend/bellman_groth16/mod.rs:150-177,
and the borsh Proof/VK formats, prover.rs:38-60 / verifier.rs:45-73)."""

import random

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.serialize import (
    proof_from_bytes,
    proof_to_bytes,
    read_parameters,
    vk_from_bytes,
    vk_to_bytes,
    write_parameters,
)
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.hostfield import Num

rng = random.Random(23)


def _tiny_setup():
    def circuit(pub, sec):
        # (sec + 1) * sec == pub
        ((sec + 1) * sec).assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        return CNum.alloc(cs, v)

    return circuit, alloc_pub, alloc_sec


def test_proof_vk_parameters_roundtrip(tmp_path):
    circuit, alloc_pub, alloc_sec = _tiny_setup()
    params = setup(circuit, alloc_pub, alloc_sec, seed=b"ser")

    sec = Num(Fr, rng.randrange(Fr.p))
    pub = (sec + 1) * sec
    inputs, proof = prove(params, pub, sec, circuit, alloc_pub, alloc_sec,
                          seed=b"s")
    assert verify(params.vk, proof, inputs)

    # proof bytes
    blob = proof_to_bytes(proof)
    assert len(blob) == 8 * 32  # G1 + G2 + G1
    p2 = proof_from_bytes(blob)
    assert (p2.a, p2.b, p2.c) == (proof.a, proof.b, proof.c)
    assert verify(params.vk, p2, inputs)

    # vk bytes
    vk2 = vk_from_bytes(vk_to_bytes(params.vk))
    assert verify(vk2, proof, inputs)

    # full parameters file
    path = str(tmp_path / "params.npz")
    write_parameters(path, params)
    params2 = read_parameters(path)
    assert params2.r1cs.num_constraints == params.r1cs.num_constraints
    assert params2.const_tracker == params.const_tracker
    # prove with reloaded parameters, verify with reloaded VK
    inputs2, proof2 = prove(params2, pub, sec, circuit, alloc_pub,
                            alloc_sec, seed=b"s")
    assert verify(params2.vk, proof2, inputs2)
    # deterministic seed -> identical proof across save/load
    assert (proof2.a, proof2.b, proof2.c) == (proof.a, proof.b, proof.c)
