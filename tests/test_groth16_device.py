"""Groth16 with the full TPU pipeline (device SpMV + NTT + MSMs) — the
device analog of tests/test_groth16_e2e.py; proofs from the host and
device paths must both verify under the same VK."""

import random

from conftest import heavy_test

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.poseidon import c_poseidon
from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.poseidon import PoseidonParams, poseidon

rng = random.Random(13)


@heavy_test
def test_groth16_poseidon_device_msm():
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

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"devtest")
    data = [Num(Fr, rng.randrange(Fr.p)) for _ in range(3)]
    h = poseidon(data, poseidon_params)
    inputs, proof = prove(
        params, h, data, circuit, alloc_pub, alloc_sec, seed=b"p",
        device_msm=True,
    )
    assert inputs == [h.x]
    assert verify(params.vk, proof, inputs)
    assert not verify(params.vk, proof, [(h + 1).x])

    # determinism: same seed -> identical proof bytes on both paths' RNG
    inputs2, proof2 = prove(
        params, h, data, circuit, alloc_pub, alloc_sec, seed=b"p",
        device_msm=True,
    )
    assert (proof2.a, proof2.b, proof2.c) == (proof.a, proof.b, proof.c)

    # host path with the same seed produces the identical proof
    inputs3, proof3 = prove(
        params, h, data, circuit, alloc_pub, alloc_sec, seed=b"p",
        device_msm=False,
    )
    assert (proof3.a, proof3.b, proof3.c) == (proof.a, proof.b, proof.c)
