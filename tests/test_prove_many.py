"""prove_many: batched (dp) proving sharing one CRS residency.

Asserts each batched proof is bit-identical to the corresponding
single prove() under the same per-proof seed (host path oracle)."""

import random

import pytest

from fawkes_crypto_tpu.backend.groth16.prover import prove, prove_many
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.poseidon import c_poseidon
from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.poseidon import PoseidonParams, poseidon

rng = random.Random(31)


@pytest.fixture(scope="module")
def setup_fixture():
    pp = PoseidonParams.new(Fr, 4, 8, 54)

    def circuit(pub, sec):
        c_poseidon(list(sec), pp).assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return tuple(CNum.alloc(cs, None) for _ in range(3))
        return tuple(CNum.alloc(cs, x) for x in v)

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"many")
    jobs = []
    for _ in range(3):
        data = [Num(Fr, rng.randrange(Fr.p)) for _ in range(3)]
        jobs.append((poseidon(data, pp), data))
    return params, circuit, alloc_pub, alloc_sec, jobs


def test_prove_many_matches_single(setup_fixture):
    params, circuit, alloc_pub, alloc_sec, jobs = setup_fixture
    seeds = [bytes([i]) * 4 for i in range(len(jobs))]
    # device pipeline (XLA on the CPU mesh; wave-batched on TPU)
    out = prove_many(params, jobs, circuit, alloc_pub, alloc_sec,
                     seeds=seeds, device_msm=True)
    assert len(out) == len(jobs)
    for (inputs, proof), (pub, sec), seed in zip(out, jobs, seeds):
        want_in, want_pf = prove(params, pub, sec, circuit, alloc_pub,
                                 alloc_sec, seed=seed, device_msm=False)
        assert inputs == want_in
        assert (proof.a, proof.b, proof.c) == \
            (want_pf.a, want_pf.b, want_pf.c)
        assert verify(params.vk, proof, inputs)
