"""Mesh-parallel prove(): the REAL backend pipeline sharded over the
virtual 8-device CPU mesh (backend/groth16/mesh.py MeshProver).

Asserts the distributed proof is bit-identical to the host-path proof
under a fixed seed, and verifies — the multi-chip analog of bellman's
multicore worker (SURVEY.md §2.4 last row / §2.5)."""

import random

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.poseidon import c_poseidon
from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.poseidon import PoseidonParams, poseidon

rng = random.Random(5)


@pytest.fixture(scope="module")
def poseidon_setup():
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

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"mesh-test")
    data = [Num(Fr, rng.randrange(Fr.p)) for _ in range(3)]
    h = poseidon(data, poseidon_params)
    return params, circuit, alloc_pub, alloc_sec, data, h


def test_mesh_prove_matches_host(poseidon_setup):
    """(dp, sp) 2-D mesh, same shape as dryrun_multichip(8) so the
    XLA-CPU compiles are shared via the persistent cache; the prover
    shards over sp, dp is left free."""
    params, circuit, alloc_pub, alloc_sec, data, h = poseidon_setup
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))

    inputs_m, proof_m = prove(
        params, h, data, circuit, alloc_pub, alloc_sec, seed=b"p",
        mesh=mesh,
    )
    inputs_h, proof_h = prove(
        params, h, data, circuit, alloc_pub, alloc_sec, seed=b"p",
        device_msm=False,
    )
    assert inputs_m == inputs_h
    assert (proof_m.a, proof_m.b, proof_m.c) == \
        (proof_h.a, proof_h.b, proof_h.c)
    assert verify(params.vk, proof_m, inputs_m)
