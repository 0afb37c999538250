"""Engine-generic Groth16 over BLS12-381 (VERDICT round-1 item #5).

The reference backend is generic over its `Engine` trait and works for
both Bn256 and Bls12_381
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/engines.rs:4-22);
this exercises our analog: the same setup/prove/verify code parameterized
by `Engine.get("bls12_381")` (engines/engine.py), with the host
group/pairing layer from native/bls_pairing.py.

The circuit is kept tiny because BLS has no C++ fast path
(native_ext/bn254.cpp is BN254-only) — the point is the engine-generic
plumbing, not throughput; the BN254 suite covers scale.
"""

import random

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.serialize import (
    proof_from_bytes,
    proof_to_bytes,
    vk_from_bytes,
    vk_to_bytes,
)
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.engines.bls12_381 import Fr
from fawkes_crypto_tpu.engines.engine import Bls12_381
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native import bls_pairing as bp

rng = random.Random(17)


def test_bls_pairing_bilinearity():
    a, b = 5, 11
    lhs = bp.pairing(bp.g_mul(bp.G2_GEN, a), bp.g_mul(bp.G1_GEN, b))
    rhs = bp.pairing(bp.G2_GEN, bp.G1_GEN).pow(a * b)
    assert lhs == rhs
    # e(aQ, bP) == e(bQ, aP)
    assert bp.pairing(bp.g_mul(bp.G2_GEN, b), bp.g_mul(bp.G1_GEN, a)) == lhs


def test_bls_generators_valid():
    assert bp.g1_is_on_curve(bp.G1_GEN)
    assert bp.g2_is_on_curve(bp.G2_GEN)
    assert bp.g1_is_in_subgroup(bp.G1_GEN)
    assert bp.g2_is_in_subgroup(bp.G2_GEN)
    # r * G == identity
    assert bp.g_mul(bp.G1_GEN, bp.R_ORDER) is None
    assert bp.g_mul(bp.G2_GEN, bp.R_ORDER) is None


def _circuit(pub, sec):
    x, y = sec
    (x * y + x).assert_eq(pub)


def _alloc_pub(cs, v):
    return CNum.alloc(cs, v)


def _alloc_sec(cs, v):
    if v is None:
        return (CNum.alloc(cs, None), CNum.alloc(cs, None))
    return tuple(CNum.alloc(cs, x) for x in v)


def test_bls_groth16_e2e():
    params = setup(_circuit, _alloc_pub, _alloc_sec, seed=b"bls",
                   engine="bls12_381")
    assert params.engine == "bls12_381"

    x = Num(Fr, rng.randrange(Fr.p))
    y = Num(Fr, rng.randrange(Fr.p))
    h = x * y + x
    inputs, proof = prove(params, h, (x, y), _circuit, _alloc_pub,
                          _alloc_sec, seed=b"p")
    assert inputs == [h.x]
    assert verify(params.vk, proof, inputs, engine="bls12_381")
    # wrong public input must fail
    assert not verify(params.vk, proof, [h.x + 1], engine="bls12_381")

    # 48-byte-Fq wire format round-trips (G1 = 96 bytes, G2 = 192)
    pb = proof_to_bytes(proof, Bls12_381)
    assert len(pb) == 2 * 96 + 192
    p2 = proof_from_bytes(pb, Bls12_381)
    assert p2.a == proof.a and p2.c == proof.c and p2.b == proof.b
    vb = vk_to_bytes(params.vk, Bls12_381)
    vk2 = vk_from_bytes(vb, Bls12_381)
    assert verify(vk2, p2, inputs, engine="bls12_381")


def test_bls_groth16_device_path():
    """Device-pipeline MSMs on BLS12-381 (round-2 VERDICT weak #4 /
    ADVICE high): the engine's 255-bit scalar width and host group module
    must thread through MSMCtx/decode_point_g2 — witness values with
    bit 254 set would silently lose it under the old BN254-hardwired
    scalar_bits=254 default."""
    params = setup(_circuit, _alloc_pub, _alloc_sec, seed=b"blsdev",
                   engine="bls12_381")
    # values with the top (254th) bit set exercise the widest digit window
    x = Num(Fr, Fr.p - 2)
    y = Num(Fr, Fr.p - 3)
    h = x * y + x
    inputs, proof = prove(params, h, (x, y), _circuit, _alloc_pub,
                          _alloc_sec, seed=b"p", device_msm=True)
    assert inputs == [h.x]
    assert verify(params.vk, proof, inputs)
    # device and host paths agree bit-for-bit under the same seed
    _, proof_host = prove(params, h, (x, y), _circuit, _alloc_pub,
                          _alloc_sec, seed=b"p", device_msm=False)
    assert (proof.a, proof.b, proof.c) == (
        proof_host.a, proof_host.b, proof_host.c)


def test_bls_verify_engine_mismatch_errors():
    """verify() derives the engine from the VK; an explicit conflicting
    engine raises instead of silently failing (round-2 VERDICT weak #9)."""
    import pytest

    params = setup(_circuit, _alloc_pub, _alloc_sec, seed=b"blsmm",
                   engine="bls12_381")
    x = Num(Fr, 7)
    y = Num(Fr, 9)
    h = x * y + x
    inputs, proof = prove(params, h, (x, y), _circuit, _alloc_pub,
                          _alloc_sec, seed=b"p")
    # self-configuring: no engine argument needed
    assert verify(params.vk, proof, inputs)
    with pytest.raises(ValueError, match="engine mismatch"):
        verify(params.vk, proof, inputs, engine="bn256")
    # VK round-trip through bytes preserves the engine
    vk2 = vk_from_bytes(vk_to_bytes(params.vk, Bls12_381), Bls12_381)
    assert vk2.engine == "bls12_381"
    assert verify(vk2, proof, inputs)
