"""Compiled witness program vs the reference-style WitnessCS replay.

Both must produce identical (inputs, aux) vectors — this is the guarantee
that lets prove() skip the per-proof DSL re-interpretation (SURVEY.md §7
hard part #4: trace once, evaluate as a static program)."""

import random

from fawkes_crypto_tpu.backend.groth16.prover import generate_witness
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.witness import WitnessProgram
from fawkes_crypto_tpu.circuit.eddsaposeidon import c_eddsaposeidon_verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.poseidon import (
    CMerkleProof,
    c_poseidon_merkle_proof_root,
)
from fawkes_crypto_tpu.engines.bn256 import Fr, Fs, jubjub_bn256
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.eddsaposeidon import eddsaposeidon_sign
from fawkes_crypto_tpu.native.poseidon import (
    MerkleProof,
    PoseidonParams,
    poseidon_merkle_proof_root,
)

rng = random.Random(31)


def rand_fr():
    return Num(Fr, rng.randrange(Fr.p))


def test_witness_program_merkle():
    DEPTH = 6
    pp = PoseidonParams.new(Fr, 3, 8, 53)

    def circuit(pub, sec):
        leaf, proof = sec
        c_poseidon_merkle_proof_root(leaf, proof, pp).assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return (CNum.alloc(cs, None),
                    CMerkleProof.alloc(cs, None, length=DEPTH))
        return (CNum.alloc(cs, v[0]), CMerkleProof.alloc(cs, v[1]))

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"wp")
    leaf = rand_fr()
    mp = MerkleProof(
        sibling=[rand_fr() for _ in range(DEPTH)],
        path=[rng.random() < 0.5 for _ in range(DEPTH)],
    )
    root = poseidon_merkle_proof_root(leaf, mp, pp)

    want_in, want_aux = generate_witness(
        params, root, (leaf, mp), circuit, alloc_pub, alloc_sec
    )
    prog = WitnessProgram.from_params(params)
    got_in, got_aux = prog.evaluate(root, (leaf, mp))
    assert got_in == want_in
    assert got_aux == want_aux


def test_witness_program_eddsa_hints_and_bits():
    """EdDSA exercises every op kind: hints (subgroup_decompress sqrt),
    bits (strict decomposition), mul/div/inv_or (ecmul, is_zero)."""
    jp = jubjub_bn256()
    pp = PoseidonParams.new(Fr, 4, 8, 54)
    sk = Num(Fs, rng.randrange(Fs.p))
    m = rand_fr()
    s, r = eddsaposeidon_sign(sk, m, pp, jp)
    a = jp.edwards_g.mul(sk, jp).x

    def circuit(pub, sec):
        ss, sr, sa = sec
        res = c_eddsaposeidon_verify(ss, sr, sa, pub, pp, jp)
        res.assert_const(True)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return tuple(CNum.alloc(cs, None) for _ in range(3))
        return tuple(CNum.alloc(cs, x) for x in v)

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"wp2")
    sec = (Num(Fr, s.x), r, a)

    want_in, want_aux = generate_witness(
        params, m, sec, circuit, alloc_pub, alloc_sec
    )
    prog = WitnessProgram.from_params(params)
    got_in, got_aux = prog.evaluate(m, sec)
    assert got_in == want_in
    assert got_aux == want_aux
