"""Pinned derived artifacts (VERDICT round-1 item #7).

The reference derives every curve/hash constant at runtime from
SeedboxChaCha20 (no hardcoded vectors exist anywhere in
/root/reference): edwards_g from seed "edwards_g"
(engines/bn256/mod.rs:57-63), Poseidon round constants + Cauchy MDS from
"{t}_{f}_{p}" salts (native/poseidon.rs:31-48). This environment has no
Rust toolchain and no network, so a reference-executed cross-pin is not
producible here; what this file provides instead is the strongest
available evidence chain:

 1. the seedbox primitives are pinned against PUBLIC vectors
    (Keccak-f1600 / keccak256, ChaCha20 RFC 8439 + rand_chacha word
    order) in test_seedbox.py — the generator is byte-identical by
    construction;
 2. derivation arithmetic (rejection sampling into Montgomery form,
    from_scalar_raw hash-to-curve) mirrors ff-uint/src/num/mod.rs:286-303
    and native/ecc.rs:103-132 and is unit-tested;
 3. independent ALGEBRAIC invariants are asserted below (values that
    could not hold if the derivation diverged): edwards_d = -168696 /
    168700 recomputed from scratch, montgomery_a == 168698 — the
    PUBLIC Baby-Jubjub Montgomery coefficient (EIP-2494), an external
    cross-check that the -168696/168700 curve is the curve everyone
    else derives;
 4. the full derived values are REGRESSION-PINNED so any future silent
    divergence (seedbox, field, sampling, hash-to-curve) fails loudly.
"""

from fawkes_crypto_tpu.engines.bn256 import Fq, Fr, Fs, jubjub_bn256
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.poseidon import PoseidonParams

EDWARDS_G_X = 19227989239696136204418162341843664990987937539426407488260688646546949419651
EDWARDS_G_Y = 5594788366575697513141207759198249922494475649595016870794746517609441723486


def test_jubjub_constants():
    jp = jubjub_bn256()
    p = Fr.p
    # independent recomputation of d = -168696/168700 (mod r)
    d = (-168696 * pow(168700, -1, p)) % p
    assert jp.edwards_d.x == d
    # A = 2(1-d)/(1+d) must equal the PUBLIC Baby-Jubjub A (EIP-2494)
    assert jp.montgomery_a.x == 168698
    assert jp.montgomery_b.x == (-4 * pow(1 + d, -1, p)) % p
    # u = 337401 is a quadratic non-residue (required by from_scalar_raw;
    # reference engines/bn256/mod.rs:56)
    assert Num(Fr, 337401).legendre() == -1

    # the seeded generator: regression pin + on-curve + correct order
    g = jp.edwards_g
    assert (g.x.x, g.y.x) == (EDWARDS_G_X, EDWARDS_G_Y)
    # on curve: -x^2 + y^2 = 1 + d x^2 y^2 ... reference form is
    # x^2 * d * y^2 = y^2 - x^2 - 1 (circuit/ecc.rs assert_in_curve)
    x2, y2 = g.x.x * g.x.x % p, g.y.x * g.y.x % p
    assert x2 * d * y2 % p == (y2 - x2 - 1) % p
    # prime order: [Fs.p] g == identity, and g != identity
    assert not g.is_zero()
    assert g.into_extended().is_in_subgroup(jp), \
        "edwards_g must lie in the Fs.p subgroup"


def test_poseidon_param_pins():
    """Spot pins over the (4,8,54) and (3,8,53) tables the circuits use
    (salts 'fawkes_poseidon(t,f,p)' per native/poseidon.rs:40)."""
    pp4 = PoseidonParams.new(Fr, 4, 8, 54)
    assert pp4.c[0][0].x == 8967500426966312358211865559062849242276513830789588552972006283992829972518
    assert pp4.c[-1][-1].x == 23454743859435435327107147443575207541188203667998481150136476759995723701
    assert pp4.m[0][0].x == 20661855404209445682589720976953758821209808961538262867862361338515035012271
    assert pp4.m[-1][-1].x == 9918913688947659749656340117539316925819420336687723137450407718278271101051

    pp3 = PoseidonParams.new(Fr, 3, 8, 53)
    assert pp3.c[0][0].x == 13657075295760762462406243122301927085170264242115474679077080185792082333551
    assert pp3.m[1][2].x == 4335291386228643744397879443774430967468251265906563239300843120995504592873

    # MDS is a Cauchy matrix 1/(x_i + y_j): verify the structural relation
    # m[i][j] * (x_i + y_j) == 1 cannot be checked without x,y directly,
    # but invertibility + symmetry of the construction can: all entries
    # nonzero and pairwise distinct rows.
    rows = [tuple(v.x for v in row) for row in pp4.m]
    assert all(all(v != 0 for v in r) for r in rows)
    assert len(set(rows)) == len(rows)


def test_proof_vk_byte_pins():
    """One fixed-seed Proof/VK blob, pinned end-to-end: setup (seeded
    toxic waste), prove (seeded r,s), byte serialization. Guards every
    layer of the stack at once — field arithmetic, QAP, CRS, witness,
    NTT, MSM, serialization — against silent drift."""
    import hashlib

    from fawkes_crypto_tpu.backend.groth16.prover import prove
    from fawkes_crypto_tpu.backend.groth16.serialize import (
        proof_to_bytes,
        vk_to_bytes,
    )
    from fawkes_crypto_tpu.backend.groth16.setup import setup
    from fawkes_crypto_tpu.backend.groth16.verifier import verify
    from fawkes_crypto_tpu.circuit.num import CNum

    def circuit(pub, sec):
        ((sec + 1) * sec).assert_eq(pub)

    def alloc(cs, v):
        return CNum.alloc(cs, v)

    params = setup(circuit, alloc, alloc, seed=b"pin")
    sec = Num(Fr, 41)
    pub = (sec + 1) * sec
    inputs, proof = prove(params, pub, sec, circuit, alloc, alloc,
                          seed=b"pin", device_msm=False)
    assert verify(params.vk, proof, inputs)
    vk_hash = hashlib.sha256(vk_to_bytes(params.vk)).hexdigest()
    proof_hash = hashlib.sha256(proof_to_bytes(proof)).hexdigest()
    assert vk_hash == VK_SHA256, f"vk bytes drifted: {vk_hash}"
    assert proof_hash == PROOF_SHA256, f"proof bytes drifted: {proof_hash}"


VK_SHA256 = "4b62b007fd71575c7112a21895563826bf23da8393b0a42ade8d6beab91244a7"
PROOF_SHA256 = "bbeba09f910bacabb12771a35cadc8b76ebffb1fa53623df097a6de7014a93b1"
