"""On-chip validation drive (the heavy tests that need a real TPU).

Run: python scripts/validate_tpu.py [quick|full]

quick: poseidon-259 prove/verify via the full device pipeline + wave-MSM
       oracle check (about 10 min cold, 1 min warm cache).
full:  adds the depth-32 Merkle circuit (the reference's own heavy test,
       fawkes-crypto/tests/bellman_groth16.rs:18-47) — about 10 more
       minutes cold.

The CPU pytest suite covers everything else; these flows exercise the
Pallas kernels (Mosaic needs the chip) end-to-end, asserting the device
proof is bit-identical to the host-path proof under a fixed seed.
"""

import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.setup import setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.poseidon import (
    CMerkleProof,
    c_poseidon,
    c_poseidon_merkle_proof_root,
)
from fawkes_crypto_tpu.engines.bn256 import Fq, Fr
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.native import cext
from fawkes_crypto_tpu.native.bn_pairing import G1_GEN, g_add, g_double
from fawkes_crypto_tpu.native.poseidon import (
    MerkleProof,
    PoseidonParams,
    poseidon,
    poseidon_merkle_proof_root,
)
from fawkes_crypto_tpu.ops.msm import encode_scalars
from fawkes_crypto_tpu.ops.msm_wave import MSMWave, encode_points_affine_rows

rng = random.Random(5)


def check_msm():
    fctx = FieldCtx.get(Fq)
    base, p = [], G1_GEN
    for _ in range(256):
        base.append(p)
        p = g_double(g_add(p, G1_GEN))
    n = 1 << 12
    pts = [base[i % 256] for i in range(n)]
    scalars = [rng.randrange(Fr.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = Fr.p - 1
    pts[5] = None
    got = MSMWave(fctx, n).msm(
        encode_points_affine_rows(fctx, pts), encode_scalars(scalars, n, fctx.k)
    )
    want = cext.g1_msm([q for q in pts if q],
                       [s for q, s in zip(pts, scalars) if q])
    assert got == want, "wave MSM != C++ oracle"
    print("wave MSM 2^12 vs C++ oracle: OK")


def check_msm_g2():
    from fawkes_crypto_tpu.native.bn_pairing import G2_GEN, g_mul
    from fawkes_crypto_tpu.ops.msm_wave import encode_points_affine_rows_g2

    fctx = FieldCtx.get(Fq)
    base = [g_mul(G2_GEN, rng.randrange(1, 1 << 62)) for _ in range(64)]
    n = 1 << 10
    pts = [base[i % 64] for i in range(n)]
    pts[3] = None
    scalars = [rng.randrange(Fr.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = Fr.p - 1
    got = MSMWave(fctx, n, g2=True).msm(
        encode_points_affine_rows_g2(fctx, pts),
        encode_scalars(scalars, n, fctx.k),
    )
    want = cext.g2_msm([q for q in pts if q],
                       [s for q, s in zip(pts, scalars) if q])
    assert got == want, "G2 wave MSM != C++ oracle"
    print("G2 wave MSM 2^10 vs C++ oracle: OK")


def check_tablegen_chunked():
    """Device table generator (distinct points) + chunked wave MSM vs
    the C++ oracle — the streamed-CRS path bench.py runs at 2^25."""
    import numpy as np

    from fawkes_crypto_tpu.native.bn_pairing import g1_is_on_curve
    from fawkes_crypto_tpu.ops.msm_wave import MSMWave
    from fawkes_crypto_tpu.ops.tablegen import (
        gen_distinct_rows,
        random_scalar_limbs,
    )

    fctx = FieldCtx.get(Fq)
    k = fctx.k
    n, chunk = 1 << 13, 1 << 12
    table = gen_distinct_rows(fctx, n, chunk=chunk, na=128)
    sc = random_scalar_limbs(n, k, seed=3)
    got = MSMWave(fctx, chunk).msm_chunked(table, sc)

    rows = np.asarray(table)
    xs = fctx.decode(np.ascontiguousarray(rows[:, :k]))
    ys = fctx.decode(np.ascontiguousarray(rows[:, k:]))
    pts = list(zip(xs, ys))
    assert len(set(pts)) == n, "generated points must be distinct"
    for i in range(0, n, 997):
        assert g1_is_on_curve(pts[i]), f"row {i} off-curve"
    sc_h = np.asarray(sc).astype(object)
    ints = [int(sum(int(v) << (16 * j) for j, v in enumerate(r)))
            for r in sc_h]
    want = cext.g1_msm(pts, ints)
    assert got == want, "chunked MSM != C++ oracle"
    print("tablegen + chunked MSM 2^13 vs C++ oracle: OK")


def check_poseidon():
    pp = PoseidonParams.new(Fr, 4, 8, 54)

    def circuit(pub, sec):
        c_poseidon(list(sec), pp).assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return tuple(CNum.alloc(cs, None) for _ in range(3))
        return tuple(CNum.alloc(cs, x) for x in v)

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"validate")
    data = [Num(Fr, rng.randrange(Fr.p)) for _ in range(3)]
    h = poseidon(data, pp)
    t0 = time.time()
    inputs, proof = prove(params, h, data, circuit, alloc_pub, alloc_sec,
                          seed=b"s", device_msm=True)
    assert verify(params.vk, proof, inputs)
    assert not verify(params.vk, proof, [(h + 1).x])
    _, proof2 = prove(params, h, data, circuit, alloc_pub, alloc_sec,
                      seed=b"s", device_msm=False)
    assert (proof2.a, proof2.b, proof2.c) == (proof.a, proof.b, proof.c)
    print(f"poseidon-259 device prove + verify + host-identity: OK "
          f"({time.time()-t0:.1f}s)")


def check_merkle32():
    depth = 32
    pp = PoseidonParams.new(Fr, 3, 8, 53)

    def circuit(pub, sec):
        leaf, proof = sec
        c_poseidon_merkle_proof_root(leaf, proof, pp).assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return (CNum.alloc(cs, None),
                    CMerkleProof.alloc(cs, None, length=depth))
        return (CNum.alloc(cs, v[0]), CMerkleProof.alloc(cs, v[1]))

    params = setup(circuit, alloc_pub, alloc_sec, seed=b"m32")
    leaf = Num(Fr, rng.randrange(Fr.p))
    mp = MerkleProof(
        sibling=[Num(Fr, rng.randrange(Fr.p)) for _ in range(depth)],
        path=[rng.random() < 0.5 for _ in range(depth)],
    )
    root = poseidon_merkle_proof_root(leaf, mp, pp)
    t0 = time.time()
    inputs, proof = prove(params, root, (leaf, mp), circuit, alloc_pub,
                          alloc_sec, seed=b"q", device_msm=True)
    assert verify(params.vk, proof, inputs)
    print(f"merkle-32 device prove + verify: OK ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    check_msm()
    check_msm_g2()
    check_tablegen_chunked()
    check_poseidon()
    if mode == "full":
        check_merkle32()
    print("validate_tpu:", mode, "PASSED")
