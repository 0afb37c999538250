"""BN254 (a.k.a. alt_bn128) engine: Fq/Fr/Fs fields + the embedded
JubJubBN256 curve, mirroring /root/reference/fawkes-crypto/src/engines/bn256/mod.rs:8-97.

BN254 pairing-group constants (G1/G2 generators, Fq2 tower) are in
native/bn_pairing.py; this module carries what circuits need.
"""

from __future__ import annotations

import functools

from ..ff.hostfield import Num, PrimeField
from ..native.ecc import EdwardsPoint, JubJubParams
from ..seedbox import SEED_EDWARDS_G, num_from_seed

# Moduli (reference engines/bn256/mod.rs:12,22,32)
Fq = PrimeField(
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
    2, 4, "bn256.Fq",
)
Fr = PrimeField(
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    7, 4, "bn256.Fr",
)
Fs = PrimeField(
    2736030358979909402780800718157159386076813972158567259200215660948447373041,
    7, 4, "bn256.Fs",
)


@functools.lru_cache(maxsize=None)
def jubjub_bn256() -> JubJubParams:
    """JubJubBN256::new (reference engines/bn256/mod.rs:47-74)."""
    one = Num(Fr, 1)
    edwards_d = -Num(Fr, 168696) / Num(Fr, 168700)
    montgomery_a = Num(Fr, 2) * (one - edwards_d) / (one + edwards_d)
    montgomery_b = -Num(Fr, 4) / (one + edwards_d)
    montgomery_u = Num(Fr, 337401)
    edwards_g = EdwardsPoint.from_scalar_raw(
        num_from_seed(Fr, SEED_EDWARDS_G), montgomery_a, montgomery_b, montgomery_u
    )
    return JubJubParams(
        fr=Fr, fs=Fs, edwards_g=edwards_g, edwards_d=edwards_d,
        montgomery_a=montgomery_a, montgomery_b=montgomery_b,
        montgomery_u=montgomery_u,
    )
