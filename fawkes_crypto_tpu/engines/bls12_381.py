"""BLS12-381 engine constants, mirroring
/root/reference/fawkes-crypto/src/engines/bls12_381/mod.rs:8-97."""

from __future__ import annotations

import functools

from ..ff.hostfield import Num, PrimeField
from ..native.ecc import EdwardsPoint, JubJubParams
from ..seedbox import SEED_EDWARDS_G, num_from_seed

Fq = PrimeField(
    4002409555221667393417789825735904156556882819939007885332058136124031650490837864442687629129015664037894272559787,
    2, 6, "bls12_381.Fq",
)
Fr = PrimeField(
    52435875175126190479447740508185965837690552500527637822603658699938581184513,
    7, 4, "bls12_381.Fr",
)
Fs = PrimeField(
    6554484396890773809930967563523245729705921265872317281365359162392183254199,
    7, 4, "bls12_381.Fs",
)


@functools.lru_cache(maxsize=None)
def jubjub_bls12_381() -> JubJubParams:
    one = Num(Fr, 1)
    edwards_d = -Num(Fr, 10240) / Num(Fr, 10241)
    montgomery_a = Num(Fr, 2) * (one - edwards_d) / (one + edwards_d)
    montgomery_b = -Num(Fr, 4) / (one + edwards_d)
    montgomery_u = Num(Fr, 81929)
    edwards_g = EdwardsPoint.from_scalar_raw(
        num_from_seed(Fr, SEED_EDWARDS_G), montgomery_a, montgomery_b, montgomery_u
    )
    return JubJubParams(
        fr=Fr, fs=Fs, edwards_g=edwards_g, edwards_d=edwards_d,
        montgomery_a=montgomery_a, montgomery_b=montgomery_b,
        montgomery_u=montgomery_u, name="jubjub_bls12_381",
    )
