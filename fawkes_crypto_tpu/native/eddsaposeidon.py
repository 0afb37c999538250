"""EdDSA-Poseidon signatures (native), mirroring
/root/reference/fawkes-crypto/src/native/eddsaposeidon.rs:13-79.

rho = Blake2s(person="__fawkes", sk_limbs_le || m_limbs_le) reduced into Fs;
R = rho*G, S = rho + poseidon(R.x, A.x, m)*sk.
"""

from __future__ import annotations

import hashlib

from ..ff.hostfield import Num
from ..seedbox import PERSONALIZATION
from .ecc import EdwardsPoint, JubJubParams
from .poseidon import PoseidonParams, poseidon


def _hash_r(sk: Num, m: Num) -> Num:
    """Blake2s-256 with personalization over LE limb bytes; reduced into Fs."""
    fs = sk.fld
    h = hashlib.blake2s(digest_size=32, person=PERSONALIZATION)
    h.update(sk.to_le_bytes())
    h.update(m.to_le_bytes())
    v = int.from_bytes(h.digest(), "little")
    return Num(fs, v % fs.p)


def _hash_ram(r: Num, a: Num, m: Num, poseidon_params: PoseidonParams) -> Num:
    return poseidon([r, a, m], poseidon_params)


def eddsaposeidon_sign(sk: Num, m: Num, poseidon_params: PoseidonParams,
                       jubjub_params: JubJubParams):
    """Returns (s: Num<Fs>, r: Num<Fr>)."""
    rho = _hash_r(sk, m)
    g = jubjub_params.edwards_g
    r_x = g.mul(rho, jubjub_params).x
    a_x = g.mul(sk, jubjub_params).x
    h = _hash_ram(r_x, a_x, m, poseidon_params).to_other_reduced(jubjub_params.fs)
    s = rho + h * sk.to_other_reduced(jubjub_params.fs)
    return s, r_x


def eddsaposeidon_verify(s: Num, r: Num, a: Num, m: Num,
                         poseidon_params: PoseidonParams,
                         jubjub_params: JubJubParams) -> bool:
    p_a = EdwardsPoint.subgroup_decompress(a, jubjub_params)
    if p_a is None:
        return False
    p_r = EdwardsPoint.subgroup_decompress(r, jubjub_params)
    if p_r is None:
        return False
    h = _hash_ram(r, a, m, poseidon_params).to_other_reduced(jubjub_params.fs)
    ha = p_a.mul(h, jubjub_params)
    sb = jubjub_params.edwards_g.mul(s, jubjub_params)
    ha_plus_r = ha.add(p_r, jubjub_params)
    return sb == ha_plus_r
