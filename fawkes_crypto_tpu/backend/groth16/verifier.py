"""Groth16 verifier: e(A,B) = e(alpha,beta) e(sum x_i IC_i, gamma) e(C,delta).

Mirrors /root/reference/fawkes-crypto/src/backend/bellman_groth16/verifier.rs:75-81
with bellman's pairing replaced by native/bn_pairing (single shared final
exponentiation over the 4-pairing product).
"""

from __future__ import annotations

from typing import List

from ...engines.bn256 import Fr
from ...native.bn_pairing import g_add, g_mul, g_neg, multi_pairing
from .params import VK, Proof


def verify(vk: VK, proof: Proof, inputs: List[int]) -> bool:
    if len(inputs) + 1 != len(vk.ic):
        return False
    from ...native import cext

    xs = [x.x if hasattr(x, "x") else x % Fr.p for x in inputs]
    if cext.available():
        acc = cext.g1_msm(vk.ic, [1] + xs)
        return cext.pairing_is_one([
            (g_neg(proof.a), proof.b),
            (vk.alpha, vk.beta),
            (acc, vk.gamma),
            (proof.c, vk.delta),
        ])
    acc = vk.ic[0]
    for x, pt in zip(xs, vk.ic[1:]):
        acc = g_add(acc, g_mul(pt, x % Fr.p))
    out = multi_pairing([
        (g_neg(proof.a), proof.b),
        (vk.alpha, vk.beta),
        (acc, vk.gamma),
        (proof.c, vk.delta),
    ])
    return out.is_one()
