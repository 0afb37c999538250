"""Groth16 verifier: e(A,B) = e(alpha,beta) e(sum x_i IC_i, gamma) e(C,delta).

Mirrors /root/reference/fawkes-crypto/src/backend/bellman_groth16/verifier.rs:75-81
with bellman's pairing replaced by native/bn_pairing (single shared final
exponentiation over the 4-pairing product).
"""

from __future__ import annotations

from typing import List

from .params import VK, Proof


def verify(vk: VK, proof: Proof, inputs: List[int],
           engine: str = "bn256") -> bool:
    from ...engines.engine import Engine

    E = Engine.get(engine)
    G = E.g
    Fr = E.fr
    if len(inputs) + 1 != len(vk.ic):
        return False

    xs = [x.x if hasattr(x, "x") else x % Fr.p for x in inputs]
    if E.cext_ok:
        from ...native import cext

        acc = cext.g1_msm(vk.ic, [1] + xs)
        return cext.pairing_is_one([
            (G.g_neg(proof.a), proof.b),
            (vk.alpha, vk.beta),
            (acc, vk.gamma),
            (proof.c, vk.delta),
        ])
    acc = vk.ic[0]
    for x, pt in zip(xs, vk.ic[1:]):
        acc = G.g_add(acc, G.g_mul(pt, x % Fr.p))
    out = G.multi_pairing([
        (G.g_neg(proof.a), proof.b),
        (vk.alpha, vk.beta),
        (acc, vk.gamma),
        (proof.c, vk.delta),
    ])
    return out.is_one()
