"""Groth16 verifier: e(A,B) = e(alpha,beta) e(sum x_i IC_i, gamma) e(C,delta).

Mirrors /root/reference/fawkes-crypto/src/backend/bellman_groth16/verifier.rs:75-81
with bellman's pairing replaced by native/bn_pairing (single shared final
exponentiation over the 4-pairing product).

The engine is derived from the VK artifact (VK.engine, set at setup and
carried through vk_from_bytes) so the curve cannot be mismatched silently;
an explicit `engine=` argument must agree with the VK or verify() raises.
"""

from __future__ import annotations

from typing import List, Optional

from .params import VK, Proof


def verify(vk: VK, proof: Proof, inputs: List[int],
           engine: Optional[str] = None) -> bool:
    from ...engines.engine import Engine

    vk_engine = getattr(vk, "engine", None) or "bn256"
    if engine is not None and engine != vk_engine:
        raise ValueError(
            f"engine mismatch: verify(engine={engine!r}) but the VK is on "
            f"{vk_engine!r}"
        )
    E = Engine.get(vk_engine)
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


def verify_params(params, proof: Proof, inputs: List[int]) -> bool:
    """Engine-safe convenience: verify against a Parameters' own VK and
    engine (the read-side analog of bellman's typed Parameters<E>)."""
    return verify(params.vk, proof, inputs, engine=params.engine)
