"""PLONK verifier: two pairings over the batched KZG openings.

Replaces halo2's verify_proof + VerifierGWC + AccumulatorStrategy
(/root/reference/fawkes-crypto/src/backend/plonk/verifier.rs:23-44).
Challenge derivation mirrors the prover's transcript exactly.
"""

from __future__ import annotations

from typing import List

from ...engines.bn256 import Fr
from ...native.bn_pairing import g_add, g_mul, g_neg, multi_pairing
from .prover import Proof
from .setup import K1, K2, VerifyingKey
from .transcript import Transcript


def verify(vk: VerifyingKey, proof: Proof, inputs: List) -> bool:
    p = Fr.p
    n = vk.n
    omega = vk.omega
    if len(inputs) != vk.n_public:
        return False
    pub_vals = [x.x if hasattr(x, "x") else int(x) % p for x in inputs]

    tr = Transcript()
    tr.absorb_scalar(n)
    for cm in (vk.q_l, vk.q_r, vk.q_o, vk.q_m, vk.q_c,
               vk.s1, vk.s2, vk.s3):
        tr.absorb_point(cm)
    for x in pub_vals:
        tr.absorb_scalar(x)
    tr.absorb_point(proof.a)
    tr.absorb_point(proof.b)
    tr.absorb_point(proof.c)
    beta = tr.challenge(b"beta")
    gamma = tr.challenge(b"gamma")
    tr.absorb_point(proof.z)
    alpha = tr.challenge(b"alpha")
    tr.absorb_point(proof.t_lo)
    tr.absorb_point(proof.t_mid)
    tr.absorb_point(proof.t_hi)
    zeta = tr.challenge(b"zeta")
    a_bar, b_bar, c_bar = proof.a_bar % p, proof.b_bar % p, proof.c_bar % p
    s1_bar, s2_bar, zw_bar = (proof.s1_bar % p, proof.s2_bar % p,
                              proof.z_omega_bar % p)
    for e in (a_bar, b_bar, c_bar, s1_bar, s2_bar, zw_bar):
        tr.absorb_scalar(e)
    v = tr.challenge(b"v")
    tr.absorb_point(proof.w_zeta)
    tr.absorb_point(proof.w_zeta_omega)
    u = tr.challenge(b"u")

    zh_zeta = (pow(zeta, n, p) - 1) % p
    if zh_zeta == 0:
        return False
    l1_zeta = zh_zeta * pow(n * (zeta - 1) % p, -1, p) % p
    # PI(zeta) = sum_i (-x_i) * L_i(zeta), L_i = w^i (zeta^n - 1)/(n (zeta - w^i))
    pi_zeta = 0
    wi = 1
    for x in pub_vals:
        li = wi * zh_zeta % p * pow(n * (zeta - wi) % p, -1, p) % p
        pi_zeta = (pi_zeta - x * li) % p
        wi = wi * omega % p

    sg12 = ((a_bar + beta * s1_bar + gamma)
            * (b_bar + beta * s2_bar + gamma)) % p
    prod_id_z = ((a_bar + beta * zeta + gamma)
                 * (b_bar + beta * K1 % p * zeta + gamma) % p
                 * ((c_bar + beta * K2 % p * zeta + gamma) % p)) % p
    a2l1 = alpha * alpha % p * l1_zeta % p

    # [r_full]: commitment combination + the constant terms on [1]_1
    d = g_mul(vk.q_m, a_bar * b_bar % p)
    d = g_add(d, g_mul(vk.q_l, a_bar))
    d = g_add(d, g_mul(vk.q_r, b_bar))
    d = g_add(d, g_mul(vk.q_o, c_bar))
    d = g_add(d, vk.q_c)
    d = g_add(d, g_mul(proof.z, (alpha * prod_id_z + a2l1) % p))
    d = g_add(d, g_mul(vk.s3, (-alpha * sg12 % p) * beta % p * zw_bar % p))
    zsplit = pow(zeta, n + 2, p)
    tneg = g_add(
        proof.t_lo,
        g_add(g_mul(proof.t_mid, zsplit),
              g_mul(proof.t_hi, zsplit * zsplit % p)),
    )
    d = g_add(d, g_mul(tneg, (-zh_zeta) % p))
    r_const = (pi_zeta
               - alpha * sg12 % p * ((c_bar + gamma) % p) % p * zw_bar
               - a2l1) % p
    from ...native.bn_pairing import G1_GEN

    r_cm = g_add(d, g_mul(G1_GEN, r_const))

    # batched openings: F = [r] + sum v^i [p_i] + u [z]; e1 = expected evals
    f = r_cm
    e1 = 0
    vp = 1
    for cm, bar in ((proof.a, a_bar), (proof.b, b_bar), (proof.c, c_bar),
                    (vk.s1, s1_bar), (vk.s2, s2_bar)):
        vp = vp * v % p
        f = g_add(f, g_mul(cm, vp))
        e1 = (e1 + vp * bar) % p
    f = g_add(f, g_mul(proof.z, u))
    e1 = (e1 + u * zw_bar) % p

    w1, w2 = proof.w_zeta, proof.w_zeta_omega
    lhs_g1 = g_add(w1, g_mul(w2, u))
    rhs_g1 = g_add(
        g_add(g_mul(w1, zeta), g_mul(w2, u * zeta % p * omega % p)),
        g_add(f, g_neg(g_mul(G1_GEN, e1))),
    )

    from ...native import cext

    pairs = [(lhs_g1, vk.g2_tau), (g_neg(rhs_g1), vk.g2_one)]
    if cext.available():
        return cext.pairing_is_one(pairs)
    return multi_pairing(pairs).is_one()
