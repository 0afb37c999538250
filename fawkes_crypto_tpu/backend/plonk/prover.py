"""PLONK prover: vanilla PLONK over the 3-wire custom gate, KZG/BN254.

Replaces halo2's create_proof + ProverGWC
(/root/reference/fawkes-crypto/src/backend/plonk/prover.rs:43-104) with
the full protocol in-repo:

round 1  commit blinded wire polynomials a, b, c
round 2  permutation grand product z with challenges beta, gamma
round 3  quotient t on an 8n coset, split t_lo/t_mid/t_hi
round 4  evaluations at zeta; full linearization r with r(zeta) = 0
round 5  KZG openings W_zeta (batched) and W_zeta*omega (z shift)

Gate equation per row: q_l*a + q_r*b + q_o*c + q_m*a*b + q_c + PI = 0
(plonk_config.rs:41-55 plus the standard PI polynomial for the halo2
instance column).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

from ...engines.bn256 import Fr
from ...native.bn_pairing import g_add, g_mul
from ...seedbox import SeedboxChaCha20
from ..groth16.prover import msm_host
from .params import Parameters
from .poly import (
    coset_eval,
    coset_interp,
    div_by_linear,
    intt,
    poly_add,
    poly_eval,
    poly_mul_zh,
    poly_scale,
    root_of_unity,
)
from .setup import K1, K2, ProvingKey, _layout, _trace
from .transcript import Transcript


def commit(params: Parameters, coeffs: List[int]):
    assert len(coeffs) <= len(params.g1_pows), "poly exceeds SRS"
    return msm_host(params.g1_pows[: len(coeffs)], list(coeffs), Fr.p)


@dataclass
class Proof:
    a: tuple
    b: tuple
    c: tuple
    z: tuple
    t_lo: tuple
    t_mid: tuple
    t_hi: tuple
    w_zeta: tuple
    w_zeta_omega: tuple
    a_bar: int
    b_bar: int
    c_bar: int
    s1_bar: int
    s2_bar: int
    z_omega_bar: int


def _batch_inv(vals: List[int], p: int) -> List[int]:
    pref = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % p
    inv = pow(pref[-1], -1, p)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = pref[i] * inv % p
        inv = inv * vals[i] % p
    return out


def _use_device(n: int) -> bool:
    dev = os.environ.get("FAWKES_PLONK_DEVICE", "")
    if dev not in ("",):
        return dev != "0"
    import jax

    return jax.default_backend() == "tpu" and n >= 1024


def _q_coeffs(pk: ProvingKey):
    """Selector coefficient polynomials (cached: they are fixed per key
    but prover rounds 4/5 need them every proof)."""
    qc = pk.__dict__.get("_q_coeffs")
    if qc is None:
        p = Fr.p
        qc = tuple(intt(q, pk.omega, p)
                   for q in (pk.ql, pk.qr, pk.qo, pk.qm, pk.qc))
        pk.__dict__["_q_coeffs"] = qc
    return qc


def prove(params: Parameters, pk: ProvingKey, input_pub, input_sec,
          circuit: Callable, alloc_pub: Callable, alloc_sec: Callable,
          seed: Optional[bytes] = None) -> Tuple[List, Proof]:
    """Returns (public_input_values, proof). Re-runs the circuit with
    concrete values (the reference's plonk prove does the same,
    prover.rs:56-66) and asserts eager satisfaction.

    On TPU (or FAWKES_PLONK_DEVICE=1) the heavy polynomial math — the
    round-1/2 interpolations and the whole round-3 quotient — runs on
    device (backend/plonk/device.py); the host path remains the oracle."""
    p = Fr.p
    n = pk.n
    omega = pk.omega
    dev = None
    if _use_device(n):
        from .device import PlonkDevice

        dev = pk.__dict__.get("_device")
        if dev is None:
            dev = PlonkDevice(pk)
            pk.__dict__["_device"] = dev

    cs = _trace(circuit, alloc_pub, alloc_sec, input_pub, input_sec,
                tracking=True)
    n2, *_ = _layout(cs)
    assert n2 == n and len(cs.public) == pk.n_public, \
        "circuit shape diverged from keygen"

    def val(v):
        return 0 if v < 0 else cs.values[v].x

    w = [[val(pk.wires[c][i]) for i in range(n)] for c in range(3)]
    pub_vals = [cs.values[v].x for v in cs.public]

    if seed is None:
        seed = os.urandom(32)
    sb = SeedboxChaCha20(b"plonk_prove" + seed)
    blind = [sb.gen_num(Fr).x for _ in range(11)]

    tr = Transcript()
    tr.absorb_scalar(n)
    for cm in (pk.vk.q_l, pk.vk.q_r, pk.vk.q_o, pk.vk.q_m, pk.vk.q_c,
               pk.vk.s1, pk.vk.s2, pk.vk.s3):
        tr.absorb_point(cm)
    for x in pub_vals:
        tr.absorb_scalar(x)

    # ---- round 1: wire polynomials -----------------------------------------
    interp = dev.intt_n if dev is not None else (
        lambda v: intt(v, omega, p))
    wire_coeffs = []
    for c in range(3):
        base = interp(w[c])
        bl = poly_mul_zh([blind[2 * c + 1], blind[2 * c]], n, p)
        wire_coeffs.append(poly_add(base, bl, p))
    cm_a = commit(params, wire_coeffs[0])
    cm_b = commit(params, wire_coeffs[1])
    cm_c = commit(params, wire_coeffs[2])
    tr.absorb_point(cm_a)
    tr.absorb_point(cm_b)
    tr.absorb_point(cm_c)
    beta = tr.challenge(b"beta")
    gamma = tr.challenge(b"gamma")

    # ---- round 2: permutation grand product --------------------------------
    ks = (1, K1, K2)
    om_pows = [1] * n
    for i in range(1, n):
        om_pows[i] = om_pows[i - 1] * omega % p
    dens = []
    nums = []
    for i in range(n):
        nu = de = 1
        for c in range(3):
            nu = nu * (w[c][i] + beta * ks[c] * om_pows[i] + gamma) % p
            de = de * (w[c][i] + beta * pk.sigma_vals[c][i] + gamma) % p
        nums.append(nu)
        dens.append(de)
    den_inv = _batch_inv(dens, p)
    zv = [1] * n
    for i in range(n - 1):
        zv[i + 1] = zv[i] * nums[i] % p * den_inv[i] % p
    assert zv[n - 1] * nums[n - 1] % p * den_inv[n - 1] % p == 1, \
        "permutation argument does not close"
    z_coeffs = poly_add(
        interp(zv),
        poly_mul_zh([blind[8], blind[7], blind[6]], n, p), p,
    )
    cm_z = commit(params, z_coeffs)
    tr.absorb_point(cm_z)
    alpha = tr.challenge(b"alpha")

    # ---- round 3: quotient on the 8n coset ----------------------------------
    m = 8 * n
    shift = Fr.generator
    if dev is not None:
        t_coeffs = dev.quotient(wire_coeffs, z_coeffs, pub_vals,
                                beta, gamma, alpha)
    else:
        ext = lambda coeffs: coset_eval(coeffs, m, shift, Fr)  # noqa: E731

        A, B, C = (ext(wc) for wc in wire_coeffs)
        Z = ext(z_coeffs)
        rot = m // n
        Zw = Z[rot:] + Z[:rot]  # z(omega * x) on the coset
        QL, QR, QO, QM, QC = (ext(q) for q in _q_coeffs(pk))
        S1e, S2e, S3e = (ext(sc) for sc in pk.s_coeffs)
        pi_vec = [0] * n
        for i, x in enumerate(pub_vals):
            pi_vec[i] = (-x) % p
        PI = ext(intt(pi_vec, omega, p))
        l1_vec = [0] * n
        l1_vec[0] = 1
        L1 = ext(intt(l1_vec, omega, p))

        wm = root_of_unity(Fr, m)
        xs = [1] * m
        for i in range(1, m):
            xs[i] = xs[i - 1] * wm % p
        gn = pow(shift, n, p)
        zh_inv_cycle = _batch_inv(
            [(gn * pow(xs[i], n, p) - 1) % p for i in range(rot)], p
        )

        t_evals = [0] * m
        for i in range(m):
            x = xs[i] * shift % p
            gate = (QM[i] * A[i] % p * B[i] + QL[i] * A[i] + QR[i] * B[i]
                    + QO[i] * C[i] + QC[i] + PI[i]) % p
            prod_id = ((A[i] + beta * x + gamma)
                       * (B[i] + beta * K1 % p * x + gamma) % p
                       * ((C[i] + beta * K2 % p * x + gamma) % p)) % p
            prod_sg = ((A[i] + beta * S1e[i] + gamma)
                       * (B[i] + beta * S2e[i] + gamma) % p
                       * ((C[i] + beta * S3e[i] + gamma) % p)) % p
            perm = (prod_id * Z[i] - prod_sg * Zw[i]) % p
            lag = (Z[i] - 1) * L1[i] % p
            num = (gate + alpha * perm + alpha * alpha % p * lag) % p
            t_evals[i] = num * zh_inv_cycle[i % rot] % p

        t_coeffs = coset_interp(t_evals, shift, Fr)
    deg_cap = 3 * (n + 2)
    assert all(c == 0 for c in t_coeffs[deg_cap:]), \
        "quotient degree overflow: constraint system not satisfied"
    t_lo = t_coeffs[: n + 2] + [blind[9]]
    t_mid = list(t_coeffs[n + 2 : 2 * (n + 2)])
    t_mid[0] = (t_mid[0] - blind[9]) % p
    t_mid.append(blind[10])
    t_hi = list(t_coeffs[2 * (n + 2) : deg_cap])
    t_hi[0] = (t_hi[0] - blind[10]) % p
    cm_tlo = commit(params, t_lo)
    cm_tmid = commit(params, t_mid)
    cm_thi = commit(params, t_hi)
    tr.absorb_point(cm_tlo)
    tr.absorb_point(cm_tmid)
    tr.absorb_point(cm_thi)
    zeta = tr.challenge(b"zeta")

    # ---- round 4: evaluations + full linearization --------------------------
    a_bar = poly_eval(wire_coeffs[0], zeta, p)
    b_bar = poly_eval(wire_coeffs[1], zeta, p)
    c_bar = poly_eval(wire_coeffs[2], zeta, p)
    s1_bar = poly_eval(pk.s_coeffs[0], zeta, p)
    s2_bar = poly_eval(pk.s_coeffs[1], zeta, p)
    zw_bar = poly_eval(z_coeffs, zeta * omega % p, p)
    for e in (a_bar, b_bar, c_bar, s1_bar, s2_bar, zw_bar):
        tr.absorb_scalar(e)
    v = tr.challenge(b"v")

    zh_zeta = (pow(zeta, n, p) - 1) % p
    l1_zeta = zh_zeta * pow(n * (zeta - 1) % p, -1, p) % p
    # pi(zeta) = sum_i -x_i * L_i(zeta), L_i(z) = w^i (z^n-1)/(n (z-w^i))
    # — closed form over the few public rows, no size-n interpolation
    pi_zeta = 0
    om_i = 1
    for x in pub_vals:
        li = om_i * zh_zeta % p * pow(n * (zeta - om_i) % p, -1, p) % p
        pi_zeta = (pi_zeta - x * li) % p
        om_i = om_i * omega % p

    # r(X): every non-constant group scaled onto its committed polynomial;
    # constants chosen so r(zeta) == 0 for an honest witness.
    ql_c, qr_c, qo_c, qm_c, qc_c = _q_coeffs(pk)
    r = [0]
    gate_c = poly_add(
        poly_add(poly_scale(qm_c, a_bar * b_bar % p, p),
                 poly_scale(ql_c, a_bar, p), p),
        poly_add(poly_scale(qr_c, b_bar, p),
                 poly_add(poly_scale(qo_c, c_bar, p), qc_c, p), p), p)
    r = poly_add(r, gate_c, p)
    r[0] = (r[0] + pi_zeta) % p

    prod_id_z = ((a_bar + beta * zeta + gamma)
                 * (b_bar + beta * K1 % p * zeta + gamma) % p
                 * ((c_bar + beta * K2 % p * zeta + gamma) % p)) % p
    r = poly_add(r, poly_scale(z_coeffs, alpha * prod_id_z % p, p), p)
    sg12 = ((a_bar + beta * s1_bar + gamma)
            * (b_bar + beta * s2_bar + gamma)) % p
    r = poly_add(
        r,
        poly_scale(pk.s_coeffs[2],
                   (-alpha * sg12 % p) * beta % p * zw_bar % p, p), p)
    r[0] = (r[0] - alpha * sg12 % p * ((c_bar + gamma) % p) % p * zw_bar) % p
    a2l1 = alpha * alpha % p * l1_zeta % p
    r = poly_add(r, poly_scale(z_coeffs, a2l1, p), p)
    r[0] = (r[0] - a2l1) % p
    zsplit = pow(zeta, n + 2, p)
    tcomb = poly_add(
        t_lo,
        poly_add(poly_scale(t_mid, zsplit, p),
                 poly_scale(t_hi, zsplit * zsplit % p, p), p), p)
    r = poly_add(r, poly_scale(tcomb, (-zh_zeta) % p, p), p)
    assert poly_eval(r, zeta, p) == 0, "linearization must vanish at zeta"

    # ---- round 5: openings ----------------------------------------------------
    num = list(r)
    vp = 1
    for coeffs, bar in ((wire_coeffs[0], a_bar), (wire_coeffs[1], b_bar),
                        (wire_coeffs[2], c_bar), (pk.s_coeffs[0], s1_bar),
                        (pk.s_coeffs[1], s2_bar)):
        vp = vp * v % p
        shifted = list(coeffs)
        shifted[0] = (shifted[0] - bar) % p
        num = poly_add(num, poly_scale(shifted, vp, p), p)
    w_zeta = div_by_linear(num, zeta, p)
    cm_w1 = commit(params, w_zeta)

    znum = list(z_coeffs)
    znum[0] = (znum[0] - zw_bar) % p
    w_zw = div_by_linear(znum, zeta * omega % p, p)
    cm_w2 = commit(params, w_zw)

    return list(pub_vals), Proof(
        a=cm_a, b=cm_b, c=cm_c, z=cm_z,
        t_lo=cm_tlo, t_mid=cm_tmid, t_hi=cm_thi,
        w_zeta=cm_w1, w_zeta_omega=cm_w2,
        a_bar=a_bar, b_bar=b_bar, c_bar=c_bar,
        s1_bar=s1_bar, s2_bar=s2_bar, z_omega_bar=zw_bar,
    )
