"""Groth16 setup: circuit tracing -> R1CS -> CRS.

Mirrors the role of /root/reference/fawkes-crypto/src/backend/bellman_groth16/setup.rs:7-35
with the external bellman generator replaced by our own QAP + fixed-base
exponentiations. Supports a deterministic seeded CRS (for tests/regression:
SURVEY.md §7 "deterministic test CRS option") or OS randomness.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from ...circuit.cs import BuildCS
from ...engines.engine import Engine
from ...seedbox import SeedboxChaCha20
from .params import VK, Parameters, ProvingKey
from .qap import eval_qap_at_tau, r1cs_from_cs


def inputize_signal(sig):
    if hasattr(sig, "inputize"):
        sig.inputize()
    elif isinstance(sig, (tuple, list)):
        for s in sig:
            inputize_signal(s)
    else:
        raise TypeError(f"cannot inputize {type(sig)}")


def _sample_toxic(seed: Optional[bytes], fr):
    """tau, alpha, beta, gamma, delta. Seeded (deterministic) or OS-random."""
    if seed is None:
        seed = os.urandom(32)
    sb = SeedboxChaCha20(b"groth16_setup" + seed)
    out = []
    while len(out) < 5:
        v = sb.gen_num(fr).x
        if v != 0:
            out.append(v)
    return out


def setup(circuit: Callable, alloc_pub: Callable, alloc_sec: Callable,
          seed: Optional[bytes] = None, engine: str = "bn256") -> Parameters:
    """Trace the circuit symbolically, build the CRS.

    circuit(pub_signal, sec_signal); alloc_pub/alloc_sec(cs, value_or_None).
    engine: pairing engine name ("bn256" | "bls12_381") — the analog of the
    reference's Parameters<E> type parameter (engines.rs:4-22).
    """
    E = Engine.get(engine)
    Fr = E.fr
    cs = BuildCS(Fr)
    signal_pub = alloc_pub(cs, None)
    inputize_signal(signal_pub)
    signal_sec = alloc_sec(cs, None)
    circuit(signal_pub, signal_sec)

    r1cs = r1cs_from_cs(cs)
    n = r1cs.domain
    p = Fr.p
    omega = pow(Fr.root_of_unity, 1 << (Fr.s - (n.bit_length() - 1)), p)

    tau, alpha, beta, gamma, delta = _sample_toxic(seed, Fr)
    u, v, w, z_tau = eval_qap_at_tau(r1cs, tau, p, omega)

    gamma_inv = pow(gamma, -1, p)
    delta_inv = pow(delta, -1, p)

    G = E.g
    if E.cext_ok:
        from ...native import cext

        def g1(s):
            return cext.g1_mul(G.G1_GEN, s % p)

        def g2(s):
            return cext.g2_mul(G.G2_GEN, s % p)
    else:
        def g1(s):
            return G.g_mul(G.G1_GEN, s % p)

        def g2(s):
            return G.g_mul(G.G2_GEN, s % p)

    num_input = r1cs.num_input
    m = r1cs.num_wires

    ic = [g1((beta * u[i] + alpha * v[i] + w[i]) * gamma_inv) for i in range(num_input)]
    l_g1 = [
        g1((beta * u[i] + alpha * v[i] + w[i]) * delta_inv)
        for i in range(num_input, m)
    ]
    a_g1 = [g1(u[i]) for i in range(m)]
    b_g1 = [g1(v[i]) for i in range(m)]
    b_g2 = [g2(v[i]) for i in range(m)]
    # h query: tau^i * Z(tau) / delta for i in 0..n-2
    h_g1 = []
    acc = z_tau * delta_inv % p
    for _ in range(n - 1):
        h_g1.append(g1(acc))
        acc = acc * tau % p

    vk = VK(alpha=g1(alpha), beta=g2(beta), gamma=g2(gamma),
            delta=g2(delta), ic=ic, engine=engine)
    pk = ProvingKey(
        alpha_g1=g1(alpha), beta_g1=g1(beta), beta_g2=g2(beta),
        delta_g1=g1(delta), delta_g2=g2(delta),
        a_g1=a_g1, b_g1=b_g1, b_g2=b_g2, l_g1=l_g1, h_g1=h_g1,
    )
    return Parameters(
        vk=vk, pk=pk, r1cs=r1cs,
        const_tracker=list(cs.const_tracker),
        witness_ops=dict(cs.witness_ops),
        n_public=num_input - 1,
        inputize_lcs=[list(lc) for lc in cs.inputize_lcs],
        engine=engine,
    )
