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


def _device_queries(E, u, v, w, tau, z_tau, alpha, beta, delta_inv,
                    num_input, n):
    """CRS bulk queries on device via batched fixed-base exponentiation
    (ops/fixed_base.py) — the TPU replacement for bellman's per-point
    host loop inside generate_random_parameters (setup.rs:20). Returns
    (a_g1, b_g1, b_g2, l_g1, h_g1) as G1Rows/G2Rows row arrays."""
    import numpy as _np

    from ...ff.jfield import FieldCtx
    from ...ops.fixed_base import FixedBase
    from ...ops.msm import encode_scalars
    from .params import G1Rows, G2Rows

    p = E.fr.p
    G = E.g
    fq_ctx = FieldCtx.get(E.fq)
    m = len(u)
    k = fq_ctx.k

    l_sc = [(beta * u[i] + alpha * v[i] + w[i]) * delta_inv % p
            for i in range(num_input, m)]
    h_sc = [0] * (n - 1)
    acc = z_tau * delta_inv % p
    for i in range(n - 1):
        h_sc[i] = acc
        acc = acc * tau % p

    import jax

    # off-TPU (interpret-mode Pallas; tests) large tables are pathological
    on_tpu = jax.default_backend() == "tpu"

    def run(scalars, g2=False):
        c = (8 if g2 else 16) if on_tpu else 4
        chunk = min(1 << 20, max(128, -(-len(scalars) // 128) * 128))
        base = G.G2_GEN if g2 else G.G1_GEN
        fb = FixedBase(fq_ctx, base, chunk, g2=g2,
                       scalar_bits=E.scalar_bits, c=c, group=G)
        width = (4 if g2 else 2) * k
        out = _np.empty((len(scalars), width), dtype=_np.uint32)
        for i in range(0, len(scalars), chunk):
            part = scalars[i:i + chunk]
            sc = encode_scalars(part, chunk, k)
            rows = _np.asarray(fb.mul_affine_rows(sc))
            out[i:i + chunk] = rows[: len(part)]
        return out

    quad = getattr(G, "Fq2", None)
    return (G1Rows(run(u), E.fq), G1Rows(run(v), E.fq),
            G2Rows(run(v, g2=True), E.fq, quad_cls=quad),
            G1Rows(run(l_sc), E.fq), G1Rows(run(h_sc), E.fq))


def setup(circuit: Callable, alloc_pub: Callable, alloc_sec: Callable,
          seed: Optional[bytes] = None, engine: str = "bn256",
          device: Optional[bool] = None) -> Parameters:
    """Trace the circuit symbolically, build the CRS.

    circuit(pub_signal, sec_signal); alloc_pub/alloc_sec(cs, value_or_None).
    engine: pairing engine name ("bn256" | "bls12_381") — the analog of the
    reference's Parameters<E> type parameter (engines.rs:4-22).
    device: generate the bulk CRS queries on-chip (fixed-base kernels);
    None auto-selects it for large domains on a real TPU. The resulting
    ProvingKey holds G1Rows/G2Rows (device-native row arrays) instead of
    host point lists.
    """
    E = Engine.get(engine)
    Fr = E.fr
    cs = BuildCS(Fr)
    signal_pub = alloc_pub(cs, None)
    inputize_signal(signal_pub)
    signal_sec = alloc_sec(cs, None)
    circuit(signal_pub, signal_sec)

    r1cs = r1cs_from_cs(cs)
    vk, pk = crs_from_r1cs(E, r1cs, seed=seed, device=device,
                           engine=engine)
    return Parameters(
        vk=vk, pk=pk, r1cs=r1cs,
        const_tracker=list(cs.const_tracker),
        witness_ops=dict(cs.witness_ops),
        n_public=r1cs.num_input - 1,
        inputize_lcs=[list(lc) for lc in cs.inputize_lcs],
        engine=engine,
    )


def crs_from_r1cs(E, r1cs, seed=None, device=None, engine="bn256"):
    """CRS construction from a compiled R1CS (shared by setup() and the
    batch-replicated rollup_setup, replicate.py): QAP at tau + the
    fixed-base query exponentiations. Returns (vk, pk)."""
    Fr = E.fr
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
    if device is None:
        import jax

        device = jax.default_backend() == "tpu" and n >= (1 << 14)
    if device:
        a_g1, b_g1, b_g2, l_g1, h_g1 = _device_queries(
            E, u, v, w, tau, z_tau, alpha, beta, delta_inv, num_input, n)
    else:
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
    return vk, pk
