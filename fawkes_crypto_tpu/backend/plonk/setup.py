"""PLONK keygen: trace the circuit, lay out rows, build selector and
permutation polynomials, commit for the verifier.

The analog of the reference's keygen_vk/keygen_pk over HaloCS
(/root/reference/fawkes-crypto/src/backend/plonk/setup.rs:28-51). Row
layout mirrors the HaloCS synthesize (mod.rs:150-200): one row per
gate, wires x,y,z in columns a,b,c, copy constraints between every pair
of cells sharing a variable; public inputs occupy dedicated leading rows
(the halo2 instance column becomes the standard PLONK PI polynomial).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional

from ...circuit.plonk.cs import BuildCS
from ...engines.bn256 import Fr
from .params import Parameters
from .poly import intt, root_of_unity

# Coset shifts k1, k2 for wire columns 2 and 3 (standard vanilla-PLONK
# choice; 2 is a quadratic non-residue mod r and 3 lies outside both
# cosets for BN254's Fr).
K1 = 2
K2 = 3


@dataclass
class VerifyingKey:
    n: int
    omega: int
    n_public: int
    q_l: tuple
    q_r: tuple
    q_o: tuple
    q_m: tuple
    q_c: tuple
    s1: tuple
    s2: tuple
    s3: tuple
    g2_one: object
    g2_tau: object


@dataclass
class ProvingKey:
    n: int
    omega: int
    n_public: int
    # selector coefficient vectors (length n)
    ql: List[int]
    qr: List[int]
    qo: List[int]
    qm: List[int]
    qc: List[int]
    # wire variable index per (column, row); -1 = padding cell (value 0)
    wires: List[List[int]]
    # sigma evaluation tables: sigma_vals[c][i] = k_{c'} * omega^{i'}
    sigma_vals: List[List[int]]
    # sigma polynomial coefficients (length n each)
    s_coeffs: List[List[int]]
    vk: VerifyingKey


def _trace(circuit: Callable, alloc_pub: Callable, alloc_sec: Callable,
           input_pub=None, input_sec=None, tracking: bool = False) -> BuildCS:
    from ..groth16.setup import inputize_signal

    cs = BuildCS(Fr, tracking=tracking)
    signal_pub = alloc_pub(cs, input_pub)
    inputize_signal(signal_pub)
    signal_sec = alloc_sec(cs, input_sec)
    circuit(signal_pub, signal_sec)
    return cs


def _layout(cs: BuildCS):
    """Rows: one per public input (PI-binding, q_l=1) then one per gate."""
    p = Fr.p
    ell = len(cs.public)
    rows = ell + len(cs.gates)
    n = 1
    while n < rows:
        n <<= 1

    ql = [0] * n
    qr = [0] * n
    qo = [0] * n
    qm = [0] * n
    qc = [0] * n
    wires = [[-1] * n for _ in range(3)]

    for i, v in enumerate(cs.public):
        ql[i] = 1
        wires[0][i] = v
    for j, g in enumerate(cs.gates):
        r = ell + j
        ql[r] = g.a.x % p
        qr[r] = g.b.x % p
        qo[r] = g.c.x % p
        qm[r] = g.d.x % p
        qc[r] = g.e.x % p
        wires[0][r] = g.x
        wires[1][r] = g.y
        wires[2][r] = g.z
    return n, ql, qr, qo, qm, qc, wires


def _permutation(n: int, wires, omega: int):
    """sigma tables from variable cycles. Cell (c, i); id value
    k_c * omega^i; sigma maps each cell to the previous cell of its
    variable's cycle (any fixed rotation works)."""
    p = Fr.p
    ks = (1, K1, K2)
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % p

    var_cells = {}
    for c in range(3):
        wc = wires[c]
        for i in range(n):
            v = wc[i]
            if v >= 0:
                var_cells.setdefault(v, []).append((c, i))

    sigma_vals = [[ks[c] * omega_pows[i] % p for i in range(n)]
                  for c in range(3)]
    for cells in var_cells.values():
        if len(cells) == 1:
            continue
        for idx, (c, i) in enumerate(cells):
            c2, i2 = cells[idx - 1]  # rotate by one
            sigma_vals[c][i] = ks[c2] * omega_pows[i2] % p
    return sigma_vals


def setup(params: Parameters, circuit: Callable, alloc_pub: Callable,
          alloc_sec: Callable) -> ProvingKey:
    """Trace symbolically, build selectors + permutation, commit the
    preprocessed polynomials. Returns the ProvingKey (vk embedded)."""
    from .prover import commit

    cs = _trace(circuit, alloc_pub, alloc_sec)
    n, ql, qr, qo, qm, qc, wires = _layout(cs)
    assert n <= params.n, f"circuit needs domain {n} > SRS 2^{params.k}"
    omega = root_of_unity(Fr, n)
    sigma_vals = _permutation(n, wires, omega)

    p = Fr.p
    s_coeffs = [intt(sv, omega, p) for sv in sigma_vals]
    sel_coeffs = [intt(q, omega, p) for q in (ql, qr, qo, qm, qc)]

    vk = VerifyingKey(
        n=n, omega=omega, n_public=len(cs.public),
        q_l=commit(params, sel_coeffs[0]),
        q_r=commit(params, sel_coeffs[1]),
        q_o=commit(params, sel_coeffs[2]),
        q_m=commit(params, sel_coeffs[3]),
        q_c=commit(params, sel_coeffs[4]),
        s1=commit(params, s_coeffs[0]),
        s2=commit(params, s_coeffs[1]),
        s3=commit(params, s_coeffs[2]),
        g2_one=params.g2_one,
        g2_tau=params.g2_tau,
    )
    return ProvingKey(
        n=n, omega=omega, n_public=len(cs.public),
        ql=ql, qr=qr, qo=qo, qm=qm, qc=qc,
        wires=wires, sigma_vals=sigma_vals, s_coeffs=s_coeffs, vk=vk,
    )
