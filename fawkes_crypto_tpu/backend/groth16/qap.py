"""R1CS -> QAP machinery.

Replaces the QAP transform hidden inside bellman's generator/prover
(SURVEY.md §2.4, invoked from
/root/reference/fawkes-crypto/src/backend/bellman_groth16/setup.rs:20 and
prover.rs:80). The R1CS is compiled once from BuildCS gates into static COO
arrays (the TPU-first analog of the reference's brotli gate blob,
cs.rs:184-223); witness-side evaluations are batched matvecs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ...circuit.cs import BuildCS, Gate
from ...circuit.lc import AUX_BASE


@dataclass
class R1CS:
    """Static COO representation of the padded constraint system.

    Wires are globally indexed: 0..num_input-1 = inputs (wire 0 == ONE),
    then num_input..num_input+num_aux-1 = aux. Constraints include the
    bellman-style per-input dummy rows (A=input_i, B=0, C=0) appended after
    the circuit gates so input polynomials are linearly independent.
    """

    num_input: int
    num_aux: int
    num_constraints: int  # gates + num_input
    domain: int  # padded power of two
    # per-matrix COO: rows, cols (global wire), coeffs (canonical ints)
    a_rows: np.ndarray
    a_cols: np.ndarray
    a_vals: List[int]
    b_rows: np.ndarray
    b_cols: np.ndarray
    b_vals: List[int]
    c_rows: np.ndarray
    c_cols: np.ndarray
    c_vals: List[int]

    @property
    def num_wires(self) -> int:
        return self.num_input + self.num_aux


def _global_wire(idx: int, num_input: int) -> int:
    if idx >= AUX_BASE:
        return num_input + (idx - AUX_BASE)
    return idx


def r1cs_from_cs(cs: BuildCS) -> R1CS:
    num_input = cs.num_input()
    num_aux = cs.num_aux()
    n_gates = len(cs.gates)
    n_constraints = n_gates + num_input
    domain = 1 << max(1, (n_constraints - 1).bit_length())

    ar, ac, av = [], [], []
    br, bc, bv = [], [], []
    cr, cc, cv = [], [], []
    for j, g in enumerate(cs.gates):
        for coeff, idx in g.a:
            ar.append(j)
            ac.append(_global_wire(idx, num_input))
            av.append(coeff)
        for coeff, idx in g.b:
            br.append(j)
            bc.append(_global_wire(idx, num_input))
            bv.append(coeff)
        for coeff, idx in g.c:
            cr.append(j)
            cc.append(_global_wire(idx, num_input))
            cv.append(coeff)
    # bellman-style input rows: A = input_i * 0 = 0
    for i in range(num_input):
        ar.append(n_gates + i)
        ac.append(i)
        av.append(1)

    return R1CS(
        num_input=num_input,
        num_aux=num_aux,
        num_constraints=n_constraints,
        domain=domain,
        a_rows=np.asarray(ar, dtype=np.int64),
        a_cols=np.asarray(ac, dtype=np.int64),
        a_vals=av,
        b_rows=np.asarray(br, dtype=np.int64),
        b_cols=np.asarray(bc, dtype=np.int64),
        b_vals=bv,
        c_rows=np.asarray(cr, dtype=np.int64),
        c_cols=np.asarray(cc, dtype=np.int64),
        c_vals=cv,
    )


def _batch_inv(vals, p):
    """Montgomery batch inversion: one pow + 3 muls per element."""
    n = len(vals)
    pref = [1] * (n + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % p
    inv = pow(pref[n], -1, p)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = pref[i] * inv % p
        inv = inv * vals[i] % p
    return out


def eval_qap_at_tau(r1cs: R1CS, tau: int, p: int, omega: int):
    """Host evaluation of u_i(tau), v_i(tau), w_i(tau) over the Lagrange
    basis of the radix-2 domain (setup-time only; prover never needs tau).

    L_j(tau) = Z(tau) * omega^j / (N * (tau - omega^j)).
    """
    n = r1cs.domain
    z_tau = (pow(tau, n, p) - 1) % p
    nc = r1cs.num_constraints
    # lagrange values for rows that actually appear; denominators
    # batch-inverted (one pow + 3 muls each instead of a pow each)
    w_pow = 1
    pows = []
    for j in range(min(n, nc)):
        pows.append(w_pow)
        w_pow = (w_pow * omega) % p
    denoms = [(tau - pows[j]) % p * n % p for j in range(nc)]
    dinv = _batch_inv(denoms, p)
    lag = [z_tau * pows[j] % p * dinv[j] % p for j in range(nc)]

    m = r1cs.num_wires
    u = [0] * m
    v = [0] * m
    w = [0] * m
    for rows, cols, vals, out in (
        (r1cs.a_rows, r1cs.a_cols, r1cs.a_vals, u),
        (r1cs.b_rows, r1cs.b_cols, r1cs.b_vals, v),
        (r1cs.c_rows, r1cs.c_cols, r1cs.c_vals, w),
    ):
        for r, c, val in zip(rows, cols, vals):
            out[c] = (out[c] + val * lag[int(r)]) % p
    return u, v, w, z_tau


def sparse_matvec(rows, cols, vals, z: List[int], n_rows: int, p: int):
    """Host oracle: (M z) over Fp; returns dense list of length n_rows."""
    out = [0] * n_rows
    for r, c, v in zip(rows, cols, vals):
        out[r] = (out[r] + v * z[c]) % p
    return out
