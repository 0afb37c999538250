"""Host polynomial arithmetic over Fr for the PLONK prover.

Coefficient vectors are Python int lists (canonical form). Sizes in the
test circuits stay <= 2^17, where exact host NTTs are adequate; the
device LNTT (ops/lntt.py) is the upgrade path for production domains.
"""

from __future__ import annotations

from typing import List


def bitrev_indices(n: int) -> List[int]:
    bits = n.bit_length() - 1
    out = [0] * n
    for i in range(n):
        r = 0
        x = i
        for _ in range(bits):
            r = (r << 1) | (x & 1)
            x >>= 1
        out[i] = r
    return out


def ntt(vals: List[int], w: int, p: int) -> List[int]:
    """In-place iterative radix-2 NTT, natural order in/out."""
    n = len(vals)
    assert n & (n - 1) == 0
    a = list(vals)
    rev = bitrev_indices(n)
    for i in range(n):
        j = rev[i]
        if i < j:
            a[i], a[j] = a[j], a[i]
    length = 2
    while length <= n:
        wlen = pow(w, n // length, p)
        half = length >> 1
        for start in range(0, n, length):
            acc = 1
            for j in range(start, start + half):
                u = a[j]
                v = a[j + half] * acc % p
                a[j] = (u + v) % p
                a[j + half] = (u - v) % p
                acc = acc * wlen % p
        length <<= 1
    return a


def intt(vals: List[int], w: int, p: int) -> List[int]:
    n = len(vals)
    out = ntt(vals, pow(w, -1, p), p)
    ninv = pow(n, -1, p)
    return [v * ninv % p for v in out]


def root_of_unity(fld, n: int) -> int:
    logn = n.bit_length() - 1
    assert (1 << logn) == n and logn <= fld.s
    return pow(fld.root_of_unity, 1 << (fld.s - logn), fld.p)


def coset_eval(coeffs: List[int], m: int, shift: int, fld) -> List[int]:
    """Evaluate poly (deg < m) on the coset {shift * w_m^i}."""
    p = fld.p
    assert len(coeffs) <= m
    scaled = []
    acc = 1
    for c in coeffs:
        scaled.append(c * acc % p)
        acc = acc * shift % p
    scaled += [0] * (m - len(scaled))
    return ntt(scaled, root_of_unity(fld, m), p)


def coset_interp(evals: List[int], shift: int, fld) -> List[int]:
    """Inverse of coset_eval: evaluations on {shift * w_m^i} -> coeffs."""
    p = fld.p
    m = len(evals)
    coeffs = intt(evals, root_of_unity(fld, m), p)
    sinv = pow(shift, -1, p)
    acc = 1
    out = []
    for c in coeffs:
        out.append(c * acc % p)
        acc = acc * sinv % p
    return out


def poly_eval(coeffs: List[int], x: int, p: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def poly_add(a: List[int], b: List[int], p: int) -> List[int]:
    if len(a) < len(b):
        a, b = b, a
    out = list(a)
    for i, v in enumerate(b):
        out[i] = (out[i] + v) % p
    return out


def poly_scale(a: List[int], c: int, p: int) -> List[int]:
    return [v * c % p for v in a]


def poly_mul_zh(a: List[int], n: int, p: int) -> List[int]:
    """a(X) * (X^n - 1)."""
    out = [0] * (len(a) + n)
    for i, v in enumerate(a):
        out[i + n] = (out[i + n] + v) % p
        out[i] = (out[i] - v) % p
    return out


def div_by_linear(coeffs: List[int], zeta: int, p: int) -> List[int]:
    """(poly - poly(zeta)) / (X - zeta) via synthetic division; asserts
    exact division when poly(zeta) == 0."""
    out = [0] * (len(coeffs) - 1)
    acc = 0
    for i in range(len(coeffs) - 1, 0, -1):
        acc = (acc * zeta + coeffs[i]) % p
        out[i - 1] = acc
    return out
