"""Linear combinations over wire indices.

TPU-first rethink of /root/reference/fawkes-crypto/src/circuit/r1cs/lc.rs:10-196:
the reference keeps a sorted linked list per LC; we use a Python dict keyed by
an integer wire index (Input(i) -> i, Aux(i) -> AUX_BASE + i, preserving the
reference's Input < Aux ordering when sorted). LCs exist only while tracing —
at prove time the circuit is compiled to static COO arrays and LCs are gone
(the analog of the reference's ZeroLC witness replay, cs.rs:98-123).
"""

from __future__ import annotations

AUX_BASE = 1 << 40
INPUT0 = 0  # Index::Input(0) == the constant ONE wire


def input_idx(i: int) -> int:
    return i


def aux_idx(i: int) -> int:
    return AUX_BASE + i


def is_aux(key: int) -> bool:
    return key >= AUX_BASE


class LC:
    """Sparse linear combination {wire: coeff}; coeffs canonical ints mod p."""

    __slots__ = ("p", "terms")

    def __init__(self, p: int, terms: dict | None = None):
        self.p = p
        self.terms = terms if terms is not None else {}

    @staticmethod
    def from_index(p: int, index: int) -> "LC":
        return LC(p, {index: 1})

    @staticmethod
    def from_parts(p: int, value: int, index: int) -> "LC":
        value %= p
        return LC(p, {index: value} if value else {})

    def copy(self) -> "LC":
        return LC(self.p, dict(self.terms))

    def is_empty(self) -> bool:
        return not self.terms

    def as_const(self):
        """Some(coeff) iff empty (0) or single term on Input(0)
        (reference lc.rs:69-82)."""
        n = len(self.terms)
        if n == 0:
            return 0
        if n == 1 and INPUT0 in self.terms:
            return self.terms[INPUT0]
        return None

    def capacity(self) -> int:
        return len(self.terms)

    def add_assign(self, other: "LC"):
        t, p = self.terms, self.p
        for k, v in other.terms.items():
            nv = (t.get(k, 0) + v) % p
            if nv:
                t[k] = nv
            else:
                t.pop(k, None)

    def sub_assign(self, other: "LC"):
        t, p = self.terms, self.p
        for k, v in other.terms.items():
            nv = (t.get(k, 0) - v) % p
            if nv:
                t[k] = nv
            else:
                t.pop(k, None)

    def mul_assign(self, c: int):
        c %= self.p
        if c == 0:
            self.terms = {}
        else:
            p = self.p
            self.terms = {k: (v * c) % p for k, v in self.terms.items()}

    def neg(self) -> "LC":
        p = self.p
        return LC(p, {k: p - v for k, v in self.terms.items()})

    def to_vec(self):
        """Sorted (coeff, index) pairs, Input-first order like the reference."""
        return [(v, k) for k, v in sorted(self.terms.items())]
