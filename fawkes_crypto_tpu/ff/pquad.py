"""Pallas Fq2 = Fq[u]/(u^2+1) kernels: limbs-first quadratic extension.

Same in-kernel protocol as ff/pfield.PField (f_add/f_sub/f_mul/f_sqr/
f_select/f_is_zero over Python lists of (S, 128) uint32 limb arrays),
but an element occupies 2*K rows: limbs 0..K-1 = c0, K..2K-1 = c1. That
makes ops/pcurve.py's EC kernels field-generic for free — PCurve treats
`pf.k` as the per-coordinate row stride, so a G2 Jacobian point is a
(3*2K, S, 128) tile and the same unified-add bodies compile over Fq2.

Mul is 3 base muls (Karatsuba, u^2 = -1 for the BN254 tower); square is
2 (complex squaring). This is the kernel set VERDICT.md round-1 item #1
asks for: the Groth16 B-query MSM (the one G2 MSM of
/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:80)
runs on-device through these ops instead of the host C++ Pippenger.

Host mirror: native/bn_pairing.py Fq2.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from .hostfield import PrimeField
from .pfield import PField


class PQuadField:
    """Fq2 over a base PField; non-residue u^2 = -1 (BN254 tower).

    Duck-types PField for ops/pcurve.py: `k` is the row count per
    coordinate (2x the base field's), `r_limbs` is Montgomery one
    = (R mod p, 0)."""

    _cache = {}

    def __init__(self, base: PField):
        self.base = base
        self.fld = base.fld
        self.k = 2 * base.k
        self.r_limbs = tuple(base.r_limbs) + (0,) * base.k

    @classmethod
    def get(cls, fld: PrimeField) -> "PQuadField":
        if id(fld) not in cls._cache:
            cls._cache[id(fld)] = cls(PField.get(fld))
        return cls._cache[id(fld)]

    # ---- component split/join ------------------------------------------------
    def _split(self, a: List):
        kb = self.base.k
        return a[:kb], a[kb:]

    # ---- in-kernel ops (lists of 2K (S,128) uint32 arrays) --------------------
    def f_add(self, a: List, b: List) -> List:
        f = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return f.f_add(a0, b0) + f.f_add(a1, b1)

    def f_sub(self, a: List, b: List) -> List:
        f = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return f.f_sub(a0, b0) + f.f_sub(a1, b1)

    def f_neg(self, a: List) -> List:
        f = self.base
        a0, a1 = self._split(a)
        return f.f_neg(a0) + f.f_neg(a1)

    def f_double(self, a: List) -> List:
        return self.f_add(a, a)

    def f_mul(self, a: List, b: List) -> List:
        """Karatsuba: (a0+a1 u)(b0+b1 u) = (a0b0 - a1b1) +
        ((a0+a1)(b0+b1) - a0b0 - a1b1) u — 3 base Montgomery muls."""
        f = self.base
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        t0 = f.f_mul(a0, b0)
        t1 = f.f_mul(a1, b1)
        t2 = f.f_mul(f.f_add(a0, a1), f.f_add(b0, b1))
        c0 = f.f_sub(t0, t1)
        c1 = f.f_sub(t2, f.f_add(t0, t1))
        return c0 + c1

    def f_sqr(self, a: List) -> List:
        """Complex squaring: (a0+a1)(a0-a1) + 2 a0 a1 u — 2 base muls."""
        f = self.base
        a0, a1 = self._split(a)
        c0 = f.f_mul(f.f_add(a0, a1), f.f_sub(a0, a1))
        t = f.f_mul(a0, a1)
        return c0 + f.f_add(t, t)

    def f_select(self, cond, a: List, b: List) -> List:
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]

    def f_is_zero(self, a: List):
        acc = a[0]
        for x in a[1:]:
            acc = acc | x
        return acc == 0
