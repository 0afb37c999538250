"""PLONK constraint system: the single custom gate

    a*x + b*y + c*z + d*x*y + e == 0

over three wire variables x, y, z (indices) with constant selectors
a..e. Mirror of /root/reference/fawkes-crypto/src/circuit/plonk/cs.rs:20-179
(Gate :20-30, BuildCS :60-179, enforce_mul/enforce_add fusion of affine
forms into one gate :112-154, inputize :156-166).
"""

from __future__ import annotations

from typing import List, Optional

from ...ff.hostfield import Num, PrimeField


class Gate:
    """a*x + b*y + c*z + d*x*y + e == 0; coefficients are Num, wires are
    variable indices into BuildCS.values."""

    __slots__ = ("a", "x", "b", "y", "c", "z", "d", "e")

    def __init__(self, a: Num, x: int, b: Num, y: int, c: Num, z: int,
                 d: Num, e: Num):
        self.a = a
        self.x = x
        self.b = b
        self.y = y
        self.c = c
        self.z = z
        self.d = d
        self.e = e


class BuildCS:
    """Records gates during synthesis; doubles as the witness container
    when signals are allocated with concrete values (the reference's
    plonk prove() re-runs the circuit on a value-carrying BuildCS,
    backend/plonk/prover.rs:56-66)."""

    def __init__(self, fld: PrimeField, tracking: bool = False):
        self.fld = fld
        self.values: List[Optional[Num]] = []
        self.gates: List[Gate] = []
        self.tracking = tracking
        self.public: List[int] = []

    # ---- counters (cs.rs:85-103) -------------------------------------------
    def num_gates(self) -> int:
        return len(self.gates)

    def num_input(self) -> int:
        return len(self.public)

    def num_aux(self) -> int:
        return len(self.values) - len(self.public)

    def get_value(self, index: int) -> Optional[Num]:
        return self.values[index]

    # ---- const-tracker hooks: no-ops for PLONK (cs.rs:53-57) ----------------
    def const_tracker_before(self) -> Optional[bool]:
        return None

    def const_tracker_after(self, v: bool):
        pass

    # ---- gate emission -------------------------------------------------------
    def enforce_mul(self, x, y, z):
        """x * y == z over affine forms (cs.rs:112-135)."""
        if self.tracking and (x.value is not None and y.value is not None
                              and z.value is not None):
            assert x.value * y.value == z.value, "Not satisfied constraint"
        xa, xv, xb = x.lc
        ya, yv, yb = y.lc
        za, zv, zb = z.lc
        self.gates.append(Gate(
            a=xa * yb, x=xv,
            b=xb * ya, y=yv,
            c=-za, z=zv,
            d=xa * ya,
            e=xb * yb - zb,
        ))

    def enforce_add(self, x, y, z):
        """x + y == z over affine forms (cs.rs:137-154)."""
        if self.tracking and (x.value is not None and y.value is not None
                              and z.value is not None):
            assert x.value + y.value == z.value, "Not satisfied constraint"
        xa, xv, xb = x.lc
        ya, yv, yb = y.lc
        za, zv, zb = z.lc
        zero = Num(self.fld, 0)
        self.gates.append(Gate(
            a=xa, x=xv,
            b=ya, y=yv,
            c=-za, z=zv,
            d=zero,
            e=xb + yb - zb,
        ))

    def inputize(self, n):
        """Record a public variable (cs.rs:156-166); non-canonical affine
        forms are rebased through a fresh variable first."""
        one = Num(self.fld, 1)
        if n.lc[0] == one and n.lc[2].is_zero():
            v = n.lc[1]
        else:
            m = n.derive_alloc(n.value)
            m.assert_eq(n)
            v = m.lc[1]
        self.public.append(v)

    def alloc(self, value: Optional[Num]):
        from .num import CNum

        v = len(self.values)
        self.values.append(value)
        return CNum(self, value, (Num(self.fld, 1), v, Num(self.fld, 0)))
