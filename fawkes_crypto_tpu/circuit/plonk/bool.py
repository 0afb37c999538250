"""PLONK CBool over the affine CNum.

Mirror of /root/reference/fawkes-crypto/src/circuit/plonk/bool.rs:12-249:
and = mul, or via De Morgan, xor = !is_eq, is_eq via the single
(2a-1)(2b-1)=(2c-1) enforce_mul gate (:104-117).

Deviation from the reference (documented): plonk/bool.rs:79-82 allocs
booleans with `new_unchecked` (no bit constraint), which leaves gadget
bit-decompositions unconstrained; we use `new` (assert_bit) like the
r1cs layer (r1cs/bool.rs:68-71) for soundness.
"""

from __future__ import annotations

from typing import Optional

from ...ff.hostfield import Num
from .num import CNum


class CBool:
    __slots__ = ("num",)

    __kind__ = "bool"

    def __init__(self, num: CNum):
        self.num = num

    @staticmethod
    def new_unchecked(n: CNum) -> "CBool":
        return CBool(n.clone())

    @staticmethod
    def new(n: CNum) -> "CBool":
        n.assert_bit()
        return CBool.new_unchecked(n)

    def to_num(self) -> CNum:
        return self.num.clone()

    def as_num(self) -> CNum:
        return self.num

    @property
    def cs(self):
        return self.num.cs

    def capacity(self) -> int:
        return 0

    def clone(self) -> "CBool":
        return CBool(self.num.clone())

    # --- Signal protocol ---------------------------------------------------
    @staticmethod
    def from_const(cs, value: bool) -> "CBool":
        return CBool.new_unchecked(CNum.from_const(cs, bool(value)))

    @staticmethod
    def alloc(cs, value: Optional[bool] = None) -> "CBool":
        v = None if value is None else Num(cs.fld, int(bool(value)))
        return CBool.new(CNum.alloc(cs, v))

    def as_const(self) -> Optional[bool]:
        v = self.num.as_const()
        if v is None:
            return None
        return v == 1

    def get_value(self) -> Optional[bool]:
        if self.num.value is None:
            return None
        v = self.num.value
        if v.is_zero():
            return False
        if v == 1:
            return True
        raise ValueError("Wrong boolean value")

    def inputize(self):
        self.num.inputize()

    def derive_const(self, value) -> "CBool":
        return CBool.from_const(self.cs, value)

    def switch(self, bit: "CBool", if_else: "CBool") -> "CBool":
        return self.to_num().switch(bit, if_else.to_num()).to_bool_unchecked()

    def assert_const(self, value: bool):
        self.cs.enforce_add(
            self.to_num(),
            CNum.from_const(self.cs, 0),
            CNum.from_const(self.cs, bool(value)),
        )

    def assert_eq(self, other: "CBool"):
        self.to_num().assert_eq(other.to_num())

    def is_eq(self, other: "CBool") -> "CBool":
        # single gate: (2a-1)(2b-1)=(2c-1) (plonk bool.rs:104-117)
        value = None
        if self.get_value() is not None and other.get_value() is not None:
            value = self.get_value() == other.get_value()
        signal = CBool.alloc(self.cs, value)
        a = self.to_num() * 2 - 1
        b = other.to_num() * 2 - 1
        c = signal.to_num() * 2 - 1
        self.cs.enforce_mul(a, b, c)
        return signal

    # --- boolean algebra ----------------------------------------------------
    def __invert__(self) -> "CBool":
        return (1 - self.to_num()).to_bool_unchecked()

    def __and__(self, other) -> "CBool":
        if isinstance(other, bool):
            other = self.derive_const(other)
        return (self.to_num() * other.to_num()).to_bool_unchecked()

    __rand__ = __and__

    def __or__(self, other) -> "CBool":
        if isinstance(other, bool):
            other = self.derive_const(other)
        return ~(~self & ~other)

    __ror__ = __or__

    def __xor__(self, other) -> "CBool":
        if isinstance(other, bool):
            other = self.derive_const(other)
        return ~self.is_eq(other)

    __rxor__ = __xor__
