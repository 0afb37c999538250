"""CBool: boolean signal over CNum.

Mirror of /root/reference/fawkes-crypto/src/circuit/r1cs/bool.rs:12-238:
and = mul, or via De Morgan, xor = !is_eq, is_eq via the single-gate
(2a-1)(2b-1)=(2c-1) trick.
"""

from __future__ import annotations

from typing import Optional

from ..ff.hostfield import Num
from .cs import BaseCS, WitnessOp
from .num import CNum, _records


class CBool:
    __slots__ = ("num",)

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
    def from_const(cs: BaseCS, value: bool) -> "CBool":
        return CBool.new_unchecked(CNum.from_const(cs, bool(value)))

    @staticmethod
    def alloc(cs: BaseCS, value: Optional[bool] = None) -> "CBool":
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
        self.cs.enforce(
            self.to_num(),
            CNum.from_const(self.cs, 1),
            CNum.from_const(self.cs, bool(value)),
        )

    def assert_eq(self, other: "CBool"):
        self.to_num().assert_eq(other.to_num())

    def is_eq(self, other: "CBool") -> "CBool":
        # single gate: (2a-1)(2b-1)=(2c-1) (bool.rs:91-103)
        value = None
        if self.get_value() is not None and other.get_value() is not None:
            value = self.get_value() == other.get_value()
        signal = CBool.alloc(self.cs, value)
        # NOTE: CBool::alloc in the reference routes through CBool::new which
        # adds the bit constraint; bool.rs:91 allocs via derive_alloc::<CBool>
        # which is the same path.
        a = self.to_num() * 2 - 1
        b = other.to_num() * 2 - 1
        c = signal.to_num() * 2 - 1
        if _records(self.cs):
            inv2 = pow(2, -1, self.cs.fld.p)
            b_half = other.to_num() - Num(self.cs.fld, inv2)
            self.cs.record_op(WitnessOp(
                "mul", next(iter(signal.num.lc.terms)),
                a=a.lc.to_vec(), b=b_half.lc.to_vec(), aux=inv2))
        self.cs.enforce(a, b, c)
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
