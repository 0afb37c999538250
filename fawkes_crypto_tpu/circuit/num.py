"""CNum: field signal with lazy constraint emission.

Faithful semantic mirror of /root/reference/fawkes-crypto/src/circuit/r1cs/num.rs:19-407
(constraint counts must match the reference exactly — 255/513/2296/7328/3860),
plus witness-program recording (WitnessOp) so witness generation can run as a
compiled batched TPU program instead of a per-proof DSL replay.

Convention: `as_const()` is called in the reference everywhere a `match
(self.as_const(), other.as_const())` appears; the const-tracker bits recorded
at build time are consumed in the identical order at witness-replay time, so
every as_const call site here preserves the reference's call order.
"""

from __future__ import annotations

from typing import Optional

from ..ff.hostfield import Num
from .cs import BaseCS, WitnessOp
from .lc import INPUT0, LC


def _as_num(cs: BaseCS, v) -> Num:
    if isinstance(v, Num):
        return v
    if isinstance(v, bool):
        return Num(cs.fld, int(v))
    if isinstance(v, int):
        return Num(cs.fld, v)
    raise TypeError(f"cannot coerce {type(v)} to Num")


def _records(cs) -> bool:
    return getattr(cs, "witness_ops", None) is not None


class CNum:
    __slots__ = ("cs", "value", "lc")

    def __init__(self, cs: BaseCS, value: Optional[Num], lc: Optional[LC]):
        self.cs = cs
        self.value = value
        self.lc = lc

    # --- Signal protocol --------------------------------------------------
    # from_const/alloc dispatch on the CS: a CS carrying its own signal
    # classes (the PLONK variant, circuit/plonk/cs.py) gets them instead —
    # this lets the shared gadget sources compile against either CS, the
    # analog of the reference's cfg-gated module swap (circuit/mod.rs:1-11).
    @staticmethod
    def from_const(cs: BaseCS, value) -> "CNum":
        alt = getattr(cs, "_signal_num_cls", None)
        if alt is not None and alt is not CNum:
            return alt.from_const(cs, value)
        value = _as_num(cs, value)
        lc = None
        if not isinstance_witness(cs):
            lc = LC.from_parts(cs.fld.p, value.x, INPUT0)
        return CNum(cs, value, lc)

    @staticmethod
    def alloc(cs: BaseCS, value=None) -> "CNum":
        alt = getattr(cs, "_signal_num_cls", None)
        if alt is not None and alt is not CNum:
            return alt.alloc(cs, value)
        v = _as_num(cs, value) if value is not None else None
        return cs.alloc(v)

    def get_value(self) -> Optional[Num]:
        return self.value

    def as_const(self) -> Optional[Num]:
        # reference num.rs:111-126
        tracked = self.cs.const_tracker_before()
        if tracked is not None:
            return self.get_value() if tracked else None
        res = self.lc.as_const()
        self.cs.const_tracker_after(res is not None)
        return None if res is None else Num(self.cs.fld, res)

    def inputize(self):
        self.cs.inputize(self)

    def derive_const(self, value) -> "CNum":
        return CNum.from_const(self.cs, value)

    def derive_alloc(self, value) -> "CNum":
        return CNum.alloc(self.cs, value)

    def switch(self, bit, if_else: "CNum") -> "CNum":
        b = bit.as_const()
        if b is not None:
            return self.clone() if b else if_else.clone()
        return if_else + (self - if_else) * bit.to_num()

    def assert_const(self, value):
        self.cs.enforce(self, self.derive_const(1), self.derive_const(value))

    def assert_eq(self, other: "CNum"):
        self.cs.enforce(self, self.derive_const(1), other)

    def is_eq(self, other: "CNum"):
        return (self - other).is_zero()

    def clone(self) -> "CNum":
        return CNum(self.cs, self.value, self.lc.copy() if self.lc else None)

    def capacity(self) -> int:
        return self.lc.capacity() if self.lc else 0

    # --- assertions and predicates (num.rs:27-103) ------------------------
    def assert_zero(self):
        self.assert_const(0)

    def assert_even(self):
        from .bitify import c_into_bits_le_strict

        bits = c_into_bits_le_strict(self)
        bits[0].assert_const(False)

    def assert_nonzero(self):
        v = self.as_const()
        if v is not None:
            assert not v.is_zero()
            return
        inv_value = None
        if self.value is not None:
            inv_value = self.value.checked_inv() or Num(self.cs.fld, 1)
        inv_signal = self.derive_alloc(inv_value)
        if _records(self.cs):
            self.cs.record_op(WitnessOp(
                "inv_or", next(iter(inv_signal.lc.terms)),
                a=self.lc.to_vec(), aux=1))
        self.cs.enforce(self, inv_signal, self.derive_const(1))

    def div_unchecked(self, other: "CNum") -> "CNum":
        # 0/0 tolerated: any value valid (num.rs:37-47); we pick 0
        sa, sb = self.as_const(), other.as_const()
        if sb is not None:
            return self / sb
        value = None
        if self.value is not None and other.value is not None:
            if other.value.is_zero():
                value = Num(self.cs.fld, 0)
            else:
                value = self.value / other.value
        signal = self.derive_alloc(value)
        if _records(self.cs):
            self.cs.record_op(WitnessOp(
                "div", next(iter(signal.lc.terms)),
                a=self.lc.to_vec(), b=other.lc.to_vec()))
        self.cs.enforce(signal, other, self)
        return signal

    def is_zero(self):
        from .bool import CBool

        c = self.as_const()
        if c is not None:
            return CBool.from_const(self.cs, c.is_zero())
        inv_value = None
        if self.value is not None:
            inv_value = self.value.checked_inv() or Num(self.cs.fld, 0)
        inv_signal = self.derive_alloc(inv_value)
        if _records(self.cs):
            self.cs.record_op(WitnessOp(
                "inv_or", next(iter(inv_signal.lc.terms)),
                a=self.lc.to_vec(), aux=0))
        res_signal = -inv_signal * self + 1
        (res_signal * self).assert_zero()
        return CBool.new_unchecked(res_signal)

    def assert_bit(self):
        self.cs.enforce(self, self - 1, self.derive_const(0))

    def to_bool(self):
        from .bool import CBool

        return CBool.new(self)

    def to_bool_unchecked(self):
        from .bool import CBool

        return CBool.new_unchecked(self)

    def inv(self) -> "CNum":
        return self.derive_const(1) / self

    def square(self) -> "CNum":
        return self * self

    # --- arithmetic --------------------------------------------------------
    def __neg__(self):
        return CNum(
            self.cs,
            -self.value if self.value is not None else None,
            self.lc.neg() if self.lc is not None else None,
        )

    def _add_cnum(self, other: "CNum") -> "CNum":
        value = None
        if self.value is not None and other.value is not None:
            value = self.value + other.value
        lc = None
        if self.lc is not None:
            lc = self.lc.copy()
            lc.add_assign(other.lc)
        return CNum(self.cs, value, lc)

    def _sub_cnum(self, other: "CNum") -> "CNum":
        value = None
        if self.value is not None and other.value is not None:
            value = self.value - other.value
        lc = None
        if self.lc is not None:
            lc = self.lc.copy()
            lc.sub_assign(other.lc)
        return CNum(self.cs, value, lc)

    def __add__(self, other):
        if isinstance(other, CNum):
            return self._add_cnum(other)
        return self._add_cnum(self.derive_const(other))

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, CNum):
            return self._sub_cnum(other)
        return self._sub_cnum(self.derive_const(other))

    def __rsub__(self, other):
        return -self + other

    def _mul_const(self, c: Num) -> "CNum":
        # MulAssign<&Num> (num.rs:231-239): no as_const, no tracker
        if c.is_zero():
            return self.derive_const(0)
        value = self.value * c if self.value is not None else None
        lc = None
        if self.lc is not None:
            lc = self.lc.copy()
            lc.mul_assign(c.x)
        return CNum(self.cs, value, lc)

    def __mul__(self, other):
        if not isinstance(other, CNum):
            return self._mul_const(_as_num(self.cs, other))
        # num.rs:253-272: both as_const always evaluated
        sa, sb = self.as_const(), other.as_const()
        if sa is not None:
            return other._mul_const(sa)
        if sb is not None:
            return self._mul_const(sb)
        value = None
        if self.value is not None and other.value is not None:
            value = self.value * other.value
        signal = self.derive_alloc(value)
        if _records(self.cs):
            self.cs.record_op(WitnessOp(
                "mul", next(iter(signal.lc.terms)),
                a=self.lc.to_vec(), b=other.lc.to_vec()))
        self.cs.enforce(self, other, signal)
        return signal

    __rmul__ = __mul__

    def __truediv__(self, other):
        if not isinstance(other, CNum):
            c = _as_num(self.cs, other)
            inv = c.checked_inv()
            assert inv is not None, "Division by zero"
            return self._mul_const(inv)
        other.assert_nonzero()
        return self.div_unchecked(other)

    def __rtruediv__(self, other):
        # Num / CNum = other * self.inv() (num.rs:385-392)
        return self.inv() * _as_num(self.cs, other)


def isinstance_witness(cs) -> bool:
    from .cs import WitnessCS

    return isinstance(cs, WitnessCS)
