"""PLONK CNum: a field signal as an affine form a*x + b over one wire
variable. Mirror of /root/reference/fawkes-crypto/src/circuit/plonk/num.rs
(lc triple :20, add-of-distinct-vars allocs a var + gate :195-222,
const-folding mul/div :246-294, is_zero/assert_nonzero :48-77).

The same gadget sources (circuit/{bitify,mux,poseidon,ecc,...}.py) run
against this class through the dispatch hooks in circuit/num.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

from ...ff.hostfield import Num


def _as_num(cs, v) -> Num:
    if isinstance(v, Num):
        return v
    if isinstance(v, (bool, int)):
        return Num(cs.fld, int(v))
    raise TypeError(f"cannot coerce {type(v)} to Num")


class CNum:
    __slots__ = ("cs", "value", "lc")

    __kind__ = "num"

    def __init__(self, cs, value: Optional[Num],
                 lc: Tuple[Num, int, Num]):
        self.cs = cs
        self.value = value
        self.lc = lc  # (a, var, b) meaning a*X_var + b

    # --- Signal protocol -----------------------------------------------------
    @staticmethod
    def from_const(cs, value) -> "CNum":
        value = _as_num(cs, value)
        return CNum(cs, value, (Num(cs.fld, 0), 0, value))

    @staticmethod
    def alloc(cs, value=None) -> "CNum":
        v = _as_num(cs, value) if value is not None else None
        return cs.alloc(v)

    def get_value(self) -> Optional[Num]:
        return self.value

    def as_const(self) -> Optional[Num]:
        # num.rs:109-117: pure affine check, no const tracker in PLONK
        if self.lc[0].is_zero():
            return self.lc[2]
        return None

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
        self.cs.enforce_add(
            self, self.derive_const(0), self.derive_const(value)
        )

    def assert_eq(self, other: "CNum"):
        self.cs.enforce_add(self, self.derive_const(0), other)

    def is_eq(self, other: "CNum"):
        return (self - other).is_zero()

    def clone(self) -> "CNum":
        return CNum(self.cs, self.value, self.lc)

    def capacity(self) -> int:
        return 0 if self.lc[0].is_zero() else 1

    # --- assertions and predicates (plonk num.rs:25-103) ----------------------
    def assert_zero(self):
        self.assert_const(0)

    def assert_even(self):
        from ..bitify import c_into_bits_le_strict

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
        self.cs.enforce_mul(self, inv_signal, self.derive_const(1))

    def div_unchecked(self, other: "CNum") -> "CNum":
        # 0/0 tolerated (num.rs:36-46); we pick 0 like the r1cs layer
        sb = other.as_const()
        if sb is not None:
            return self / sb
        value = None
        if self.value is not None and other.value is not None:
            if other.value.is_zero():
                value = Num(self.cs.fld, 0)
            else:
                value = self.value / other.value
        signal = self.derive_alloc(value)
        self.cs.enforce_mul(signal, other, self)
        return signal

    def is_zero(self):
        from .bool import CBool

        c = self.as_const()
        if c is not None:
            return CBool.from_const(self.cs, c.is_zero())
        inv_value = None
        if self.value is not None:
            inv_value = self.value.checked_inv() or Num(self.cs.fld, 1)
        inv_signal = self.derive_alloc(inv_value)
        inv_signal.assert_nonzero()
        res_signal = inv_signal * self
        return (-res_signal + 1).to_bool()

    def assert_bit(self):
        self.cs.enforce_mul(self, self - 1, self.derive_const(0))

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

    # --- arithmetic (num.rs:178-345) ------------------------------------------
    def __neg__(self):
        a, v, b = self.lc
        return CNum(
            self.cs,
            -self.value if self.value is not None else None,
            (-a, v, -b),
        )

    def _add_cnum(self, other: "CNum") -> "CNum":
        cs = self.cs
        ca, cb = self.as_const(), other.as_const()
        if ca is not None:
            a, v, b = other.lc
            value = other.value + ca if other.value is not None else None
            return CNum(cs, value, (a, v, b + ca))
        if cb is not None:
            a, v, b = self.lc
            value = self.value + cb if self.value is not None else None
            return CNum(cs, value, (a, v, b + cb))
        if self.lc[1] == other.lc[1]:
            value = None
            if self.value is not None and other.value is not None:
                value = self.value + other.value
            return CNum(cs, value, (
                self.lc[0] + other.lc[0], self.lc[1],
                self.lc[2] + other.lc[2],
            ))
        value = None
        if self.value is not None and other.value is not None:
            value = self.value + other.value
        var = self.derive_alloc(value)
        cs.enforce_add(self, other, var)
        return var

    def __add__(self, other):
        if isinstance(other, CNum):
            return self._add_cnum(other)
        return self._add_cnum(self.derive_const(other))

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, CNum):
            return self._add_cnum(-other)
        return self._add_cnum(self.derive_const(-_as_num(self.cs, other)))

    def __rsub__(self, other):
        return -self + other

    def _mul_const(self, c: Num) -> "CNum":
        a, v, b = self.lc
        value = self.value * c if self.value is not None else None
        return CNum(self.cs, value, (a * c, v, b * c))

    def __mul__(self, other):
        if not isinstance(other, CNum):
            return self._mul_const(_as_num(self.cs, other))
        ca, cb = self.as_const(), other.as_const()
        if ca is not None:
            return other._mul_const(ca)
        if cb is not None:
            return self._mul_const(cb)
        value = None
        if self.value is not None and other.value is not None:
            value = self.value * other.value
        var = self.derive_alloc(value)
        self.cs.enforce_mul(self, other, var)
        return var

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
        return self.inv() * _as_num(self.cs, other)
