"""Native (out-of-circuit) twisted-Edwards / Montgomery curve ops for the
embedded jubjub-style curve (cofactor 8), host scalar path.

Mirrors /root/reference/fawkes-crypto/src/native/ecc.rs:11-353 semantically
(Hisil et al. extended coordinates, double-and-add), with Python ints. The
batched witness-generation path lives in ops/jubjub.py (JAX); this module is
the oracle it is tested against.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..ff.hostfield import Num, PrimeField


@dataclass
class JubJubParams:
    fr: PrimeField  # base field (the SNARK scalar field)
    fs: PrimeField  # subgroup scalar field
    edwards_g: "EdwardsPoint"
    edwards_d: Num
    montgomery_a: Num
    montgomery_b: Num
    montgomery_u: Num
    # registry name for serializable witness hints (circuit/hints.py)
    name: str = "jubjub_bn256"


class EdwardsPoint:
    __slots__ = ("x", "y")

    def __init__(self, x: Num, y: Num):
        self.x = x
        self.y = y

    def __eq__(self, o):
        return isinstance(o, EdwardsPoint) and self.x == o.x and self.y == o.y

    def __repr__(self):
        return f"EdwardsPoint({self.x.x}, {self.y.x})"

    @staticmethod
    def zero(fr: PrimeField) -> "EdwardsPoint":
        return EdwardsPoint(Num(fr, 0), Num(fr, 1))

    def is_zero(self) -> bool:
        return self.x.is_zero() and self.y == 1

    def negate(self) -> "EdwardsPoint":
        return EdwardsPoint(-self.x, self.y)

    @staticmethod
    def get_for_y(y: Num, sign: bool, params: JubJubParams):
        # reference native/ecc.rs:57-70
        y2 = y.square()
        t = (y2 - 1) / (params.edwards_d * y2 + 1)
        x = t.sqrt()
        if x is None:
            return None
        if x.is_odd() != sign:
            x = -x
        return EdwardsPoint(x, y)

    @staticmethod
    def subgroup_decompress(x: Num, params: JubJubParams):
        # reference native/ecc.rs:71-92: recover y, check order by mul by Fs modulus
        x2 = x.square()
        t = ((x2 + 1) / (1 - params.edwards_d * x2)).sqrt()
        if t is None:
            return None
        y = t
        l = EdwardsPoint(x, y).into_extended().mul(params.fs.p, params).into_affine()
        if l.x.is_zero():
            if l.y == 1:
                return EdwardsPoint(x, y)
            return EdwardsPoint(x, -y)
        return None

    @staticmethod
    def from_scalar_raw(t: Num, montgomery_a: Num, montgomery_b: Num,
                        montgomery_u: Num, params: "JubJubParams" = None) -> "EdwardsPoint":
        """Deterministic hash-to-curve (reference native/ecc.rs:103-132)."""

        def g(x):
            return (x.square() * (x + montgomery_a) + x) / montgomery_b

        t2g1 = t.square() * montgomery_u
        x2 = -1 / montgomery_a * (1 + t2g1.checked_inv())
        y2 = g(x2).sqrt()
        if y2 is not None:
            mx, my = x2, y2
        else:
            x3 = x2 * t2g1
            mx, my = x3, g(x3).sqrt()
        if (my * t).is_odd():
            my = -my
        return (
            MontgomeryPoint(mx, my).into_edwards_ex().mul_by_cofactor().into_affine()
        )

    @staticmethod
    def from_scalar(t: Num, params: JubJubParams) -> "EdwardsPoint":
        return EdwardsPoint.from_scalar_raw(
            t, params.montgomery_a, params.montgomery_b, params.montgomery_u
        )

    @staticmethod
    def rand(rng, params: JubJubParams) -> "EdwardsPoint":
        """rng: callable returning (Num<fr>, bool) candidates."""
        while True:
            y, sign = rng()
            p = EdwardsPoint.get_for_y(y, sign, params)
            if p is not None:
                return p

    def mul(self, scalar, params: JubJubParams) -> "EdwardsPoint":
        return self.into_extended().mul(scalar, params).into_affine()

    def add(self, other: "EdwardsPoint", params: JubJubParams) -> "EdwardsPoint":
        return (
            self.into_extended().add(other.into_extended(), params).into_affine()
        )

    def double(self) -> "EdwardsPoint":
        return self.into_extended().double().into_affine()

    def mul_by_cofactor(self) -> "EdwardsPoint":
        return self.into_extended().mul_by_cofactor().into_affine()

    def is_in_curve(self, params: JubJubParams) -> bool:
        x2 = self.x.square()
        y2 = self.y.square()
        return y2 - x2 == 1 + params.edwards_d * x2 * y2

    def into_montgomery(self, fr: PrimeField = None):
        # reference native/ecc.rs:182-199
        if self.x.is_zero():
            if self.y == 1:
                return None
            return MontgomeryPoint(Num(self.x.fld, 0), Num(self.x.fld, 0))
        m_x = (1 + self.y) / (1 - self.y)
        m_y = m_x / self.x
        return MontgomeryPoint(m_x, m_y)

    def into_extended(self) -> "EdwardsPointEx":
        return EdwardsPointEx(self.x, self.y, self.x * self.y, Num(self.x.fld, 1))


class MontgomeryPoint:
    __slots__ = ("x", "y")

    def __init__(self, x: Num, y: Num):
        self.x = x
        self.y = y

    def __eq__(self, o):
        return isinstance(o, MontgomeryPoint) and self.x == o.x and self.y == o.y

    def into_edwards(self) -> EdwardsPoint:
        # reference native/ecc.rs:203-216
        fld = self.x.fld
        if self.x.is_zero():
            return EdwardsPoint(Num(fld, 0), Num(fld, -1))
        e_x = self.x / self.y
        e_y = (self.x - 1) / (self.x + 1)
        return EdwardsPoint(e_x, e_y)

    def into_edwards_ex(self) -> "EdwardsPointEx":
        return self.into_edwards().into_extended()


class EdwardsPointEx:
    """Extended coordinates (x, y, t, z), Hisil et al. formulas."""

    __slots__ = ("x", "y", "t", "z")

    def __init__(self, x, y, t, z):
        self.x = x
        self.y = y
        self.t = t
        self.z = z

    def __eq__(self, o):
        return (
            isinstance(o, EdwardsPointEx)
            and self.x * o.z == o.x * self.z
            and self.y * o.z == o.y * self.z
        )

    @staticmethod
    def zero(fr: PrimeField) -> "EdwardsPointEx":
        return EdwardsPointEx(Num(fr, 0), Num(fr, 1), Num(fr, 0), Num(fr, 1))

    def is_zero(self) -> bool:
        return self.x.is_zero() and self.y == self.z

    def negate(self) -> "EdwardsPointEx":
        return EdwardsPointEx(-self.x, self.y, -self.t, self.z)

    def is_in_curve(self, params: JubJubParams) -> bool:
        return (
            not self.z.is_zero()
            and self.z * self.t == self.x * self.y
            and self.y.square() - self.x.square()
            == self.z.square() + params.edwards_d * self.t.square()
        )

    def mul_by_cofactor(self) -> "EdwardsPointEx":
        return self.double().double().double()

    def into_affine(self) -> EdwardsPoint:
        zinv = self.z.checked_inv()
        return EdwardsPoint(self.x * zinv, self.y * zinv)

    def into_montgomery(self):
        return self.into_affine().into_montgomery()

    def double(self) -> "EdwardsPointEx":
        # dbl-2008-hwcd (reference native/ecc.rs:282-307)
        a = self.x.square()
        b = self.y.square()
        c = self.z.square().double()
        d = -a
        e = (self.x + self.y).square() - a - b
        g = d + b
        f = g - c
        h = d - b
        return EdwardsPointEx(e * f, g * h, e * h, f * g)

    def add(self, other: "EdwardsPointEx", params: JubJubParams) -> "EdwardsPointEx":
        # unified addition (reference native/ecc.rs:309-333)
        a = self.x * other.x
        b = self.y * other.y
        c = params.edwards_d * self.t * other.t
        d = self.z * other.z
        h = b + a
        e = (self.x + self.y) * (other.x + other.y) - h
        f = d - c
        g = d + c
        return EdwardsPointEx(e * f, g * h, e * h, f * g)

    def is_in_subgroup(self, params: JubJubParams) -> bool:
        return self.mul(params.fs.p, params).is_zero()

    def mul(self, scalar, params: JubJubParams) -> "EdwardsPointEx":
        """Double-and-add over BE bits; scalar is int or Num."""
        if isinstance(scalar, Num):
            scalar = scalar.x
        res = EdwardsPointEx.zero(self.x.fld)
        if scalar == 0:
            return res
        for i in range(scalar.bit_length() - 1, -1, -1):
            res = res.double()
            if (scalar >> i) & 1:
                res = res.add(self, params)
        return res
