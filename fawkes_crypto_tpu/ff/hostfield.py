"""Host-side prime field arithmetic (the scalar oracle for all TPU kernels).

TPU-native rethink of the reference's ff-uint crate
(/root/reference/ff-uint/src/ff/traits.rs:5-111 and
/root/reference/ff-uint_derive/src/lib.rs:221-969): instead of generating
unrolled Montgomery code per field at compile time, we keep host scalars as
Python ints (exact, arbitrary precision) and derive the same compile-time
constants (R, R^2, INV, S, ROOT_OF_UNITY, REPR_SHAVE_BITS) numerically.
Montgomery *form* only matters at serialization / sampling boundaries, where
we convert explicitly; all TPU-side kernels use 16-bit-limb Montgomery
representation built from the same constants (see ff/jfield.py).
"""

from __future__ import annotations

import functools


class LegendreSymbol:
    Zero = 0
    QuadraticResidue = 1
    QuadraticNonResidue = -1


# Canonical-instance registry: fields are compared with `is` throughout
# (cross-field arithmetic guard), so unpickling must return the SAME
# instance, not a copy — see PrimeField.__reduce__.
_FIELD_REGISTRY: dict = {}


def _field_from_registry(modulus, generator, word_count, name):
    f = _FIELD_REGISTRY.get((modulus, generator, word_count))
    if f is None:
        f = PrimeField(modulus, generator, word_count, name)
    return f


class PrimeField:
    """Parameters of one prime field; mirrors PrimeFieldParams of the reference.

    word_count mirrors the reference's Inner uint type (U256 -> 4, U384 -> 6);
    it fixes REPR_SHAVE_BITS and the seedbox sampling width
    (cf. /root/reference/ff-uint/src/num/mod.rs:286-303).
    """

    __slots__ = (
        "p", "generator", "word_count", "name", "bits", "shave_bits",
        "R", "R2", "Rinv", "inv64", "inv16", "s", "t_odd", "root_of_unity",
        "_sqrt_z",
    )

    def __init__(self, modulus: int, generator: int, word_count: int, name: str = ""):
        self.p = modulus
        self.generator = generator
        self.word_count = word_count
        self.name = name
        _FIELD_REGISTRY.setdefault((modulus, generator, word_count), self)
        self.bits = modulus.bit_length()  # MODULUS_BITS
        self.shave_bits = 64 * word_count - self.bits  # REPR_SHAVE_BITS
        # Montgomery constants, radix 2^64 (reference ff-uint_derive/src/lib.rs:221-265)
        self.R = (1 << (64 * word_count)) % modulus
        self.R2 = (self.R * self.R) % modulus
        self.Rinv = pow(self.R, -1, modulus)
        self.inv64 = (-pow(modulus, -1, 1 << 64)) % (1 << 64)  # INV
        # radix-2^16 variant used by the TPU limb kernels (same R: 16*16 == 4*64 bits)
        self.inv16 = (-pow(modulus, -1, 1 << 16)) % (1 << 16)
        # 2-adicity: p - 1 = t_odd * 2^s (reference lib.rs:241-247)
        t = modulus - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.s = s
        self.t_odd = t
        self.root_of_unity = pow(generator, t, modulus)
        self._sqrt_z = None

    def __reduce__(self):
        return (_field_from_registry,
                (self.p, self.generator, self.word_count, self.name))

    # --- basic ops on canonical ints -------------------------------------
    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return (a * b) % self.p

    def neg(self, a):
        return (-a) % self.p

    def inv(self, a):
        if a == 0:
            raise ZeroDivisionError("field inverse of zero")
        return pow(a, -1, self.p)

    def div(self, a, b):
        return (a * self.inv(b)) % self.p

    def pow(self, a, e):
        return pow(a, e, self.p)

    def legendre(self, a):
        if a % self.p == 0:
            return LegendreSymbol.Zero
        r = pow(a, (self.p - 1) // 2, self.p)
        return (
            LegendreSymbol.QuadraticResidue
            if r == 1
            else LegendreSymbol.QuadraticNonResidue
        )

    def sqrt(self, a):
        """Tonelli-Shanks; returns one of the two roots or None.

        The reference picks Shanks for p%4==3 and Tonelli-Shanks for p%16==1
        (ff-uint_derive/src/lib.rs:271-352); which of +/-root is returned is
        normalized by callers (even_sqrt / parity checks), so a generic
        Tonelli-Shanks is behavior-compatible.
        """
        p = self.p
        a %= p
        if a == 0:
            return 0
        if self.legendre(a) != LegendreSymbol.QuadraticResidue:
            return None
        if p % 4 == 3:
            return pow(a, (p + 1) // 4, p)
        # Tonelli-Shanks
        if self._sqrt_z is None:
            z = 2
            while self.legendre(z) != LegendreSymbol.QuadraticNonResidue:
                z += 1
            self._sqrt_z = z
        c = pow(self._sqrt_z, self.t_odd, p)
        x = pow(a, (self.t_odd + 1) // 2, p)
        t = pow(a, self.t_odd, p)
        m = self.s
        while t != 1:
            t2 = t
            i = 0
            while t2 != 1:
                t2 = (t2 * t2) % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            x = (x * b) % p
            t = (t * b * b) % p
            c = (b * b) % p
            m = i
        return x

    # --- Montgomery conversions (serialization boundary only) ------------
    def to_mont(self, a):
        return (a * self.R) % self.p

    def from_mont(self, a):
        return (a * self.Rinv) % self.p

    def __repr__(self):
        return f"PrimeField({self.name or hex(self.p)})"

    def num(self, v) -> "Num":
        return Num(self, v)

    @property
    def ZERO(self):
        return Num(self, 0)

    @property
    def ONE(self):
        return Num(self, 1)


def _coerce(fld: PrimeField, other):
    if isinstance(other, Num):
        assert other.fld is fld, "cross-field arithmetic"
        return other.x
    if isinstance(other, int):
        return other % fld.p
    if isinstance(other, bool):
        return int(other)
    return NotImplemented


class Num:
    """Field element wrapper; mirrors Num<Fp> wrapping (mod p) semantics
    (reference ff-uint/src/num/mod.rs:17-23, 398-407). Stored canonical."""

    __slots__ = ("fld", "x")

    def __init__(self, fld: PrimeField, v: int = 0):
        self.fld = fld
        self.x = v % fld.p

    # arithmetic
    def __add__(self, o):
        o = _coerce(self.fld, o)
        if o is NotImplemented:
            return NotImplemented
        return Num(self.fld, self.x + o)

    __radd__ = __add__

    def __sub__(self, o):
        o = _coerce(self.fld, o)
        if o is NotImplemented:
            return NotImplemented
        return Num(self.fld, self.x - o)

    def __rsub__(self, o):
        o = _coerce(self.fld, o)
        if o is NotImplemented:
            return NotImplemented
        return Num(self.fld, o - self.x)

    def __mul__(self, o):
        o = _coerce(self.fld, o)
        if o is NotImplemented:
            return NotImplemented
        return Num(self.fld, self.x * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = _coerce(self.fld, o)
        if o is NotImplemented:
            return NotImplemented
        return Num(self.fld, self.x * self.fld.inv(o))

    def __rtruediv__(self, o):
        o = _coerce(self.fld, o)
        if o is NotImplemented:
            return NotImplemented
        return Num(self.fld, o * self.fld.inv(self.x))

    def __neg__(self):
        return Num(self.fld, -self.x)

    def __eq__(self, o):
        if isinstance(o, Num):
            return self.fld is o.fld and self.x == o.x
        if isinstance(o, int):
            return self.x == o % self.fld.p
        return NotImplemented

    def __hash__(self):
        return hash((id(self.fld), self.x))

    def __repr__(self):
        return f"Num({self.x})"

    # Num API mirroring the reference
    def is_zero(self):
        return self.x == 0

    def is_even(self):
        return self.x % 2 == 0

    def is_odd(self):
        return self.x % 2 == 1

    def double(self):
        return Num(self.fld, 2 * self.x)

    def square(self):
        return Num(self.fld, self.x * self.x)

    def checked_inv(self):
        if self.x == 0:
            return None
        return Num(self.fld, self.fld.inv(self.x))

    def pow(self, e):
        if isinstance(e, Num):
            e = e.x
        return Num(self.fld, pow(self.x, e, self.fld.p))

    def sqrt(self):
        r = self.fld.sqrt(self.x)
        return None if r is None else Num(self.fld, r)

    def even_sqrt(self):
        # reference ff-uint/src/num/mod.rs:364-371
        r = self.sqrt()
        if r is None:
            return None
        return r if r.is_even() else -r

    def legendre(self):
        return self.fld.legendre(self.x)

    def to_uint(self) -> int:
        return self.x

    def to_mont_uint(self) -> int:
        return self.fld.to_mont(self.x)

    def to_other(self, fld: PrimeField):
        """Checked cross-field cast (None if value >= target modulus)."""
        if self.x >= fld.p:
            return None
        return Num(fld, self.x)

    def to_other_reduced(self, fld: PrimeField):
        return Num(fld, self.x % fld.p)

    def bit_iter_le(self, nbits=None):
        n = nbits if nbits is not None else 64 * self.fld.word_count
        x = self.x
        return [bool((x >> i) & 1) for i in range(n)]

    def bit_iter_be(self, nbits=None):
        return list(reversed(self.bit_iter_le(nbits)))

    def to_le_bytes(self) -> bytes:
        return self.x.to_bytes(8 * self.fld.word_count, "little")

    def to_mont_le_bytes(self) -> bytes:
        return self.fld.to_mont(self.x).to_bytes(8 * self.fld.word_count, "little")


def num_from_mont_uint(fld: PrimeField, v: int):
    """Interpret raw limbs as a Montgomery-form element; None if >= modulus
    (reference Fp::from_mont_uint)."""
    if v >= fld.p:
        return None
    return Num(fld, fld.from_mont(v))


def num_from_uint_reduced(fld: PrimeField, v: int) -> Num:
    return Num(fld, v % fld.p)
