"""Fixed-width unsigned integers: the host mirror of the reference's
construct_uint!/Uint trait surface (/root/reference/ff-uint/src/uint/
mod.rs:6-799, traits.rs:4-219) and NumRepr plain-integer semantics
(ff-uint/src/num/mod.rs:17-23 — overflowing, NOT mod-p).

The reference generates per-width limb code (Knuth division, carry
chains) because Rust needs it; on the host side Python ints are exact, so
this layer is a thin width-discipline wrapper: every op truncates to the
declared bit width with the same overflow flags the reference reports.
Device-side equivalents live in ff/jfield.py / ff/pfield.py.
"""

from __future__ import annotations

from typing import Iterator, Tuple


class UintSpec:
    """Width family: U256 = UintSpec(4), U384 = UintSpec(6) (64-bit words,
    reference engines/mod.rs:6-15)."""

    def __init__(self, words: int, name: str = ""):
        self.words = words
        self.bits = 64 * words
        self.mask = (1 << self.bits) - 1
        self.name = name or f"U{self.bits}"

    def __repr__(self):
        return self.name


U256 = UintSpec(4, "U256")
U384 = UintSpec(6, "U384")


class NumRepr:
    """Plain fixed-width integer with overflowing semantics."""

    __slots__ = ("spec", "x")

    def __init__(self, spec: UintSpec, v: int = 0):
        self.spec = spec
        self.x = v & spec.mask

    # ---- constructors / IO ---------------------------------------------------
    @staticmethod
    def from_le_bytes(spec: UintSpec, b: bytes) -> "NumRepr":
        assert len(b) == spec.words * 8
        return NumRepr(spec, int.from_bytes(b, "little"))

    @staticmethod
    def from_be_bytes(spec: UintSpec, b: bytes) -> "NumRepr":
        assert len(b) == spec.words * 8
        return NumRepr(spec, int.from_bytes(b, "big"))

    def to_le_bytes(self) -> bytes:
        return self.x.to_bytes(self.spec.words * 8, "little")

    def to_be_bytes(self) -> bytes:
        return self.x.to_bytes(self.spec.words * 8, "big")

    @staticmethod
    def from_str(spec: UintSpec, s: str) -> "NumRepr":
        s = s.strip()
        v = int(s, 16) if s.lower().startswith("0x") else int(s, 10)
        assert v >> spec.bits == 0, "literal exceeds width"
        return NumRepr(spec, v)

    def __str__(self):
        return str(self.x)

    def __repr__(self):
        return f"NumRepr<{self.spec}>({self.x})"

    # ---- overflowing family (reference uint/mod.rs:578-710) -------------------
    def overflowing_add(self, o: "NumRepr") -> Tuple["NumRepr", bool]:
        s = self.x + o.x
        return NumRepr(self.spec, s), s > self.spec.mask

    def overflowing_sub(self, o: "NumRepr") -> Tuple["NumRepr", bool]:
        d = self.x - o.x
        return NumRepr(self.spec, d), d < 0

    def overflowing_mul(self, o: "NumRepr") -> Tuple["NumRepr", bool]:
        m = self.x * o.x
        return NumRepr(self.spec, m), m > self.spec.mask

    # ---- wrapping family -------------------------------------------------------
    def wrapping_add(self, o):
        return NumRepr(self.spec, self.x + o.x)

    def wrapping_sub(self, o):
        return NumRepr(self.spec, self.x - o.x)

    def wrapping_mul(self, o):
        return NumRepr(self.spec, self.x * o.x)

    # ---- checked family ----------------------------------------------------------
    def checked_add(self, o):
        r, f = self.overflowing_add(o)
        return None if f else r

    def checked_sub(self, o):
        r, f = self.overflowing_sub(o)
        return None if f else r

    def checked_mul(self, o):
        r, f = self.overflowing_mul(o)
        return None if f else r

    def checked_div(self, o):
        return None if o.x == 0 else NumRepr(self.spec, self.x // o.x)

    # ---- division (reference div_mod_knuth, uint/mod.rs:106-186) ----------------
    def div_mod(self, o: "NumRepr") -> Tuple["NumRepr", "NumRepr"]:
        assert o.x != 0, "division by zero"
        return (NumRepr(self.spec, self.x // o.x),
                NumRepr(self.spec, self.x % o.x))

    # ---- operators (panicking on overflow, like the reference's Add etc.) -------
    def __add__(self, o):
        r, f = self.overflowing_add(o)
        assert not f, "uint overflow in add"
        return r

    def __sub__(self, o):
        r, f = self.overflowing_sub(o)
        assert not f, "uint underflow in sub"
        return r

    def __mul__(self, o):
        r, f = self.overflowing_mul(o)
        assert not f, "uint overflow in mul"
        return r

    def __floordiv__(self, o):
        return self.div_mod(o)[0]

    def __mod__(self, o):
        return self.div_mod(o)[1]

    def __lshift__(self, n: int):
        return NumRepr(self.spec, self.x << n)

    def __rshift__(self, n: int):
        return NumRepr(self.spec, self.x >> n)

    def __and__(self, o):
        return NumRepr(self.spec, self.x & o.x)

    def __or__(self, o):
        return NumRepr(self.spec, self.x | o.x)

    def __xor__(self, o):
        return NumRepr(self.spec, self.x ^ o.x)

    def __invert__(self):
        return NumRepr(self.spec, ~self.x)

    def __eq__(self, o):
        if isinstance(o, NumRepr):
            return self.spec.bits == o.spec.bits and self.x == o.x
        return self.x == o

    def __lt__(self, o):
        return self.x < o.x

    def __le__(self, o):
        return self.x <= o.x

    def __hash__(self):
        return hash((self.spec.bits, self.x))

    # ---- bits / words (reference traits.rs:221-295 BitIterLE/BE) ----------------
    def is_zero(self) -> bool:
        return self.x == 0

    def bit(self, i: int) -> bool:
        return bool((self.x >> i) & 1)

    def bits(self) -> int:
        return self.x.bit_length()

    def leading_zeros(self) -> int:
        return self.spec.bits - self.x.bit_length()

    def trailing_zeros(self) -> int:
        if self.x == 0:
            return self.spec.bits
        return (self.x & -self.x).bit_length() - 1

    def bit_iter_le(self) -> Iterator[bool]:
        return (bool((self.x >> i) & 1) for i in range(self.spec.bits))

    def bit_iter_be(self) -> Iterator[bool]:
        return (bool((self.x >> i) & 1)
                for i in range(self.spec.bits - 1, -1, -1))

    def limbs_u64(self) -> list:
        return [(self.x >> (64 * i)) & ((1 << 64) - 1)
                for i in range(self.spec.words)]

    def to_other(self, spec: UintSpec):
        """Width cast; None if the value does not fit (reference
        Uint::to_other, traits.rs)."""
        if self.x >> spec.bits != 0:
            return None
        return NumRepr(spec, self.x)
