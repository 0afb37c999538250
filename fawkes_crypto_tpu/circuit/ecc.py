"""Twisted Edwards / Montgomery curve gadgets for the embedded jubjub curve.

Mirror of /root/reference/fawkes-crypto/src/circuit/ecc.rs:10-282:
- nondeterministic subgroup checks (allocate preimage, multiply by cofactor 8)
- const-base 3-bit-window mux3 Montgomery ladder (513 gates / 254 bits)
- var-base double-and-add with switch (2,296 gates / 254 bits)
- Elligator-style from_scalar hash-to-curve

Hint allocations record named witness ops so the TPU witness engine can batch
them (native sqrt / scalar-mul hints).
"""

from __future__ import annotations

from typing import List, Optional

from ..core.signal import signal
from ..ff.hostfield import Num
from ..native.ecc import EdwardsPoint, JubJubParams, MontgomeryPoint
from .bool import CBool
from .cs import BaseCS, WitnessOp
from .mux import c_mux3
from .num import CNum, _records


def _record_hint(cs, name, meta, input_lcs, out_signals):
    """Record a named witness hint (circuit/hints.py registry). aux is
    the serializable (name, meta) pair, so compiled witness programs
    survive Parameters write/read — no closures."""
    if _records(cs):
        outs = tuple(next(iter(s.lc.terms)) for s in out_signals)
        cs.record_op(WitnessOp("hint", outs, a=input_lcs, aux=(name, meta)))


@signal(EdwardsPoint)
class CEdwardsPoint:
    """Composite signal; the Signal protocol (alloc/from_const/get_value/
    as_const/switch/inputize/assert_*/clone) is derived by @signal, the
    analog of the reference's `#[derive(Signal)] CEdwardsPoint`
    (circuit/ecc.rs:10-15)."""

    __slots__ = ("x", "y")
    __signal_fields__ = {"x": CNum, "y": CNum}

    def __init__(self, x: CNum, y: CNum):
        self.x = x
        self.y = y

    @property
    def cs(self):
        return self.x.cs

    # --- curve ops (ecc.rs:24-244) -----------------------------------------
    def double(self, params: JubJubParams) -> "CEdwardsPoint":
        v = self.x * self.y
        v2 = v.square()
        u = (self.x + self.y).square()
        d = params.edwards_d
        return CEdwardsPoint(
            (v * 2).div_unchecked(v2 * d + 1),
            (u - v * 2).div_unchecked(-(v2 * d) + 1),
        )

    def mul_by_cofactor(self, params: JubJubParams) -> "CEdwardsPoint":
        return self.double(params).double(params).double(params)

    def add(self, p: "CEdwardsPoint", params: JubJubParams) -> "CEdwardsPoint":
        v1 = self.x * p.y
        v2 = p.x * self.y
        v12 = v1 * v2
        u = (self.x + self.y) * (p.x + p.y)
        d = params.edwards_d
        return CEdwardsPoint(
            (v1 + v2).div_unchecked(v12 * d + 1),
            (u - v1 - v2).div_unchecked(-(v12 * d) + 1),
        )

    def assert_in_curve(self, params: JubJubParams):
        x2 = self.x.square()
        y2 = self.y.square()
        (x2 * y2 * params.edwards_d).assert_eq(y2 - x2 - 1)

    def assert_in_subgroup(self, params: JubJubParams):
        # allocate preimage = self/8, check on-curve, multiply back (ecc.rs:57-67)
        inv8 = Num(params.fs, 8).checked_inv()
        value = self.get_value()
        pre_value = value.mul(inv8, params) if value is not None else None
        preimage = CEdwardsPoint.alloc(self.cs, pre_value)
        _record_hint(
            self.cs, "jubjub_mul_inv8", {"curve": params.name},
            [self.x.lc.to_vec() if self.x.lc else None,
             self.y.lc.to_vec() if self.y.lc else None],
            [preimage.x, preimage.y],
        )
        preimage.assert_in_curve(params)
        preimage8 = preimage.mul_by_cofactor(params)
        (self.x - preimage8.x).assert_zero()
        (self.y - preimage8.y).assert_zero()

    @staticmethod
    def subgroup_decompress(x: CNum, params: JubJubParams) -> "CEdwardsPoint":
        # ecc.rs:69-80
        cs = x.cs
        inv8 = Num(params.fs, 8).checked_inv()
        pre_value = None
        if x.value is not None:
            p = EdwardsPoint.subgroup_decompress(x.value, params)
            if p is None:
                p = params.edwards_g
            pre_value = p.mul(inv8, params)
        preimage = CEdwardsPoint.alloc(cs, pre_value)
        _record_hint(
            cs, "jubjub_decompress_inv8", {"curve": params.name},
            [x.lc.to_vec() if x.lc else None],
            [preimage.x, preimage.y],
        )
        preimage.assert_in_curve(params)
        preimage8 = preimage.mul_by_cofactor(params)
        (x - preimage8.x).assert_zero()
        return preimage8

    def into_montgomery(self) -> "CMontgomeryPoint":
        # assume nonzero subgroup point (ecc.rs:83-88)
        x = (self.y + 1).div_unchecked(-self.y + 1)
        y = x.div_unchecked(self.x)
        return CMontgomeryPoint(x, y)

    def mul(self, bits: List[CBool], params: JubJubParams) -> "CEdwardsPoint":
        # ecc.rs:90-190
        cs = self.cs
        c_base_v = self.as_const()
        if c_base_v is not None:
            return self._mul_const_base(c_base_v, bits, params)

        base_is_zero = self.x.is_zero()
        dummy_point = CEdwardsPoint.from_const(cs, params.edwards_g)
        base_point = dummy_point.switch(base_is_zero, self)
        base_point = base_point.into_montgomery()

        exponents = [base_point]
        for _ in range(1, len(bits)):
            base_point = base_point.double(params)
            exponents.append(base_point)

        empty_acc = CMontgomeryPoint(
            CNum.from_const(cs, 0), CNum.from_const(cs, 0)
        )
        acc = empty_acc
        for i in range(len(bits)):
            inc_acc = acc.add(exponents[i], params)
            acc = inc_acc.switch(bits[i], acc)
        acc = empty_acc.switch(base_is_zero, acc)

        res = acc.into_edwards()
        return CEdwardsPoint(-res.x, -res.y)

    def _mul_const_base(self, c_base_v: EdwardsPoint, bits: List[CBool],
                        params: JubJubParams) -> "CEdwardsPoint":
        cs = self.cs
        c_base = c_base_v.into_extended()
        base = c_base
        if base.is_zero():
            return CEdwardsPoint.from_const(cs, EdwardsPoint.zero(params.fr))

        def gen_table(p):
            x_col, y_col = [], []
            q = p
            for _ in range(8):
                m = q.into_montgomery()
                x_col.append(m.x)
                y_col.append(m.y)
                q = q.add(p, params)
            return [x_col, y_col]

        bits_len = len(bits)
        zeros_len = (2 * bits_len) % 3
        all_bits = list(bits) + [CBool.from_const(cs, False)] * zeros_len
        nwindows = len(all_bits) // 3

        # compute the correction point: sum of table base offsets
        acc_n = EdwardsPoint(
            Num(params.fr, 0), Num(params.fr, -1)
        ).into_extended()
        for _ in range(nwindows):
            acc_n = acc_n.add(base, params)
            base = base.double().double().double()
        mp = acc_n.negate().into_montgomery()

        acc = CMontgomeryPoint(
            CNum.from_const(cs, mp.x), CNum.from_const(cs, mp.y)
        )
        base = c_base
        for i in range(nwindows):
            table = gen_table(base)
            res = c_mux3(all_bits[3 * i : 3 * (i + 1)], table)
            p = CMontgomeryPoint(res[0], res[1])
            acc = acc.add(p, params)
            base = base.double().double().double()

        res = acc.into_edwards()
        return CEdwardsPoint(-res.x, -res.y)

    @staticmethod
    def from_scalar(t: CNum, params: JubJubParams) -> "CEdwardsPoint":
        # Elligator-style two-candidate construction (ecc.rs:194-244)
        cs = t.cs

        def check_and_get_y(x: CNum, t: CNum):
            a, b, u = params.montgomery_a, params.montgomery_b, params.montgomery_u
            g = (x.square() * (x + a) + x) / b

            y_value = None
            if g.value is not None and t.value is not None:
                gs = g.value.sqrt()
                _y = gs if gs is not None else (g.value * u).sqrt()
                y_value = _y if (_y * t.value).is_even() else -_y
            y = x.derive_alloc(y_value)

            _record_hint(
                cs, "montgomery_get_y", {"curve": params.name},
                [g.lc.to_vec() if g.lc else None,
                 t.lc.to_vec() if t.lc else None],
                [y],
            )

            (y * t).assert_even()
            y2 = y.square()
            is_square = (g - y2).is_zero()
            isnot_square = (g * u - y2).is_zero()
            (is_square ^ isnot_square).assert_const(True)
            return is_square, y

        u = params.montgomery_u
        t2g1 = t.square() * u
        x3 = (t2g1 + 1) * (Num(params.fr, -1) / params.montgomery_a)
        x2 = x3.div_unchecked(t2g1)

        is_valid, y2 = check_and_get_y(x2, t)
        _, y3 = check_and_get_y(x3, t)

        x = x2.switch(is_valid, x3)
        y = y2.switch(is_valid, y3)

        return CMontgomeryPoint(x, y).into_edwards().mul_by_cofactor(params)


@signal(MontgomeryPoint)
class CMontgomeryPoint:
    """Signal protocol derived by @signal (reference circuit/ecc.rs:17-22)."""

    __slots__ = ("x", "y")
    __signal_fields__ = {"x": CNum, "y": CNum}

    def __init__(self, x: CNum, y: CNum):
        self.x = x
        self.y = y

    @property
    def cs(self):
        return self.x.cs

    # assume self != (0, 0) (ecc.rs:247-257)
    def double(self, params: JubJubParams) -> "CMontgomeryPoint":
        a, b = params.montgomery_a, params.montgomery_b
        x2 = self.x.square()
        l = (x2 * 3 + self.x * (a * 2) + 1).div_unchecked(self.y * (b * 2))
        b_l2 = l.square() * b
        return CMontgomeryPoint(
            b_l2 - a - self.x * 2,
            l * (self.x * 3 + a - b_l2) - self.y,
        )

    # assume self != p (ecc.rs:260-270)
    def add(self, p: "CMontgomeryPoint", params: JubJubParams) -> "CMontgomeryPoint":
        a, b = params.montgomery_a, params.montgomery_b
        l = (p.y - self.y).div_unchecked(p.x - self.x)
        b_l2 = l.square() * b
        return CMontgomeryPoint(
            b_l2 - a - self.x - p.x,
            l * (self.x * 2 + p.x + a - b_l2) - self.y,
        )

    # assume any nonzero point (ecc.rs:273-280)
    def into_edwards(self) -> CEdwardsPoint:
        y_is_zero = self.y.is_zero()
        return CEdwardsPoint(
            self.x.div_unchecked(self.y + y_is_zero.to_num()),
            (self.x - 1).div_unchecked(self.x + 1),
        )
