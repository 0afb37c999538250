"""Bit decomposition / comparison gadgets.

Mirror of /root/reference/fawkes-crypto/src/circuit/bitify.rs:9-123 (including
the improved circomlib compconstant 2-bits-per-step comparator). Bit allocs
record 'bit' witness ops for the compiled TPU witness path.
"""

from __future__ import annotations

from typing import List

from ..ff.hostfield import Num
from .bool import CBool
from .cs import WitnessOp
from .num import CNum, _records


def c_into_bits_le(signal: CNum, limit: int) -> List[CBool]:
    v = signal.as_const()
    if v is not None:
        bits = []
        k = Num(signal.cs.fld, 1)
        remained = v
        for i in range(limit):
            bit = bool((v.x >> i) & 1)
            if bit:
                remained = remained - k
            bits.append(CBool.from_const(signal.cs, bit))
            k = k.double()
        assert remained.is_zero()
        return bits

    value = signal.get_value()
    remained_signal = signal.clone()
    k = Num(signal.cs.fld, 1)
    bits = [CBool.from_const(signal.cs, False)] * limit
    src_lc = (signal.lc.to_vec()
              if _records(signal.cs) and signal.lc is not None else None)
    for i in range(1, limit):
        k = k.double()
        bv = None if value is None else bool((value.x >> i) & 1)
        s = CBool.alloc(signal.cs, bv)
        if _records(signal.cs):
            signal.cs.record_op(WitnessOp(
                "bit", next(iter(s.num.lc.terms)), a=src_lc, aux=i))
        remained_signal = remained_signal - s.to_num() * k
        bits[i] = s
    bits[0] = remained_signal.to_bool()
    return bits


def c_comp(s1: CNum, s2: CNum, limit: int) -> CBool:
    """true if s1 > s2, assuming both < 2^limit (bitify.rs:53-58)."""
    t = Num(s1.cs.fld, (1 << limit) - 1)
    n = t + s1 - s2
    return c_into_bits_le(n, limit + 1)[limit]


def c_comp_constant(signal: List[CBool], ct: Num) -> CBool:
    """true if bits(signal) > ct (bitify.rs:62-105)."""
    siglen = len(signal)
    assert siglen > 0, "should be at least one input signal"
    cs = signal[0].cs
    c_false = CBool.from_const(cs, False)
    if (ct.x >> siglen) != 0:
        return c_false
    nsteps = (siglen + 1) >> 1
    assert nsteps + 1 < cs.fld.bits, "signal length is too large"

    def sig_bit(j):
        return signal[j] if j < siglen else c_false

    k = Num(cs.fld, 1)
    acc = CNum.from_const(cs, 0)
    for step in range(nsteps):
        ct_l = bool((ct.x >> (2 * step)) & 1)
        ct_u = bool((ct.x >> (2 * step + 1)) & 1)
        sig_l = sig_bit(2 * step).to_num()
        sig_u = sig_bit(2 * step + 1).to_num()
        sig_lu = sig_l * sig_u
        if not ct_l and not ct_u:
            add = sig_l + sig_u - sig_lu
        elif ct_l and not ct_u:
            add = sig_l + sig_u * 2 - sig_lu - 1
        elif not ct_l and ct_u:
            add = sig_lu + sig_u - 1
        else:
            add = sig_lu - 1
        acc = acc + add * k
        k = k.double()
    k = k - 1
    acc = acc + k
    acc_bits = c_into_bits_le(acc, nsteps + 1)
    return acc_bits[nsteps]


def c_into_bits_le_strict(signal: CNum) -> List[CBool]:
    """Full-width decomposition + lexicographic < p check (bitify.rs:107-112)."""
    bits = c_into_bits_le(signal, signal.cs.fld.bits)
    cmp_res = c_comp_constant(bits, Num(signal.cs.fld, -1))
    cmp_res.assert_const(False)
    return bits


def c_from_bits_le(bits: List[CBool]) -> CNum:
    assert len(bits) > 0, "should be positive number of bits"
    acc = bits[0].to_num()
    k = Num(acc.cs.fld, 1)
    for i in range(1, len(bits)):
        k = k.double()
        acc = acc + bits[i].to_num() * k
    return acc
