"""Signal derive + SizedVec (reference core/signal.rs, core/sizedvec.rs,
fawkes-crypto_derive): composite alloc/const/switch/assert through the
derived protocol, gate-count-for-gate-count with hand-rolled signals."""

import random

from fawkes_crypto_tpu.circuit.bool import CBool
from fawkes_crypto_tpu.circuit.cs import BuildCS, DebugCS
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.core.signal import SizedVec, signal
from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.hostfield import Num

rng = random.Random(43)


class Pair:
    """Native value type for the test composite."""

    def __init__(self, a, b):
        self.a = a
        self.b = b

    def __eq__(self, o):
        return self.a == o.a and self.b == o.b


@signal(Pair)
class CPair:
    __signal_fields__ = {"a": CNum, "b": CNum}

    def __init__(self, a, b):
        self.a = a
        self.b = b


def test_derived_signal_roundtrip():
    cs = DebugCS(Fr)
    val = Pair(Num(Fr, 3), Num(Fr, 7))
    sig = CPair.alloc(cs, val)
    assert sig.get_value() == val
    c = CPair.from_const(cs, val)
    assert c.as_const() == val
    assert sig.as_const() is None  # allocated wires are not constants

    # switch: constant bit folds (no gates), variable bit costs 1 per CNum
    other = CPair.from_const(cs, Pair(Num(Fr, 10), Num(Fr, 20)))
    bit_const = CBool.from_const(cs, True)
    picked = sig.switch(bit_const, other)
    assert picked.get_value() == val
    before = cs.num_gates()
    bit_var = CBool.alloc(cs, True)
    _ = sig.switch(bit_var, other)
    assert cs.num_gates() - before == 1 + 2  # bit check + 2 field switches

    # assert_eq emits one gate per field
    before = cs.num_gates()
    sig.assert_eq(sig.clone())
    assert cs.num_gates() - before == 2


def test_derived_signal_inputize_and_witness():
    cs = BuildCS(Fr)
    sig = CPair.alloc(cs, None)
    sig.inputize()
    assert cs.num_input() == 3  # ONE + two fields


def test_sizedvec_protocol():
    cs = DebugCS(Fr)
    vals = [Num(Fr, rng.randrange(Fr.p)) for _ in range(4)]
    vec = SizedVec.alloc(CNum, cs, vals)
    assert vec.get_value() == vals
    sym = SizedVec.alloc(CNum, cs, None, length=4)
    assert sym.get_value() is None
    cv = SizedVec.from_const(CNum, cs, vals)
    assert cv.as_const() == vals
    bit = CBool.alloc(cs, False)
    sw = vec.switch(bit, cv)
    assert sw.get_value() == vals


@signal()
class CTriple:
    """Vector field spec: (SizedVec, elem) tuple."""

    __signal_fields__ = {"head": CNum, "tail": (SizedVec, CNum)}

    def __init__(self, head, tail):
        self.head = head
        self.tail = tail


def test_derived_vector_field():
    cs = DebugCS(Fr)
    sym = CTriple.alloc(cs, None, length=3)
    assert sym.get_value() is None
    assert len(sym.tail) == 3
