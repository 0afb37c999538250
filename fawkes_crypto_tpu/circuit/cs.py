"""Constraint systems: trace-once DSL backends.

Mirrors the reference's three CS modes
(/root/reference/fawkes-crypto/src/circuit/r1cs/cs.rs:28-334) with a TPU-first
twist: BuildCS also records a *witness program* — a typed op per aux wire —
so witness generation can be compiled to batched TPU kernels instead of
re-interpreting the circuit per proof (the generalization of the reference's
const-tracker replay trick, cs.rs:331-333 / num.rs:111-126).

Gate = (a, b, c) sparse rows meaning <a,z> * <b,z> = <c,z>.
"""

from __future__ import annotations

from typing import List, Optional

from ..ff.hostfield import Num, PrimeField
from .lc import AUX_BASE, INPUT0, LC, aux_idx, input_idx


class Gate:
    __slots__ = ("a", "b", "c")

    def __init__(self, a, b, c):
        self.a = a  # list[(coeff:int, index:int)]
        self.b = b
        self.c = c

    def __iter__(self):
        yield self.a
        yield self.b
        yield self.c


class WitnessOp:
    """One recorded aux-wire derivation for compiled witness generation.

    kind:
      'input'       — value supplied externally (public/secret input alloc)
      'mul'         — out = <a,z> * <b,z>
      'div'         — out = <a,z> / <b,z>        (0/0 -> 0, div_unchecked)
      'inv_or'      — out = <a,z>^-1 if nonzero else `aux` constant
      'bit'         — out = bit `aux` of the canonical value of <a,z>
      'hint'        — named native hint (aux = (name, metadata)); evaluated
                      by a registered batched/native routine
    """

    __slots__ = ("kind", "out", "a", "b", "aux")

    def __init__(self, kind, out, a=None, b=None, aux=None):
        self.kind = kind
        self.out = out
        self.a = a
        self.b = b
        self.aux = aux


class BaseCS:
    """Common interface; concrete subclasses pick the tracing behavior."""

    fld: PrimeField

    def num_gates(self) -> int:
        raise NotImplementedError

    def num_input(self) -> int:
        raise NotImplementedError

    def num_aux(self) -> int:
        raise NotImplementedError

    # const-tracker hooks (reference cs.rs:44-48)
    def const_tracker_before(self) -> Optional[bool]:
        return None

    def const_tracker_after(self, v: bool):
        pass

    # witness-program recording hook (BuildCS only)
    def record_op(self, op: WitnessOp):
        pass

    def hint_block(self, name: str, meta_fn, signals):
        """Macro-op recording scope (BuildCS only; no-op elsewhere).

        Gadgets with heavy but structured witness logic (poseidon: wide
        partial-round lane LCs) wrap their body so the per-mul ops
        recorded inside are replaced by ONE multi-output hint op that a
        registered native routine (circuit/hints.py, C++ fast path in
        native_ext/witness.cpp) evaluates in value space — the same cost
        profile as the reference's compiled-DSL replay
        (/root/reference/.../bellman_groth16/prover.rs:69-74) instead of
        O(LC width) per op. Gate recording is untouched, so constraint
        counts stay bit-exact.

        meta_fn() -> (meta, input_lcs) is only called on BuildCS (other
        CS kinds carry no LCs)."""
        from contextlib import nullcontext

        return nullcontext()


class DebugCS(BaseCS):
    """Counts gates and eagerly asserts witness satisfaction
    (reference cs.rs:52-181). The universal unit-test fixture."""

    def __init__(self, fld: PrimeField):
        self.fld = fld
        self._num_input = 1
        self._num_aux = 0
        self._num_gates = 0

    def num_gates(self):
        return self._num_gates

    def num_input(self):
        return self._num_input

    def num_aux(self):
        return self._num_aux

    def enforce(self, a, b, c):
        self._num_gates += 1
        if a.value is not None and b.value is not None and c.value is not None:
            assert a.value * b.value == c.value, "Not satisfied constraint"

    def inputize(self, n):
        self._num_gates += 1
        self._num_input += 1

    def alloc(self, value: Optional[Num], lc_cls=LC):
        v = self._num_aux
        self._num_aux += 1
        from .num import CNum

        return CNum(self, value, LC.from_index(self.fld.p, aux_idx(v)))


class BuildCS(BaseCS):
    """Records gates + const-tracker bits + the witness program
    (reference cs.rs:75-96, 279-334; witness program is our TPU extension)."""

    def __init__(self, fld: PrimeField):
        self.fld = fld
        self._num_input = 1
        self._num_aux = 0
        self.gates: List[Gate] = []
        self.const_tracker: List[bool] = []
        # witness program: aux wire -> derivation op; aux wires with no op are
        # external inputs (user-provided secret values)
        self.witness_ops: dict = {}
        self.inputize_lcs: List[list] = []

    def num_gates(self):
        return len(self.gates)

    def num_input(self):
        return self._num_input

    def num_aux(self):
        return self._num_aux

    def enforce(self, a, b, c):
        self.gates.append(Gate(a.lc.to_vec(), b.lc.to_vec(), c.lc.to_vec()))

    def inputize(self, n):
        v = self._num_input
        self._num_input += 1
        self.gates.append(
            Gate(n.lc.to_vec(), [(1, INPUT0)], [(1, input_idx(v))])
        )
        self.inputize_lcs.append(n.lc.to_vec())

    def alloc(self, value: Optional[Num]):
        # value intentionally dropped (reference cs.rs:320-329): BuildCS traces
        # with symbolic wires only.
        v = self._num_aux
        self._num_aux += 1
        from .num import CNum

        return CNum(self, None, LC.from_index(self.fld.p, aux_idx(v)))

    def const_tracker_after(self, v: bool):
        self.const_tracker.append(v)

    def record_op(self, op: WitnessOp):
        self.witness_ops[op.out] = op
        if self._block_outs is not None:
            self._block_outs.append(op.out)

    _block_outs: Optional[list] = None

    def hint_block(self, name: str, meta_fn, signals):
        from contextlib import contextmanager

        @contextmanager
        def scope():
            assert self._block_outs is None, "nested hint blocks"
            meta, input_lcs = meta_fn()
            self._block_outs = []
            try:
                yield
            finally:
                outs = self._block_outs
                self._block_outs = None
            # replace the recorded per-mul ops by one macro hint op
            flat = []
            for o in outs:
                if isinstance(o, tuple):
                    flat.extend(o)
                else:
                    flat.append(o)
                del self.witness_ops[o]
            if flat:
                self.witness_ops[tuple(flat)] = WitnessOp(
                    "hint", tuple(flat), a=input_lcs, aux=(name, meta))

        return scope()


class WitnessCS(BaseCS):
    """Fast witness-only replay: no LCs, concrete values, const decisions
    consumed from the recorded tracker (reference cs.rs:98-123, 225-276)."""

    def __init__(self, fld: PrimeField, const_tracker: List[bool]):
        self.fld = fld
        self.values_input: List[Num] = [Num(fld, 1)]
        self.values_aux: List[Num] = []
        self.const_tracker = const_tracker
        self.const_tracker_index = 0

    def num_gates(self):
        return 0

    def num_input(self):
        return len(self.values_input)

    def num_aux(self):
        return len(self.values_aux)

    def get_value(self, index: int) -> Num:
        if index >= AUX_BASE:
            return self.values_aux[index - AUX_BASE]
        return self.values_input[index]

    def enforce(self, a, b, c):
        pass

    def inputize(self, n):
        assert n.value is not None, "value is empty"
        self.values_input.append(n.value)

    def alloc(self, value: Optional[Num]):
        assert value is not None, "value is empty"
        self.values_aux.append(value)
        from .num import CNum

        return CNum(self, value, None)

    def const_tracker_before(self) -> Optional[bool]:
        i = self.const_tracker_index
        self.const_tracker_index += 1
        return self.const_tracker[i]
