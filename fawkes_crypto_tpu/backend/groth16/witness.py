"""Compiled witness generation: evaluate the recorded witness program
instead of re-interpreting the circuit DSL per proof.

The reference replays the full circuit code on WitnessCS for every proof
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:69-74,
consuming the const-tracker BitVec). Here BuildCS already recorded one
typed WitnessOp per derived aux wire (circuit/cs.py) — control flow was
resolved at trace time — so witness generation reduces to a linear pass
over static ops (SURVEY.md §5 "trace the circuit once into a static
program"; §7 hard part #4). This host evaluator uses plain int arithmetic;
the same program is the input for the batched device evaluator.

Op semantics (circuit/{num,bool,bitify,ecc}.py record sites):
  mul    out = <a,z> * <b,z> + aux        (aux: is_eq's +1/2 shift, else 0)
  div    out = <a,z> / <b,z>, 0 if b == 0 (div_unchecked convention)
  inv_or out = <a,z>^-1 if nonzero else aux
  bit    out = bit `aux` of canonical <a,z>
  hint   outs (tuple) = host_fn(values of input LCs)
External aux wires (no op) take values from the user-supplied pub/sec
signals in allocation order.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

from ...circuit.lc import AUX_BASE
from ...ff.hostfield import Num
from .params import Parameters


def _flatten_values(sig, p) -> List[int]:
    """Signal values in allocation order (mirrors how alloc_pub/alloc_sec
    traverse composite signals)."""
    if sig is None:
        return []
    if isinstance(sig, Num):
        return [sig.x]
    if isinstance(sig, bool):
        return [int(sig)]
    if isinstance(sig, int):
        return [sig % p]
    if isinstance(sig, (tuple, list)):
        out = []
        for s in sig:
            out.extend(_flatten_values(s, p))
        return out
    # composite signals (EdwardsPoint, MerkleProof, ...) expose their parts
    for attrs in (("x", "y"), ("sibling", "path")):
        if all(hasattr(sig, a) for a in attrs):
            out = []
            for a in attrs:
                out.extend(_flatten_values(getattr(sig, a), p))
            return out
    raise TypeError(f"cannot flatten signal value {type(sig)}")


class WitnessProgram:
    """Static witness-evaluation program for one traced circuit."""

    def __init__(self, fr, witness_ops: dict, num_aux: int,
                 inputize_lcs) -> None:
        self.fr = fr
        self.num_aux = num_aux
        self.inputize_lcs = inputize_lcs
        # normalize: list of (first_out_aux_index, op) sorted by evaluation
        # order; hint ops claim a contiguous block of outs
        items = []
        covered = set()
        for out, op in witness_ops.items():
            if isinstance(out, tuple):
                first = min(o - AUX_BASE for o in out)
                for o in out:
                    covered.add(o - AUX_BASE)
            else:
                first = out - AUX_BASE
                covered.add(first)
            items.append((first, op))
        items.sort(key=lambda t: t[0])
        self.ops = items
        self.external = [i for i in range(self.num_aux) if i not in covered]

    @classmethod
    def from_params(cls, params: Parameters) -> "WitnessProgram":
        return cls(params.E.fr, params.witness_ops, params.r1cs.num_aux,
                   params.inputize_lcs)

    @classmethod
    def from_parts(cls, fr, witness_ops, num_aux,
                   inputize_lcs) -> "WitnessProgram":
        """Standalone construction (batch tx templates, replicate.py)."""
        return cls(fr, witness_ops, num_aux, inputize_lcs)

    def _lc_eval(self, lc, z_in, z_aux) -> int:
        p = self.fr.p
        acc = 0
        for coeff, idx in lc:
            v = z_aux[idx - AUX_BASE] if idx >= AUX_BASE else z_in[idx]
            acc += coeff * v
        return acc % p

    def evaluate(self, input_pub, input_sec,
                 extra_inputs=()) -> Tuple[List[int], List[int]]:
        """Returns (inputs, aux) — same contract as the WitnessCS replay
        (prover.generate_witness). extra_inputs seed pseudo-input wires
        1.. (the batch template's running root, replicate.py)."""
        p = self.fr.p
        ext_vals = (_flatten_values(input_pub, p)
                    + _flatten_values(input_sec, p))
        assert len(ext_vals) == len(self.external), (
            f"external wires {len(self.external)} != provided {len(ext_vals)}"
        )
        z_aux: List = [None] * self.num_aux
        for i, v in zip(self.external, ext_vals):
            z_aux[i] = v % p
        z_in = [1, *(int(v) % p for v in extra_inputs)]

        for first, op in self.ops:
            if op.kind == "mul":
                a = self._lc_eval(op.a, z_in, z_aux)
                b = self._lc_eval(op.b, z_in, z_aux)
                extra = op.aux or 0
                z_aux[first] = (a * b + extra) % p
            elif op.kind == "div":
                a = self._lc_eval(op.a, z_in, z_aux)
                b = self._lc_eval(op.b, z_in, z_aux)
                z_aux[first] = 0 if b == 0 else a * pow(b, -1, p) % p
            elif op.kind == "inv_or":
                a = self._lc_eval(op.a, z_in, z_aux)
                z_aux[first] = op.aux % p if a == 0 else pow(a, -1, p)
            elif op.kind == "bit":
                a = self._lc_eval(op.a, z_in, z_aux)
                z_aux[first] = (a >> op.aux) & 1
            elif op.kind == "hint":
                from ...circuit.hints import resolve_hint

                name, meta = op.aux
                ins = [Num(self.fr, self._lc_eval(lc, z_in, z_aux))
                       for lc in op.a]
                outs = resolve_hint(name)(meta, ins)
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                for o_idx, val in zip(op.out, outs):
                    z_aux[o_idx - AUX_BASE] = (
                        val.x if isinstance(val, Num) else int(val) % p
                    )
            else:
                raise ValueError(f"unknown witness op kind {op.kind}")

        # public inputs derive from the recorded inputize LCs
        for lc in self.inputize_lcs:
            z_in.append(self._lc_eval(lc, z_in, z_aux))
        assert all(v is not None for v in z_aux), "uncovered aux wire"
        return z_in, z_aux

    def evaluate_fast(self, input_pub, input_sec,
                      extra_inputs=()) -> Tuple[List[int], List[int]]:
        """Same contract as evaluate(); runs the compiled C++ evaluator
        (witness_native.py) when available — the compiled analog of the
        reference's Rust replay (prover.rs:69-74) — and falls back to the
        Python interpreter otherwise."""
        native = getattr(self, "_native", False)
        if native is False:
            native = None
            if not extra_inputs:  # n_extra fixed at compile time
                try:
                    from . import witness_native as wn

                    if wn.available():
                        native = wn.NativeProgram(self)
                except Exception:
                    native = None
            self._native = native
        if native is None or extra_inputs:
            return self.evaluate(input_pub, input_sec, extra_inputs)
        p = self.fr.p
        ext_vals = (_flatten_values(input_pub, p)
                    + _flatten_values(input_sec, p))
        z_aux = native.eval_aux(ext_vals)
        z_in = [1]
        for lc in self.inputize_lcs:
            z_in.append(self._lc_eval(lc, z_in, z_aux))
        return z_in, z_aux
