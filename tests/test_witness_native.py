"""Native (C++) witness evaluator vs the Python interpreter oracle
(backend/groth16/witness_native.py vs witness.py).

The reference replays circuits in compiled Rust per proof
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:69-74);
our compiled-op-list evaluator must be bit-equal to the Python
interpreter on every op kind, including the jubjub witness hints
(circuit/hints.py) and the poseidon permutation macro op
(circuit/poseidon.py hint_block)."""

import random

import numpy as np
import pytest

from fawkes_crypto_tpu.backend.groth16 import witness_native as wn
from fawkes_crypto_tpu.backend.groth16.replicate import (
    BatchWitness,
    trace_tx_template,
)
from fawkes_crypto_tpu.backend.groth16.witness import (
    WitnessProgram,
    _flatten_values,
)
from fawkes_crypto_tpu.circuit.cs import BuildCS
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.poseidon import c_poseidon
from fawkes_crypto_tpu.engines.bn256 import Fr, jubjub_bn256
from fawkes_crypto_tpu.ff.hostfield import Num

from test_rollup import make_state, rollup_params

rng = random.Random(11)

needs_native = pytest.mark.skipif(
    not wn.available(), reason="native witness evaluator unavailable")


def _trace(circuit_fn, n_sec):
    cs = BuildCS(Fr)
    sec = tuple(CNum.alloc(cs, None) for _ in range(n_sec))
    circuit_fn(cs, sec)
    return cs


@needs_native
def test_poseidon_macro_native_matches_python():
    """poseidon circuit: DSL value replay == Python hint-op interpreter
    == C++ evaluator (covers the hint_block macro and LC CSE)."""
    params = rollup_params().leaf

    def circuit(cs, sec):
        c_poseidon(list(sec), params)

    cs = _trace(circuit, 3)
    assert any(op.kind == "hint" and op.aux[0] == "poseidon_perm"
               for op in cs.witness_ops.values()), \
        "poseidon must record a macro witness op"
    wp = WitnessProgram.from_parts(Fr, cs.witness_ops, cs.num_aux(),
                                   inputize_lcs=[])
    sec_vals = tuple(Num(Fr, rng.randrange(Fr.p)) for _ in range(3))
    z_in_py, aux_py = wp.evaluate(None, sec_vals)
    z_in_f, aux_f = wp.evaluate_fast(None, sec_vals)
    assert (z_in_py, aux_py) == (z_in_f, aux_f)
    # native evaluator really ran (not the Python fallback)
    assert wp._native is not None


@needs_native
def test_ecc_hints_native_matches_python():
    """subgroup_decompress + ecmul gadgets: exercises the native jubjub
    hints (decompress_inv8 / mul_inv8, Tonelli-Shanks sqrt) and the
    div/bit op kinds plus chain CSE."""
    from fawkes_crypto_tpu.circuit.bitify import c_into_bits_le_strict
    from fawkes_crypto_tpu.circuit.ecc import CEdwardsPoint

    jj = jubjub_bn256()

    def circuit(cs, sec):
        x, s = sec
        p = CEdwardsPoint.subgroup_decompress(x, jj)
        p.mul(c_into_bits_le_strict(s), jj)

    cs = _trace(circuit, 2)
    kinds = {op.kind for op in cs.witness_ops.values()}
    assert "hint" in kinds and "div" in kinds and "bit" in kinds
    wp = WitnessProgram.from_parts(Fr, cs.witness_ops, cs.num_aux(),
                                   inputize_lcs=[])
    g8 = jj.edwards_g.mul(Num(jj.fs, 8), jj)  # decompressable x
    sec_vals = (g8.x, Num(Fr, rng.randrange(Fr.p)))
    z_py, aux_py = wp.evaluate(None, sec_vals)
    z_f, aux_f = wp.evaluate_fast(None, sec_vals)
    assert wp._native is not None
    assert (z_py, aux_py) == (z_f, aux_f)


@needs_native
def test_rollup_batch_native_bit_equal():
    """2-tx rollup batch: C++ batch evaluator == Python loop, roots
    chain correctly, and the raw-limb view reinterprets canonically."""
    params = rollup_params()
    tree, accounts = make_state(params)
    root0 = tree.root()
    from fawkes_crypto_tpu.circuit.rollup import make_txs

    txs = make_txs(tree, accounts, [(0, 1), (2, 3)],
                   [Num(Fr, 700), Num(Fr, 41)], params)
    tmpl = trace_tx_template(params)
    bw = BatchWitness(tmpl)
    assert bw.native is not None
    inputs_nat, aux_nat_u64, roots = bw.evaluate_raw(root0.x, txs)

    # python oracle (force the fallback path)
    native, bw.native = bw.native, None
    inputs_py, aux_py = bw.evaluate(root0.x, txs)
    bw.native = native

    assert inputs_nat == inputs_py
    assert wn._u64_to_ints(aux_nat_u64) == aux_py
    assert inputs_nat[2] == tree.root().x

    # the raw u64 rows ARE the device 16-bit limb encoding
    from fawkes_crypto_tpu.ff.limbs import ints_to_limbs

    limbs = wn.limbs_from_u64(aux_nat_u64)
    ref = np.asarray(ints_to_limbs(aux_py[:64], 16))
    assert np.array_equal(limbs[:64], ref)


@needs_native
def test_single_eval_with_extra_inputs_falls_back():
    """extra_inputs (batch-template pseudo wires) use the Python path via
    evaluate_fast's guard — same results either way."""
    params = rollup_params()
    tmpl = trace_tx_template(params)
    bw = BatchWitness(tmpl)
    tree, accounts = make_state(params)
    from fawkes_crypto_tpu.circuit.rollup import flatten_tx, make_txs

    txs = make_txs(tree, accounts, [(0, 1)], [Num(Fr, 5)], params)
    root = tree.root()  # post-state; witness uses pre-root below
    ext = flatten_tx(txs[0])
    a = bw.wp.evaluate(None, ext, extra_inputs=(123,))
    b = bw.wp.evaluate_fast(None, ext, extra_inputs=(123,))
    assert a == b
