"""Batch-replicated R1CS: trace one rollup tx, stamp out N copies
numerically.

The reference (and bellman) re-trace the whole 35.7M-constraint circuit
in memory for setup and re-run the witness interpreter per proof
(backend/bellman_groth16/{setup.rs:7-35, prover.rs:63-90}). At rollup
scale that is minutes of single-threaded work before any field math
happens. Because every tx of the batch is structurally identical
(circuit/rollup.py — same gates, same const decisions), the TPU build
traces ONE tx into a template and replicates:

  * R1CS: template COO rows shifted by copy index; the only inter-copy
    coupling is the running Merkle root — the template tags it as
    pseudo-input wire 1, and copy i's tagged terms are spliced with
    copy i-1's root-output linear combination (a ~4-term expansion in
    exactly one constraint row per copy);
  * witness: one compiled witness program (backend/groth16/witness.py)
    evaluated per copy with the root value threading through.

Global wire layout: inputs [ONE, root_in, root_out], then aux =
n_txs * T template wires. Gates: n_txs * TX_GATES + 1 (the final root
inputize), + num_input dummy rows (qap.py convention).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ...circuit.cs import BuildCS
from ...circuit.lc import AUX_BASE, input_idx
from ...circuit.num import CNum
from ...circuit.rollup import RollupParams, alloc_tx, c_rollup_tx, flatten_tx
from .qap import R1CS

ROOT_MARKER = 1  # pseudo-input wire carrying the per-copy running root


@dataclass
class TxTemplate:
    """One traced tx: COO template + witness program + root-out LC."""

    fld: object
    G: int                      # gates per tx
    T: int                      # aux wires per tx
    # per matrix: (rows int64, cols int64 raw template idx, vals list)
    mats: Tuple
    root_out: List[Tuple[int, int]]   # final-root LC [(coeff, tmpl idx)]
    witness_ops: dict
    const_tracker: List[bool]
    rollup_params: RollupParams


def trace_tx_template(params: RollupParams) -> TxTemplate:
    """Trace c_rollup_tx once with the running root as pseudo-input 1."""
    from ...circuit.lc import LC

    fld = params.node.fld
    cs = BuildCS(fld)
    root = CNum(cs, None, LC.from_index(fld.p, input_idx(ROOT_MARKER)))
    tx = alloc_tx(cs, None)
    out = c_rollup_tx(root, tx, params)

    mats = []
    for part in range(3):
        rows, cols, vals = [], [], []
        for j, g in enumerate(cs.gates):
            for coeff, idx in (g.a, g.b, g.c)[part]:
                rows.append(j)
                cols.append(idx)
                vals.append(coeff)
        mats.append((np.asarray(rows, dtype=np.int64),
                     np.asarray(cols, dtype=np.int64), vals))

    return TxTemplate(
        fld=fld, G=len(cs.gates), T=cs.num_aux(), mats=tuple(mats),
        root_out=list(out.lc.to_vec()),
        witness_ops=dict(cs.witness_ops),
        const_tracker=list(cs.const_tracker),
        rollup_params=params,
    )


def _map_col(idx: int, copy: int, T: int, num_input: int) -> int:
    """Template wire -> global wire for a given copy (non-root terms)."""
    if idx >= AUX_BASE:
        return num_input + copy * T + (idx - AUX_BASE)
    assert idx == 0, "unexpected input wire in template"
    return 0


def replicate_r1cs(tmpl: TxTemplate, n_txs: int, p: int) -> R1CS:
    """Stamp the template into a full batch R1CS (numpy, no re-tracing)."""
    G, T = tmpl.G, tmpl.T
    num_input = 3
    n_gates = n_txs * G + 1
    num_constraints = n_gates + num_input
    domain = 1 << max(1, (num_constraints - 1).bit_length())

    out = []
    for part in range(3):
        rows_t, cols_t, vals_t = tmpl.mats[part]
        is_aux = cols_t >= AUX_BASE
        is_root = cols_t == ROOT_MARKER
        is_one = cols_t == 0
        assert int(is_aux.sum() + is_root.sum() + is_one.sum()) == len(cols_t)

        seg_rows, seg_cols, seg_vals = [], [], []

        # aux terms: one vectorized shift per copy axis
        ra, ca, va = rows_t[is_aux], cols_t[is_aux] - AUX_BASE, \
            [v for v, m in zip(vals_t, is_aux) if m]
        copies = np.arange(n_txs, dtype=np.int64)
        seg_rows.append((copies[:, None] * G + ra[None, :]).ravel())
        seg_cols.append(
            (copies[:, None] * T + ca[None, :]).ravel() + num_input)
        seg_vals.append(va * n_txs)

        # constant (ONE) terms: same col 0 in every copy
        ro, vo = rows_t[is_one], [v for v, m in zip(vals_t, is_one) if m]
        if len(ro):
            seg_rows.append((copies[:, None] * G + ro[None, :]).ravel())
            seg_cols.append(np.zeros(n_txs * len(ro), dtype=np.int64))
            seg_vals.append(vo * n_txs)

        # root terms: copy 0 -> global input 1; copy i -> splice copy
        # i-1's root-out LC
        rr = rows_t[is_root]
        vr = [v for v, m in zip(vals_t, is_root) if m]
        if len(rr):
            seg_rows.append(rr.copy())
            seg_cols.append(np.ones(len(rr), dtype=np.int64))
            seg_vals.append(list(vr))
            sp_rows, sp_cols, sp_vals = [], [], []
            for i in range(1, n_txs):
                for r_t, coeff in zip(rr, vr):
                    for oc, oi in tmpl.root_out:
                        sp_rows.append(i * G + int(r_t))
                        sp_cols.append(_map_col(oi, i - 1, T, num_input))
                        sp_vals.append(coeff * oc % p)
            if sp_rows:
                seg_rows.append(np.asarray(sp_rows, dtype=np.int64))
                seg_cols.append(np.asarray(sp_cols, dtype=np.int64))
                seg_vals.append(sp_vals)

        # final inputize gate (row n_txs*G): A = last copy's root-out LC,
        # B = ONE, C = input 2 (cs.py inputize convention)
        r_fin = n_txs * G
        if part == 0:
            fr_, fc_, fv_ = [], [], []
            for oc, oi in tmpl.root_out:
                fr_.append(r_fin)
                fc_.append(_map_col(oi, n_txs - 1, T, num_input))
                fv_.append(oc)
            seg_rows.append(np.asarray(fr_, dtype=np.int64))
            seg_cols.append(np.asarray(fc_, dtype=np.int64))
            seg_vals.append(fv_)
            # bellman-style input dummy rows (A = input_i)
            seg_rows.append(np.arange(num_input, dtype=np.int64) + n_gates)
            seg_cols.append(np.arange(num_input, dtype=np.int64))
            seg_vals.append([1] * num_input)
        elif part == 1:
            seg_rows.append(np.asarray([r_fin], dtype=np.int64))
            seg_cols.append(np.asarray([0], dtype=np.int64))
            seg_vals.append([1])
        else:
            seg_rows.append(np.asarray([r_fin], dtype=np.int64))
            seg_cols.append(np.asarray([2], dtype=np.int64))
            seg_vals.append([1])

        rows = np.concatenate(seg_rows)
        cols = np.concatenate(seg_cols)
        vals = []
        for sv in seg_vals:
            vals.extend(sv)
        assert len(vals) == len(rows)
        out.append((rows, cols, vals))

    (ar, ac, av), (br, bc, bv), (cr, cc, cv) = out
    return R1CS(
        num_input=num_input, num_aux=n_txs * T,
        num_constraints=num_constraints, domain=domain,
        a_rows=ar, a_cols=ac, a_vals=av,
        b_rows=br, b_cols=bc, b_vals=bv,
        c_rows=cr, c_cols=cc, c_vals=cv,
    )


class BatchWitness:
    """Per-copy witness evaluation: the template's compiled witness
    program threaded over the running root. Uses the C++ evaluator
    (witness_native.py) when available — the compiled-replay analog of
    the reference's Rust witness pass (prover.rs:69-74) — with the
    Python interpreter as oracle/fallback."""

    def __init__(self, tmpl: TxTemplate):
        from .witness import WitnessProgram

        self.tmpl = tmpl
        self.fr = tmpl.fld
        self.wp = WitnessProgram.from_parts(
            tmpl.fld, tmpl.witness_ops, tmpl.T, inputize_lcs=[])
        self.native = None
        try:
            from . import witness_native as wn

            if wn.available():
                self.native = wn.NativeProgram(
                    self.wp, n_extra=1, root_lc=tmpl.root_out)
        except Exception:
            self.native = None

    def _ext_array(self, txs) -> np.ndarray:
        from .witness import _flatten_values
        from .witness_native import _ints_to_u64

        p = self.fr.p
        return np.stack([
            _ints_to_u64(_flatten_values(
                flatten_tx(tx) if not isinstance(tx, tuple) else tx, p))
            for tx in txs
        ])

    def evaluate_raw(self, root_in: int, txs, want_mont: bool = False):
        """Native batch path -> (inputs [1, root_in, root_out],
        aux (n_txs*T, 4) uint64 canonical LE, roots (n_txs+1, 4)
        [, aux_mont with want_mont]). None if the native evaluator is
        unavailable."""
        if self.native is None:
            return None
        p = self.fr.p
        out = self.native.eval_batch_raw(
            self._ext_array(txs), root_in % p, want_mont=want_mont)
        aux, roots = out[0], out[1]
        b = roots[-1].tobytes()
        root_out = int.from_bytes(b, "little")
        res = [[1, root_in % p, root_out], aux, roots]
        if want_mont:
            res.append(out[2])
        return tuple(res)

    def evaluate(self, root_in: int, txs) -> Tuple[List[int], List[int]]:
        """-> (inputs [1, root_in, root_out], aux concat)."""
        raw = self.evaluate_raw(root_in, txs)
        if raw is not None:
            from .witness_native import _u64_to_ints

            inputs, aux, _ = raw
            return inputs, _u64_to_ints(aux)
        p = self.fr.p
        root = root_in % p
        z_aux_all: List[int] = []
        for tx in txs:
            ext = flatten_tx(tx) if not isinstance(tx, tuple) else tx
            _, z_aux = self.wp.evaluate(None, ext, extra_inputs=(root,))
            z_aux_all.extend(z_aux)
            acc = 0
            for idx, coeff in _lc_items(self.tmpl.root_out):
                if idx >= AUX_BASE:
                    acc += coeff * z_aux[idx - AUX_BASE]
                elif idx == ROOT_MARKER:
                    acc += coeff * root
                else:
                    acc += coeff
            root = acc % p
        return [1, root_in % p, root], z_aux_all


def _lc_items(lc_vec):
    for coeff, idx in lc_vec:
        yield idx, coeff


def rollup_setup(n_txs: int, rollup_params: Optional[RollupParams] = None,
                 seed: Optional[bytes] = None, engine: str = "bn256",
                 device: Optional[bool] = None):
    """Groth16 setup for an n_txs rollup batch without tracing the full
    circuit: template trace + numeric replication + shared CRS path
    (setup.crs_from_r1cs). Returns Parameters with .batch set."""
    from ...engines.engine import Engine
    from .params import Parameters
    from .setup import crs_from_r1cs

    E = Engine.get(engine)
    if rollup_params is None:
        from ...engines.bn256 import jubjub_bn256

        rollup_params = RollupParams.new(E.fr, jubjub_bn256())
    tmpl = trace_tx_template(rollup_params)
    r1cs = replicate_r1cs(tmpl, n_txs, E.fr.p)
    vk, pk = crs_from_r1cs(E, r1cs, seed=seed, device=device,
                           engine=engine)
    return Parameters(
        vk=vk, pk=pk, r1cs=r1cs,
        const_tracker=[], witness_ops={}, n_public=2,
        inputize_lcs=[], engine=engine,
        batch=(tmpl, n_txs),
    )
