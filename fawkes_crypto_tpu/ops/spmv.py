"""Device sparse matrix-vector products over a prime field (COO layout).

The TPU-native flattening of the reference's linked-list linear
combinations (SURVEY.md north star: "R1CS Signal linked-list linear
combinations flattened into batched sparse-matrix witness evaluation") —
used for the az/bz/cz evaluations of the QAP (the per-gate <a,z> dot
products bellman performs during synthesize, reference
backend/bellman_groth16/mod.rs:61-102).

Strategy: gather z at the term columns, Montgomery-multiply by the term
coefficients, then limbwise segment_sum per row — limb sums of <= 2^15
terms stay exact in uint32 — and fold each wide accumulator back to a
field element with a single REDC (FieldCtx.reduce_cols). Values stay in
Montgomery form end-to-end, so the output feeds the NTT directly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.jfield import FieldCtx


class SpMV:
    """One compiled (matrix, field) sparse product: z (mont) -> M z (mont).

    Above `chunk` nonzeros the product runs as a lax.scan over nnz
    slices (gather + mont_mul + segment_sum + field-add into the
    accumulator): the rollup B matrix alone has ~10^8 terms, and a
    single-shot evaluation would materialize huge temporaries (the
    XLA mont_mul's wide-product tensor is (nnz, K, 2K+1) — 17GB at
    2^23 terms) — more than HBM alongside the CRS, and enough to OOM
    the AOT compile."""

    def __init__(self, fctx: FieldCtx, rows, cols, vals: Sequence[int],
                 n_rows: int, n_cols: int, chunk: int = 1 << 20):
        self.fctx = fctx
        self.n_rows = n_rows
        self.n_cols = n_cols
        rows = np.asarray(rows, dtype=np.int32)
        cols = np.asarray(cols, dtype=np.int32)
        # exactness bound for uint32 limb segment sums
        if len(rows):
            longest = int(np.bincount(rows).max())
            assert longest < (1 << 15), "row too dense for u32 limb sums"
        # Coefficients are overwhelmingly repeated (+-1, +-2^i, Poseidon
        # round constants): store one (distinct, K) Montgomery table plus
        # a (nnz,) index — 4 bytes/term instead of 4K bytes/term. At
        # rollup scale this is the difference between the az/bz/cz
        # matrices fitting in HBM alongside the CRS or not.
        uniq: dict = {}
        idx = np.empty(len(rows), dtype=np.int32)
        for i, v in enumerate(vals):
            j = uniq.get(v)
            if j is None:
                j = len(uniq)
                uniq[v] = j
            idx[i] = j
        table = list(uniq.keys())
        self.n_chunks = max(1, -(-len(rows) // chunk))
        if self.n_chunks > 1:
            # pad nnz to a chunk multiple with zero-coefficient terms
            # (coeff 0 contributes nothing to row 0)
            z_ix = uniq.get(0)
            if z_ix is None:
                z_ix = len(table)
                table.append(0)
            pad = self.n_chunks * chunk - len(rows)
            rows = np.concatenate(
                [rows, np.zeros(pad, dtype=np.int32)])
            cols = np.concatenate(
                [cols, np.zeros(pad, dtype=np.int32)])
            idx = np.concatenate(
                [idx, np.full(pad, z_ix, dtype=np.int32)])
        self.rows = jnp.asarray(rows)
        self.cols = jnp.asarray(cols)
        self.val_idx = jnp.asarray(idx)
        self.val_table = jnp.asarray(
            fctx.encode(table))  # mont (distinct, K)

    @property
    def arrays(self):
        """The large device arrays as a pytree — pass these as jit
        ARGUMENTS (apply_arrays) on paths where captured constants are
        expensive (the axon remote compiler ships every captured
        constant with the HLO payload; at rollup scale that is GBs)."""
        return (self.rows, self.cols, self.val_idx, self.val_table)

    def apply_arrays(self, z, arrays):
        """z: (n_cols, K) Montgomery -> (n_rows, K) Montgomery."""
        rows, cols, val_idx, val_table = arrays
        f = self.fctx
        if self.n_chunks == 1:
            vals = jnp.take(val_table, val_idx, axis=0)
            terms = f.mont_mul(vals, jnp.take(z, cols, axis=0))
            sums = jax.ops.segment_sum(
                terms, rows, num_segments=self.n_rows
            )  # (n_rows, K) raw limb sums
            return f.reduce_cols(sums)

        nc = self.n_chunks
        sl = (rows.reshape(nc, -1), cols.reshape(nc, -1),
              val_idx.reshape(nc, -1))

        # raw u32 limb sums accumulate safely ACROSS chunks too: the
        # <2^15-terms-per-row bound asserted above is global, so every
        # limb stays < 2^31; one REDC folds the total at the end
        def step(acc, s):
            r, c, vi = s
            vals = jnp.take(val_table, vi, axis=0)
            terms = f.mont_mul(vals, jnp.take(z, c, axis=0))
            sums = jax.ops.segment_sum(
                terms, r, num_segments=self.n_rows)
            return acc + sums, None

        acc = jnp.zeros((self.n_rows, z.shape[-1]), dtype=jnp.uint32)
        acc, _ = jax.lax.scan(step, acc, sl)
        return f.reduce_cols(acc)

    def apply(self, z):
        return self.apply_arrays(z, self.arrays)
