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
    """One compiled (matrix, field) sparse product: z (mont) -> M z (mont)."""

    def __init__(self, fctx: FieldCtx, rows, cols, vals: Sequence[int],
                 n_rows: int, n_cols: int):
        self.fctx = fctx
        self.n_rows = n_rows
        self.n_cols = n_cols
        rows = np.asarray(rows, dtype=np.int32)
        # exactness bound for uint32 limb segment sums
        if len(rows):
            longest = int(np.bincount(rows).max())
            assert longest < (1 << 15), "row too dense for u32 limb sums"
        self.rows = jnp.asarray(rows)
        self.cols = jnp.asarray(np.asarray(cols, dtype=np.int32))
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
        self.val_idx = jnp.asarray(idx)
        self.val_table = jnp.asarray(
            fctx.encode(list(uniq.keys())))  # mont (distinct, K)

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
        vals = jnp.take(val_table, val_idx, axis=0)
        terms = f.mont_mul(vals, jnp.take(z, cols, axis=0))
        sums = jax.ops.segment_sum(
            terms, rows, num_segments=self.n_rows
        )  # (n_rows, K) raw limb sums
        return f.reduce_cols(sums)

    def apply(self, z):
        return self.apply_arrays(z, self.arrays)
