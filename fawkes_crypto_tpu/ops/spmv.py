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
        self.vals = jnp.asarray(fctx.encode([v for v in vals]))  # mont (nnz, K)

    def apply(self, z):
        """z: (n_cols, K) Montgomery -> (n_rows, K) Montgomery."""
        f = self.fctx
        terms = f.mont_mul(self.vals, jnp.take(z, self.cols, axis=0))
        sums = jax.ops.segment_sum(
            terms, self.rows, num_segments=self.n_rows
        )  # (n_rows, K) raw limb sums
        return f.reduce_cols(sums)
