"""Device sparse matvec + wide-accumulator reduction vs host oracle."""

import random

import jax.numpy as jnp
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.spmv import SpMV

rng = random.Random(17)


def test_spmv_matches_host():
    fctx = FieldCtx.get(Fr)
    n_rows, n_cols, nnz = 13, 9, 40
    rows = sorted(rng.randrange(n_rows) for _ in range(nnz))
    cols = [rng.randrange(n_cols) for _ in range(nnz)]
    vals = [rng.randrange(Fr.p) for _ in range(nnz)]
    z = [rng.randrange(Fr.p) for _ in range(n_cols)]

    m = SpMV(fctx, rows, cols, vals, n_rows, n_cols)
    out = m.apply(jnp.asarray(fctx.encode(z)))
    got = fctx.decode(out)

    want = [0] * n_rows
    for r, c, v in zip(rows, cols, vals):
        want[r] = (want[r] + v * z[c]) % Fr.p
    assert got == want


def test_reduce_cols_wide():
    fctx = FieldCtx.get(Fr)
    k = fctx.k
    # adversarial wide accumulators: near-max uint32 column values
    t = np.zeros((3, k), dtype=np.uint32)
    t[0, :] = (1 << 31) - 1
    t[1, 0] = 0xFFFF
    t[2, :] = 12345
    got = fctx.decode(fctx.reduce_cols(jnp.asarray(t)), mont=False)
    for j in range(3):
        v = sum(int(t[j, i]) << (16 * i) for i in range(k))
        assert got[j] == v % Fr.p
