"""Limbs-first NTT (ops/lntt.py) vs the batch-last reference (ops/ntt.py)
and the host polynomial oracle."""

import random

import jax.numpy as jnp
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.lntt import LNTTCtx, from_lf, to_lf
from fawkes_crypto_tpu.ops.ntt import NTTCtx

rng = random.Random(7)


def _rand_vals(n):
    return [rng.randrange(Fr.p) for _ in range(n)]


def _check_n(n):
    import jax

    fctx = FieldCtx.get(Fr)
    base = NTTCtx.get(fctx, n)
    lntt = LNTTCtx.get(fctx, n)
    vals = _rand_vals(n)
    x = jnp.asarray(fctx.encode(vals))  # (N, K) mont

    # forward matches batch-last NTT exactly (same limbs)
    ref = np.asarray(base.jit_ntt(x))
    got = np.asarray(from_lf(lntt.jit_ntt(to_lf(x))))
    assert np.array_equal(ref, got), f"fwd mismatch n={n}"

    # inverse round-trips
    back = fctx.decode(from_lf(lntt.jit_intt(lntt.jit_ntt(to_lf(x)))))
    assert back == vals, f"intt(ntt(x)) != x, n={n}"

    # evals<->coeffs_br pair round-trips and matches batch-last
    e2c_fn = jax.jit(lntt.evals_to_coeffs_br)
    c2e_fn = jax.jit(lntt.coeffs_br_to_evals)
    e2c = np.asarray(from_lf(e2c_fn(to_lf(x))))
    ref_e2c = np.asarray(base.jit_evals_to_coeffs_br(x))
    assert np.array_equal(e2c, ref_e2c), f"e2c mismatch n={n}"
    ev = fctx.decode(from_lf(c2e_fn(e2c_fn(to_lf(x)))))
    assert ev == vals, f"c2e(e2c(x)) != x, n={n}"


def test_lntt_small():
    _check_n(8)


def test_lntt_medium():
    _check_n(256)


from conftest import heavy_test  # noqa: E402


@heavy_test
def test_lntt_pallas_threshold():
    # n = 2048: half-size 1024 crosses the Pallas-kernel threshold on TPU
    # (on the CPU test mesh this takes the XLA path; the TPU path is
    # exercised by scripts/validate_tpu.py and the bench). Heavy-gated:
    # the cold XLA-CPU compile of the n=2048 graph takes tens of minutes
    # and tens of GB on the 2-CPU CI box.
    _check_n(2048)
