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


def test_lntt_threshold_interpret_cpu(monkeypatch):
    """CPU coverage for the Pallas-mul threshold logic (VERDICT r4 item
    9): force the threshold down and run the Pallas branch in interpret
    mode on a tiny domain; results must match the XLA path bit-for-bit."""
    import fawkes_crypto_tpu.ops.lntt as lntt_mod

    monkeypatch.setenv("FAWKES_LNTT_INTERPRET", "1")
    monkeypatch.setattr(lntt_mod, "_PALLAS_MIN", 128)
    # fresh ctx (the cache would return a non-interpret instance)
    lntt_mod.LNTTCtx._cache.pop((id(Fr), 512), None)
    try:
        fctx = FieldCtx.get(Fr)
        lntt = lntt_mod.LNTTCtx(fctx, 512)
        assert lntt.use_pallas and lntt.interpret
        rng = random.Random(3)
        vals = [rng.randrange(Fr.p) for _ in range(512)]
        x = jnp.asarray(fctx.encode(vals))
        base = NTTCtx.get(fctx, 512)
        got = np.asarray(from_lf(lntt.evals_to_coeffs_br(to_lf(x))))
        ref = np.asarray(base.jit_evals_to_coeffs_br(x))
        assert np.array_equal(got, ref)
    finally:
        lntt_mod.LNTTCtx._cache.pop((id(Fr), 512), None)
