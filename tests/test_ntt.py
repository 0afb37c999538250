"""NTT vs host DFT oracle + convolution property."""

import random

import jax.numpy as jnp
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.ntt import NTTCtx, bitrev_permutation

rng = random.Random(99)


def host_dft(vals, w, p):
    n = len(vals)
    return [
        sum(vals[j] * pow(w, i * j, p) for j in range(n)) % p for i in range(n)
    ]


def test_ntt_matches_host_dft():
    n = 16
    fctx = FieldCtx.get(Fr)
    ntt = NTTCtx.get(fctx, n)
    vals = [rng.randrange(Fr.p) for _ in range(n)]
    x = jnp.asarray(fctx.encode(vals))
    out_br = ntt.jit_ntt(x)
    got = fctx.decode(out_br)
    rev = bitrev_permutation(n)
    want_nat = host_dft(vals, ntt.w, Fr.p)
    want_br = [want_nat[rev[i]] for i in range(n)]
    assert got == want_br


def test_intt_roundtrip():
    n = 16
    fctx = FieldCtx.get(Fr)
    ntt = NTTCtx.get(fctx, n)
    vals = [rng.randrange(Fr.p) for _ in range(n)]
    x = jnp.asarray(fctx.encode(vals))
    back = ntt.jit_intt(ntt.jit_ntt(x))
    assert fctx.decode(back) == vals
    # the other direction: evals(nat) -> coeffs(br) -> evals(nat)
    back2 = ntt.jit_coeffs_br_to_evals(ntt.jit_evals_to_coeffs_br(x))
    assert fctx.decode(back2) == vals


def test_polynomial_multiplication():
    # degree < n/2 polys: conv via NTT == schoolbook conv mod p
    n = 16
    half = n // 2
    fctx = FieldCtx.get(Fr)
    ntt = NTTCtx.get(fctx, n)
    a = [rng.randrange(Fr.p) for _ in range(half)] + [0] * half
    b = [rng.randrange(Fr.p) for _ in range(half)] + [0] * half
    xa = jnp.asarray(fctx.encode(a))
    xb = jnp.asarray(fctx.encode(b))
    ea, eb = ntt.jit_ntt(xa), ntt.jit_ntt(xb)
    prod = fctx.jit_mul(ea, eb)  # pointwise in bit-reversed order: fine
    coeffs = fctx.decode(ntt.jit_intt(prod))
    want = [0] * n
    for i in range(half):
        for j in range(half):
            want[i + j] = (want[i + j] + a[i] * b[j]) % Fr.p
    assert coeffs == want


def test_coset_evaluation():
    # Z_H(g*w^i) is the constant g^n - 1 on the coset; verify coset round trip
    n = 16
    g = Fr.generator  # multiplicative generator, not in H
    fctx = FieldCtx.get(Fr)
    ntt = NTTCtx.get(fctx, n)
    vals = [rng.randrange(Fr.p) for _ in range(n)]
    x = jnp.asarray(fctx.encode(vals))  # coefficients
    gp = ntt.shift_pows_br(g)
    ginvp = ntt.shift_pows_br(pow(g, -1, Fr.p))
    # coeffs -> coset evals: scale coeff_i by g^i (bitrev aligned) then DIT
    coeffs_br = ntt.jit_evals_to_coeffs_br(ntt.jit_coeffs_br_to_evals(
        jnp.asarray(fctx.encode(vals))))  # identity warmup
    scaled = fctx.jit_mul(coeffs_br, gp)
    coset_evals = ntt.jit_coeffs_br_to_evals(scaled)
    got = fctx.decode(coset_evals)
    # host oracle: evaluate poly with bitrev coeff order at g*w^i
    rev = bitrev_permutation(n)
    coeffs_nat = fctx.decode(coeffs_br)
    inv_rev = np.argsort(rev)
    coeffs_nat = [coeffs_nat[int(inv_rev[i])] for i in range(n)]
    want = [
        sum(coeffs_nat[j] * pow((g * pow(ntt.w, i, Fr.p)) % Fr.p, j, Fr.p)
            for j in range(n)) % Fr.p
        for i in range(n)
    ]
    assert got == want
    # and back
    back = fctx.jit_mul(ntt.jit_evals_to_coeffs_br(coset_evals), ginvp)
    assert fctx.decode(back) == fctx.decode(coeffs_br)
