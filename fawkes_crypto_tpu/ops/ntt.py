"""Number-theoretic transform over the SNARK scalar field (TPU-native).

Replaces the FFT inside the reference's external bellman_ce prover
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:80 —
the QAP evaluation iFFT/FFT/coset steps; SURVEY.md §2.4). BN254 Fr has
2-adicity 28, plenty for 2^26-point domains.

Design (TPU-first):
- radix-2 stages expressed as reshapes + batched limb butterflies — fully
  static shapes, no gathers, no data-dependent control flow;
- DIF forward (natural -> bit-reversed) paired with DIT inverse
  (bit-reversed -> natural), so NO runtime bit-reversal permutation is ever
  needed: pointwise work happens in bit-reversed order and the Groth16 CRS
  H-query is stored bit-reversed instead (see backend/groth16/setup.py);
- coset evaluation via precomputed (bit-reversed) shift-power vectors.

All tensors are (..., N, K) uint32 Montgomery limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.hostfield import PrimeField
from ..ff.jfield import FieldCtx
from ..ff.limbs import LIMB_BITS, LIMB_MASK


def bitrev_permutation(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class NTTCtx:
    """Per (field, N) twiddle tables + jitted transforms."""

    _cache = {}

    def __init__(self, fctx: FieldCtx, n: int):
        assert n & (n - 1) == 0, "N must be a power of two"
        fld = fctx.fld
        logn = n.bit_length() - 1
        assert logn <= fld.s, "domain exceeds field 2-adicity"
        self.fctx = fctx
        self.n = n
        self.logn = logn
        w = pow(fld.root_of_unity, 1 << (fld.s - logn), fld.p)
        winv = pow(w, -1, fld.p)
        self.w = w
        # powers w^0 .. w^(n/2-1), Montgomery form
        self.w_pows = self._pow_table(w, n // 2)
        self.winv_pows = self._pow_table(winv, n // 2)
        self.n_inv = jnp.asarray(
            self._enc_one(pow(n, -1, fld.p)), dtype=jnp.uint32
        )

    def _pow_table(self, base: int, count: int) -> np.ndarray:
        fld = self.fctx.fld
        k = self.fctx.k
        out = np.zeros((max(count, 1), k), dtype=np.uint32)
        acc = 1
        for i in range(count):
            m = fld.to_mont(acc)
            for j in range(k):
                out[i, j] = (m >> (LIMB_BITS * j)) & LIMB_MASK
        # tight loop: fill montgomery forms while stepping acc
            acc = (acc * base) % fld.p
        return out

    def _enc_one(self, v: int) -> np.ndarray:
        fld = self.fctx.fld
        k = self.fctx.k
        m = fld.to_mont(v)
        return np.asarray(
            [(m >> (LIMB_BITS * j)) & LIMB_MASK for j in range(k)],
            dtype=np.uint32,
        )

    @classmethod
    def get(cls, fctx: FieldCtx, n: int) -> "NTTCtx":
        key = (id(fctx.fld), n)
        if key not in cls._cache:
            cls._cache[key] = cls(fctx, n)
        return cls._cache[key]

    # --- transforms ---------------------------------------------------------
    def _dif(self, x, pows: np.ndarray):
        """Decimation-in-frequency: natural in -> bit-reversed out."""
        f = self.fctx
        n, k = self.n, f.k
        lead = x.shape[:-2]
        for h in (1 << s for s in range(self.logn - 1, -1, -1)):
            stride = n // (2 * h)
            tw = jnp.asarray(pows[: h * stride : stride])  # (h, K)
            v = x.reshape(lead + (n // (2 * h), 2, h, k))
            u, w_ = v[..., 0, :, :], v[..., 1, :, :]
            top = f.add(u, w_)
            bot = f.mont_mul(f.sub(u, w_), tw)
            x = jnp.stack([top, bot], axis=-3).reshape(lead + (n, k))
        return x

    def _dit(self, x, pows: np.ndarray):
        """Decimation-in-time: bit-reversed in -> natural out."""
        f = self.fctx
        n, k = self.n, f.k
        lead = x.shape[:-2]
        for h in (1 << s for s in range(self.logn)):
            stride = n // (2 * h)
            tw = jnp.asarray(pows[: h * stride : stride])  # (h, K)
            v = x.reshape(lead + (n // (2 * h), 2, h, k))
            u, w_ = v[..., 0, :, :], v[..., 1, :, :]
            wv = f.mont_mul(w_, tw)
            top = f.add(u, wv)
            bot = f.sub(u, wv)
            x = jnp.stack([top, bot], axis=-3).reshape(lead + (n, k))
        return x

    def ntt(self, coeffs):
        """coeffs (natural order) -> evaluations (bit-reversed order)."""
        return self._dif(coeffs, self.w_pows)

    def intt(self, evals_br):
        """evaluations (bit-reversed order) -> coeffs (natural order)."""
        x = self._dit(evals_br, self.winv_pows)
        return self.fctx.mont_mul(x, self.n_inv)

    def evals_to_coeffs_br(self, evals_nat):
        """evaluations (natural) -> coeffs (bit-reversed)."""
        x = self._dif(evals_nat, self.winv_pows)
        return self.fctx.mont_mul(x, self.n_inv)

    def coeffs_br_to_evals(self, coeffs_br):
        """coeffs (bit-reversed) -> evaluations (natural)."""
        return self._dit(coeffs_br, self.w_pows)

    # --- jitted entry points -------------------------------------------------
    @functools.cached_property
    def jit_ntt(self):
        return jax.jit(self.ntt)

    @functools.cached_property
    def jit_intt(self):
        return jax.jit(self.intt)

    @functools.cached_property
    def jit_evals_to_coeffs_br(self):
        return jax.jit(self.evals_to_coeffs_br)

    @functools.cached_property
    def jit_coeffs_br_to_evals(self):
        return jax.jit(self.coeffs_br_to_evals)

    # --- coset helpers --------------------------------------------------------
    def shift_pows_br(self, g: int) -> jnp.ndarray:
        """(g^i) for i in bit-reversed index order, Montgomery (N, K)."""
        fld = self.fctx.fld
        rev = bitrev_permutation(self.n)
        pows = np.zeros((self.n, self.fctx.k), dtype=np.uint32)
        acc = 1
        tmp = np.zeros((self.n, self.fctx.k), dtype=np.uint32)
        for i in range(self.n):
            m = fld.to_mont(acc)
            for j in range(self.fctx.k):
                tmp[i, j] = (m >> (LIMB_BITS * j)) & LIMB_MASK
            acc = (acc * g) % fld.p
        pows = tmp[rev]
        return jnp.asarray(pows)
