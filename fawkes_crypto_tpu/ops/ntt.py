"""Number-theoretic transform over the SNARK scalar field (TPU-native).

Replaces the FFT inside the reference's external bellman_ce prover
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:80 —
the QAP evaluation iFFT/FFT/coset steps; SURVEY.md §2.4). BN254 Fr has
2-adicity 28, plenty for 2^26-point domains.

Design (TPU-first, compile-light):
- constant-geometry (Pease) radix-2 network: EVERY stage has the identical
  dataflow — split halves, butterfly, interleave — so the whole transform
  is ONE lax.scan over log2(N) stages (one compiled butterfly body, not
  log2(N) inlined ones). Stage-s twiddle for lane i is w^(2^s * (i >> s)),
  gathered from the single (N/2, K) power table with static-shape ops;
- forward network: natural order in -> bit-reversed order out; inverse
  network (deinterleave, mirrored stage order, inverse twiddles):
  bit-reversed in -> natural out. NO runtime bit-reversal permutation is
  ever needed: pointwise work happens in bit-reversed order and the
  Groth16 CRS H-query is stored bit-reversed instead (backend/groth16/
  device.py);
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
        self.w_pows = jnp.asarray(self._pow_table(w, max(n // 2, 1)))
        self.winv_pows = jnp.asarray(self._pow_table(winv, max(n // 2, 1)))
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
    def _stage_tw(self, pows, s):
        """Twiddles for Pease stage s: pows[(i >> s) << s], i < N/2."""
        idx = jnp.arange(self.n // 2, dtype=jnp.int32)
        return jnp.take(pows, (idx >> s) << s, axis=0)

    def _fwd(self, x, pows):
        """Constant-geometry forward: natural in -> bit-reversed out.

        Each stage: (u, w) = halves; out = interleave(u+w, (u-w)*tw_s).
        """
        f = self.fctx
        n, k = self.n, f.k
        if self.logn == 0:
            return x
        lead = x.shape[:-2]

        def stage(xc, s):
            u = xc[..., : n // 2, :]
            w_ = xc[..., n // 2 :, :]
            tw = self._stage_tw(pows, s)
            top = f.add(u, w_)
            bot = f.mont_mul(f.sub(u, w_), tw)
            out = jnp.stack([top, bot], axis=-2)  # (..., n/2, 2, k)
            return out.reshape(lead + (n, k)), None

        x, _ = jax.lax.scan(stage, x, jnp.arange(self.logn, dtype=jnp.int32))
        return x

    def _inv(self, x, pows):
        """Mirror inverse network: bit-reversed in -> natural out, scaled
        by N (callers multiply by n_inv)."""
        f = self.fctx
        n, k = self.n, f.k
        if self.logn == 0:
            return x
        lead = x.shape[:-2]

        def stage(xc, s):
            v = xc.reshape(lead + (n // 2, 2, k))
            u = v[..., 0, :]
            w_ = v[..., 1, :]
            tw = self._stage_tw(pows, s)
            wt = f.mont_mul(w_, tw)
            out = jnp.concatenate([f.add(u, wt), f.sub(u, wt)], axis=-2)
            return out, None

        stages = jnp.arange(self.logn - 1, -1, -1, dtype=jnp.int32)
        x, _ = jax.lax.scan(stage, x, stages)
        return x

    def ntt(self, coeffs):
        """coeffs (natural order) -> evaluations (bit-reversed order)."""
        return self._fwd(coeffs, self.w_pows)

    def intt(self, evals_br):
        """evaluations (bit-reversed order) -> coeffs (natural order)."""
        x = self._inv(evals_br, self.winv_pows)
        return self.fctx.mont_mul(x, self.n_inv)

    def evals_to_coeffs_br(self, evals_nat):
        """evaluations (natural) -> coeffs (bit-reversed)."""
        x = self._fwd(evals_nat, self.winv_pows)
        return self.fctx.mont_mul(x, self.n_inv)

    def coeffs_br_to_evals(self, coeffs_br):
        """coeffs (bit-reversed) -> evaluations (natural)."""
        return self._inv(coeffs_br, self.w_pows)

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
        acc = 1
        tmp = np.zeros((self.n, self.fctx.k), dtype=np.uint32)
        for i in range(self.n):
            m = fld.to_mont(acc)
            for j in range(self.fctx.k):
                tmp[i, j] = (m >> (LIMB_BITS * j)) & LIMB_MASK
            acc = (acc * g) % fld.p
        return jnp.asarray(tmp[rev])
