"""Limbs-first NTT: the Pease network on (K, N) tensors with Pallas
Montgomery butterflies.

Replaces the batch-last NTT of ops/ntt.py on the prover hot path (QAP
iFFT/FFT/coset inside the reference's create_random_proof,
/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:80).
The batch-last (..., K) layout puts the 16 limbs on the 128-wide lane
axis (7/8 idle) and serializes carries through lax.scan — measured
~5.9M mont-muls/s on a v5e. Limbs-first (K, N) puts the transform
domain on lanes and unrolls carries; the stage twiddle product runs in
the Pallas mont_mul kernel (ff/pfield.py, ~633M muls/s), everything
else (add/sub/interleave) is plain XLA on uint32 planes.

Same order conventions as ops/ntt.py (natural -> bit-reversed forward,
mirrored inverse, zero-gather twiddles): stage twiddles are strided
slices of the single power table, broadcast with static reshapes — no
dynamic gathers anywhere.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.jfield import FieldCtx
from ..ff.pfield import PField
from .ntt import NTTCtx

# minimum half-size for the Pallas mul path: one (8, 128) grid block.
# FAWKES_LNTT_PALLAS_MIN lowers it so CI can exercise the threshold
# logic in interpret mode on tiny domains (tests/test_lntt.py).
import os as _os

_PALLAS_MIN = int(_os.environ.get("FAWKES_LNTT_PALLAS_MIN", "1024"))


def to_lf(x: jnp.ndarray) -> jnp.ndarray:
    """(N, K) batch-last -> (K, N) limbs-first."""
    return jnp.transpose(x)


def from_lf(x: jnp.ndarray) -> jnp.ndarray:
    """(K, N) limbs-first -> (N, K) batch-last."""
    return jnp.transpose(x)


class LNTTCtx:
    """Per (field, N) limbs-first transform pair. All arrays (K, N)
    uint32 Montgomery limbs."""

    _cache = {}

    def __init__(self, fctx: FieldCtx, n: int):
        self.base = NTTCtx.get(fctx, n)  # shares twiddle tables
        self.fctx = fctx
        self.pf = PField.get(fctx.fld)
        self.n = n
        self.logn = self.base.logn
        self.k = fctx.k
        # batch-last (N/2, K) twiddle tables (row-gathered per stage)
        self.w_pows = self.base.w_pows
        self.winv_pows = self.base.winv_pows
        self.n_inv = self.base.n_inv  # (K,)
        # FAWKES_LNTT_INTERPRET=1 runs the Pallas branch in interpret
        # mode off-TPU — CPU coverage for the kernel + threshold logic
        self.interpret = _os.environ.get(
            "FAWKES_LNTT_INTERPRET", "") not in ("", "0")
        self.use_pallas = jax.default_backend() == "tpu" or self.interpret

    @classmethod
    def get(cls, fctx: FieldCtx, n: int) -> "LNTTCtx":
        key = (id(fctx.fld), n)
        if key not in cls._cache:
            cls._cache[key] = cls(fctx, n)
        return cls._cache[key]

    # ---- element-wise Montgomery product on (K, M) planes ------------------
    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product of two (K, M) limbs-first tensors."""
        k = self.k
        m = a.shape[1]
        if self.use_pallas and m >= _PALLAS_MIN and m % _PALLAS_MIN == 0:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            pf = self.pf
            sub = min(8, m // 128)

            def kernel(a_ref, b_ref, o_ref):
                r = pf.f_mul([a_ref[i] for i in range(k)],
                             [b_ref[i] for i in range(k)])
                for i in range(k):
                    o_ref[i] = r[i]

            a3 = a.reshape(k, m // 128, 128)
            b3 = b.reshape(k, m // 128, 128)
            spec = pl.BlockSpec((k, sub, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(a3.shape, a3.dtype),
                grid=(m // 128 // sub,),
                in_specs=[spec, spec],
                out_specs=spec,
                interpret=self.interpret,
            )(a3, b3)
            return out.reshape(k, m)
        r = self.pf.f_mul([a[i] for i in range(k)], [b[i] for i in range(k)])
        return jnp.stack(r)

    def _addsub(self, a, b):
        k = self.k
        al = [a[i] for i in range(k)]
        bl = [b[i] for i in range(k)]
        return (jnp.stack(self.pf.f_add(al, bl)),
                jnp.stack(self.pf.f_sub(al, bl)))

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        k = self.k
        return jnp.stack(self.pf.f_sub([a[i] for i in range(k)],
                                       [b[i] for i in range(k)]))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        """Montgomery -> canonical limbs: REDC against the integer 1."""
        one = np.zeros((self.k,), dtype=np.uint32)
        one[0] = 1
        ones = jnp.broadcast_to(jnp.asarray(one)[:, None], a.shape)
        return self.mul(a, ones)

    # ---- stage twiddles ------------------------------------------------------
    def _stage_tw(self, pows_bl: jnp.ndarray, s) -> jnp.ndarray:
        """Twiddles for Pease stage s (traced): pows[(i >> s) << s].

        The gather runs on the batch-last (N/2, K) table — row gathers are
        cheap on TPU, lane gathers are not — then relayouts to (K, N/2)."""
        idx = (jnp.arange(self.n // 2, dtype=jnp.int32) >> s) << s
        return jnp.transpose(jnp.take(pows_bl, idx, axis=0))

    # ---- networks ------------------------------------------------------------
    # lax.scan keeps ONE compiled stage body per transform regardless of
    # log2(N) (an unrolled network blows up compile time ~1k ops/stage).
    def _fwd(self, x: jnp.ndarray, pows_bl: jnp.ndarray) -> jnp.ndarray:
        """Constant-geometry forward: natural in -> bit-reversed out."""
        n, k = self.n, self.k
        if self.logn == 0:
            return x

        def stage(xc, s):
            u = xc[:, : n // 2]
            w = xc[:, n // 2 :]
            top, diff = self._addsub(u, w)
            bot = self.mul(diff, self._stage_tw(pows_bl, s))
            return jnp.stack([top, bot], axis=-1).reshape(k, n), None

        x, _ = jax.lax.scan(stage, x, jnp.arange(self.logn, dtype=jnp.int32))
        return x

    def _bwd(self, x: jnp.ndarray, pows_bl: jnp.ndarray) -> jnp.ndarray:
        """Mirror inverse network: bit-reversed in -> natural out,
        scaled by N (callers multiply by n_inv)."""
        n, k = self.n, self.k
        if self.logn == 0:
            return x

        def stage(xc, s):
            v = xc.reshape(k, n // 2, 2)
            u = v[..., 0]
            w = v[..., 1]
            wt = self.mul(w, self._stage_tw(pows_bl, s))
            top, bot = self._addsub(u, wt)
            return jnp.concatenate([top, bot], axis=1), None

        stages = jnp.arange(self.logn - 1, -1, -1, dtype=jnp.int32)
        x, _ = jax.lax.scan(stage, x, stages)
        return x

    def _scale(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        return self.mul(x, jnp.broadcast_to(c[:, None], x.shape))

    # ---- public API (same conventions as NTTCtx) -----------------------------
    def ntt(self, coeffs):
        """coeffs (natural) -> evaluations (bit-reversed)."""
        return self._fwd(coeffs, self.w_pows)

    def intt(self, evals_br):
        """evaluations (bit-reversed) -> coeffs (natural)."""
        return self._scale(self._bwd(evals_br, self.winv_pows), self.n_inv)

    def evals_to_coeffs_br(self, evals_nat):
        """evaluations (natural) -> coeffs (bit-reversed)."""
        return self._scale(self._fwd(evals_nat, self.winv_pows), self.n_inv)

    def coeffs_br_to_evals(self, coeffs_br):
        """coeffs (bit-reversed) -> evaluations (natural)."""
        return self._bwd(coeffs_br, self.w_pows)

    @functools.cached_property
    def jit_ntt(self):
        return jax.jit(self.ntt)

    @functools.cached_property
    def jit_intt(self):
        return jax.jit(self.intt)
