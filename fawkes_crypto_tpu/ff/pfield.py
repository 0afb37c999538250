"""Pallas TPU field kernels: limbs-first Montgomery arithmetic.

The XLA limb kernels (ff/jfield.py) are batch-last: (..., K) with the limb
axis on lanes, which wastes 112 of 128 lanes and serializes carry chains
as lax.scan loops (~2 ms fixed latency per op on v5e). These Pallas
kernels flip the layout to limbs-first — an element is (K, S, 128) with
the BATCH on sublanes x lanes and each 16-bit limb a full VPU tile — and
fully unroll the product/carry structure in registers. One mont_mul is
~2.5k vector ops on (S,128) tiles; at S=8 that is 1024 elements per ~2.5k
VPU cycles.

In-kernel representation: a field element is a Python list of K uint32
arrays of shape (S, 128). The f_* helpers below are traced inside a
pallas_call body; ops/pcurve.py composes them into EC kernels.

Replaces the hot path of the reference's external bellman_ce field
arithmetic (SURVEY.md §2.4) on TPU.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hostfield import PrimeField
from .limbs import LIMB_BITS, LIMB_MASK, int_to_limbs, n_limbs_for

MASK = LIMB_MASK  # plain int: Pallas kernels cannot capture traced consts


class PField:
    """Per-field constants for the Pallas kernels (host-side mirror of
    ff/jfield.FieldCtx, same radix-2^16 Montgomery representation)."""

    _cache = {}

    def __init__(self, fld: PrimeField):
        self.fld = fld
        self.k = n_limbs_for(fld.word_count)
        k = self.k
        self.p_limbs = tuple(int(v) for v in int_to_limbs(fld.p, k))
        r_mod = 1 << (LIMB_BITS * k)
        self.inv_limbs = tuple(
            int(v) for v in int_to_limbs((-pow(fld.p, -1, r_mod)) % r_mod, k)
        )
        self.r_limbs = tuple(int(v) for v in int_to_limbs(fld.R % fld.p, k))

    @classmethod
    def get(cls, fld: PrimeField) -> "PField":
        if id(fld) not in cls._cache:
            cls._cache[id(fld)] = cls(fld)
        return cls._cache[id(fld)]

    # ---- in-kernel ops (operate on lists of K (S,128) uint32 arrays) ------
    def f_add(self, a: List, b: List) -> List:
        k = self.k
        out = []
        carry = None
        for i in range(k):
            v = a[i] + b[i] if carry is None else a[i] + b[i] + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        return self._cond_sub_p(out, carry)

    def _sub_raw(self, a: List, b: List):
        """16-bit diff limbs + final borrow (0/1)."""
        k = self.k
        out = []
        borrow = jnp.zeros_like(a[0])
        for i in range(k):
            v = a[i] + (1 << LIMB_BITS) - b[i] - borrow
            out.append(v & MASK)
            borrow = 1 - (v >> LIMB_BITS)
        return out, borrow

    def _cond_sub_p(self, r: List, top) -> List:
        d, borrow = self._sub_raw(
            r, [jnp.full_like(r[0], v) for v in self.p_limbs])
        ge = (top > 0) | (borrow == 0)
        return [jnp.where(ge, d[i], r[i]) for i in range(self.k)]

    def f_sub(self, a: List, b: List) -> List:
        k = self.k
        d, borrow = self._sub_raw(a, b)
        addp = borrow  # already 0/1 uint32
        out = []
        carry = jnp.zeros_like(a[0])
        for i in range(k):
            v = d[i] + addp * self.p_limbs[i] + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        return out

    def f_neg(self, a: List) -> List:
        zero = [jnp.zeros_like(a[0]) for _ in range(self.k)]
        return self.f_sub(zero, a)

    def f_double(self, a: List) -> List:
        return self.f_add(a, a)

    def _wide_cols(self, a: List, b: List) -> List:
        """Product columns t[0..2K-1], each < 2^22 (exact in uint32)."""
        k = self.k
        t = [None] * (2 * k)
        for i in range(k):
            for j in range(k):
                prod = a[i] * b[j]
                lo = prod & MASK
                hi = prod >> LIMB_BITS
                c = i + j
                t[c] = lo if t[c] is None else t[c] + lo
                t[c + 1] = hi if t[c + 1] is None else t[c + 1] + hi
        return t

    def _lo_cols(self, a: List, b_const: tuple) -> List:
        """Low K columns of a * b for constant b (only i+j < K needed)."""
        k = self.k
        t = [None] * k
        for i in range(k):
            for j in range(k - i):
                prod = a[i] * b_const[j]
                c = i + j
                lo = prod & MASK
                t[c] = lo if t[c] is None else t[c] + lo
                if c + 1 < k:
                    hi = prod >> LIMB_BITS
                    t[c + 1] = hi if t[c + 1] is None else t[c + 1] + hi
        return t

    def _carry_lo(self, t: List, k: int) -> List:
        """Normalize first k columns to 16-bit limbs (mod 2^(16k))."""
        out = []
        carry = jnp.zeros_like(t[0])
        for i in range(k):
            v = t[i] + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        return out

    def f_mul(self, a: List, b: List) -> List:
        """Montgomery product, non-interleaved REDC, fully unrolled."""
        return self._redc(self._wide_cols(a, b))

    def _wide_cols_sqr(self, a: List) -> List:
        """Squaring columns: triangular products, off-diagonals doubled
        (k(k+1)/2 multiplies instead of k^2). Columns stay < 2^22."""
        k = self.k
        t = [None] * (2 * k)

        def acc(c, v):
            t[c] = v if t[c] is None else t[c] + v

        for i in range(k):
            prod = a[i] * a[i]
            acc(2 * i, prod & MASK)
            acc(2 * i + 1, prod >> LIMB_BITS)
            for j in range(i + 1, k):
                prod = a[i] * a[j]
                lo2 = (prod & MASK) * 2
                hi2 = (prod >> LIMB_BITS) * 2
                acc(i + j, lo2)
                acc(i + j + 1, hi2)
        return t

    def _redc(self, t: List) -> List:
        """Shared Montgomery reduction tail for f_mul/f_sqr."""
        k = self.k
        t_lo = self._carry_lo(t, k)
        m = self._carry_lo(self._lo_cols(t_lo, self.inv_limbs), k)
        u = list(t)
        for i in range(k):
            for j in range(k):
                prod = m[i] * self.p_limbs[j]
                c = i + j
                u[c] = u[c] + (prod & MASK)
                u[c + 1] = u[c + 1] + (prod >> LIMB_BITS)
        carry = jnp.zeros_like(u[0])
        for i in range(k):
            carry = (u[i] + carry) >> LIMB_BITS
        out = []
        for i in range(k, 2 * k):
            v = u[i] + carry
            out.append(v & MASK)
            carry = v >> LIMB_BITS
        return self._cond_sub_p(out, carry)

    def f_sqr(self, a: List) -> List:
        return self._redc(self._wide_cols_sqr(a))

    def f_select(self, cond, a: List, b: List) -> List:
        return [jnp.where(cond, x, y) for x, y in zip(a, b)]

    def f_is_zero(self, a: List):
        acc = a[0]
        for x in a[1:]:
            acc = acc | x
        return acc == 0

    # ---- ref helpers --------------------------------------------------------
    def read(self, ref, base: int) -> List:
        """Read element limbs from a (C*K, S, 128) ref at row block `base`."""
        return [ref[base + i] for i in range(self.k)]

    def write(self, ref, base: int, val: List):
        for i in range(self.k):
            ref[base + i] = val[i]


# ---- standalone batched mont-mul (layout (K, M, 128)) ----------------------

def make_mont_mul(pf: PField, sub: int = 8):
    """Returns jitted fn: (K, M, 128) x (K, M, 128) -> (K, M, 128)
    with M a multiple of `sub`. Grid over M/sub blocks."""
    k = pf.k

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(k)]
        b = [b_ref[i] for i in range(k)]
        r = pf.f_mul(a, b)
        for i in range(k):
            o_ref[i] = r[i]

    @jax.jit
    def run(a, b):
        m = a.shape[1]
        sb = min(sub, m)
        grid = (m // sb,)
        spec = pl.BlockSpec((k, sb, 128), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=grid,
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=jax.default_backend() != "tpu",
        )(a, b)

    return run


# ---- layout converters ------------------------------------------------------

def to_limbs_first(x: jnp.ndarray) -> jnp.ndarray:
    """(N, K) -> (K, N/128, 128); N must be a multiple of 1024."""
    n, k = x.shape
    assert n % 128 == 0
    return jnp.moveaxis(x, -1, 0).reshape(k, n // 128, 128)


def from_limbs_first(x: jnp.ndarray) -> jnp.ndarray:
    k = x.shape[0]
    return jnp.moveaxis(x.reshape(k, -1), 0, -1)
