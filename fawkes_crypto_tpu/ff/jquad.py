"""Batched Fq2 = Fq[u]/(u^2+1) arithmetic on device.

Needed for BN254 G2 points (the Groth16 B-query MSM, SURVEY.md §7 hard part
#5). Elements are uint32 tensors of shape (..., 2, K): component axis then
limb axis. Exposes the same op protocol as ff.jfield.FieldCtx (add, sub,
neg, mont_mul, mont_sqr, select, is_zero, const, encode/decode) so the
curve kernels in ops/curve.py are generic over the coordinate field.

Host mirror: native/bn_pairing.py Fq2 (tuples of ints).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .jfield import FieldCtx
from .hostfield import PrimeField


class QuadCtx:
    """Fq2 ops over a base FieldCtx; non-residue u^2 = -1 (BN254 tower)."""

    _cache = {}

    def __init__(self, base: FieldCtx):
        self.base = base
        self.fld = base.fld
        self.k = base.k

    @classmethod
    def get(cls, fld: PrimeField) -> "QuadCtx":
        key = id(fld)
        if key not in cls._cache:
            cls._cache[key] = cls(FieldCtx.get(fld))
        return cls._cache[key]

    # componentwise ops delegate straight to the base field (it vectorizes
    # over all leading dims, the component axis included)
    def add(self, a, b):
        return self.base.add(a, b)

    def sub(self, a, b):
        return self.base.sub(a, b)

    def neg(self, a):
        return self.base.neg(a)

    def zeros_like(self, a):
        return jnp.zeros_like(a)

    def mont_mul(self, a, b):
        """Karatsuba: 3 base muls. (a0+a1 u)(b0+b1 u), u^2 = -1."""
        f = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t0 = f.mont_mul(a0, b0)
        t1 = f.mont_mul(a1, b1)
        t2 = f.mont_mul(f.add(a0, a1), f.add(b0, b1))
        c0 = f.sub(t0, t1)
        c1 = f.sub(t2, f.add(t0, t1))
        return jnp.stack([c0, c1], axis=-2)

    def mont_sqr(self, a):
        """(a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u — 2 base muls."""
        f = self.base
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0 = f.mont_mul(f.add(a0, a1), f.sub(a0, a1))
        t = f.mont_mul(a0, a1)
        c1 = f.add(t, t)
        return jnp.stack([c0, c1], axis=-2)

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def double(self, a):
        return self.add(a, a)

    # ---- host encode/decode ------------------------------------------------
    def encode(self, xs, mont=True) -> np.ndarray:
        """Iterable of (c0, c1) int pairs or bn_pairing.Fq2 -> (N, 2, K)."""
        pairs = []
        for x in xs:
            if hasattr(x, "c0"):
                pairs.extend([x.c0, x.c1])
            else:
                pairs.extend([x[0], x[1]])
        flat = self.base.encode(pairs, mont=mont)
        return flat.reshape(-1, 2, self.k)

    def decode(self, a, mont=True) -> list:
        a = np.asarray(a).reshape(-1, self.k)
        flat = self.base.decode(a, mont=mont)
        return [(flat[2 * i], flat[2 * i + 1]) for i in range(len(flat) // 2)]

    def const(self, pair, mont=True) -> jnp.ndarray:
        if hasattr(pair, "c0"):
            pair = (pair.c0, pair.c1)
        return jnp.stack(
            [self.base.const(pair[0], mont), self.base.const(pair[1], mont)],
            axis=0,
        )
