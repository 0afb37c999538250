"""Batched fixed-base scalar multiplication on device.

CRS generation (the analog of bellman's generate_random_parameters,
reference backend/bellman_groth16/setup.rs:20) needs [s_i]G for tens of
millions of s_i over a handful of fixed bases (G1, G2, and the
query-specific combinations evaluated at tau). Host Pippenger is
O(minutes-hours) at rollup scale; on device it is 16 masked mixed adds
per point over the full batch:

  host: per 16-bit window w, a table T_w[d] = [d * 2^(16 w)] G
        (16 x 65536 points, one-time per base, C++/Python chain adds);
  device: acc_i = sum_w T_w[digit_w(s_i)] — per window one row gather
        (XLA take, ~400 GB/s) + one masked mixed add over all lanes.

Works for G1 (PField rows) and G2 (PQuadField rows, g2=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.jfield import FieldCtx
from ..ff.limbs import LIMB_BITS
from ..ff.pfield import PField
from ..ff.pquad import PQuadField
from .pcurve import PCurve


def extract_digits(scalars: jnp.ndarray, c: int, w: int) -> jnp.ndarray:
    """(N, K) 16-bit limbs -> (W, N) int32 c-bit digits (shared by the
    wave MSM and fixed-base multipliers)."""
    k = scalars.shape[-1]
    mask = jnp.uint32((1 << c) - 1)
    outs = []
    for w_ in range(w):
        off = w_ * c
        l0 = off // LIMB_BITS
        sh = off % LIMB_BITS
        d = scalars[:, l0] >> sh
        if sh + c > LIMB_BITS and l0 + 1 < k:
            d = d | (scalars[:, l0 + 1] << (LIMB_BITS - sh))
        outs.append((d & mask).astype(jnp.int32))
    return jnp.stack(outs, axis=0)


class FixedBase:
    """Compiled fixed-base multiplier for one (base point, batch n)."""

    def __init__(self, fctx: FieldCtx, base, n: int, g2: bool = False,
                 scalar_bits: int = 254, c: int = LIMB_BITS, group=None):
        if group is None:
            from ..native import bn_pairing as group
        g_add = group.g_add

        self.fctx = fctx
        self.g2 = g2
        self.pf = PQuadField.get(fctx.fld) if g2 else PField.get(fctx.fld)
        self.pc = PCurve.get(self.pf)
        self.n = n
        self.k = self.pf.k
        self.c = c
        assert n % 128 == 0
        self.w = (scalar_bits + c - 1) // c
        b = 1 << c

        # host tables: T_w[d] = [d * 2^(c w)] base, d in [0, 2^c)
        from .msm_wave import (
            encode_points_affine_rows,
            encode_points_affine_rows_g2,
        )

        enc = (encode_points_affine_rows_g2 if g2
               else encode_points_affine_rows)
        tables = []
        step = base
        for _ in range(self.w):
            row = [None] * b
            acc = None
            for d in range(1, b):
                acc = g_add(acc, step)
                row[d] = acc
            tables.append(enc(fctx, row))
            step = g_add(acc, step)  # [2^c] * step_w = next window base
        self.tables = jnp.stack(tables)  # (W, 2^c, 2K or 4K)

    @functools.cached_property
    def _run(self):
        k, n, w = self.k, self.n, self.w
        pc = self.pc

        def run(scalars):
            digits = extract_digits(scalars, self.c, w)        # (W, N)
            state = jnp.zeros((3 * k, n // 128, 128), dtype=jnp.uint32)
            for w_ in range(w):
                d = digits[w_]
                rows = jnp.take(self.tables[w_], d, axis=0)    # (N, 2K)
                pts = rows.T.reshape(2 * k, n // 128, 128)
                valid = (d > 0).astype(jnp.uint32).reshape(-1, 128)
                state = pc.madd_affine_masked(state, pts, valid)
            return state

        return jax.jit(run)

    def mul_jacobian(self, scalars: jnp.ndarray) -> jnp.ndarray:
        """scalars (N, K) canonical 16-bit limbs -> (3K, N/128, 128)
        Jacobian device points [s_i] base."""
        return self._run(scalars)

    def mul_affine_rows(self, scalars: jnp.ndarray) -> jnp.ndarray:
        """-> (N, 2K) affine Montgomery rows (batched Fermat inversion)."""
        from .tablegen import _fermat_inv, _mm

        base_pf = (self.pf.base if self.g2 else self.pf)
        mm = _mm(base_pf)
        k = self.k
        jac = self._run(scalars)

        @jax.jit
        def to_affine(jac):
            z = jac[2 * k:]
            if self.g2:
                # Fq2 inverse: (a - b u)/(a^2 + b^2); componentwise kernels
                kb = base_pf.k
                a, b = z[:kb], z[kb:]
                norm = _add_mod(base_pf, mm(a, a), mm(b, b))
                ninv = _fermat_inv(base_pf, norm)
                zi = jnp.concatenate(
                    [mm(a, ninv), _neg_mod(base_pf, mm(b, ninv))], axis=0)
                zi2 = _q_mul(base_pf, zi, zi)
                zi3 = _q_mul(base_pf, zi2, zi)
                x = _q_mul(base_pf, jac[:k], zi2)
                y = _q_mul(base_pf, jac[k:2 * k], zi3)
            else:
                zi = _fermat_inv(base_pf, z)
                zi2 = mm(zi, zi)
                zi3 = mm(zi2, zi)
                x = mm(jac[:k], zi2)
                y = mm(jac[k:2 * k], zi3)
            return jnp.concatenate([x, y], axis=0).reshape(2 * k, -1).T

        return to_affine(jac)


# ---- (K, M, 128)-layout helpers shared with tablegen ------------------------

def _add_mod(pf: PField, a, b):
    """Modular add on (K, M, 128) via the f_* helpers (plain jnp trace)."""
    k = pf.k
    al = [a[i] for i in range(k)]
    bl = [b[i] for i in range(k)]
    return jnp.stack(pf.f_add(al, bl))


def _neg_mod(pf: PField, a):
    k = pf.k
    return jnp.stack(pf.f_neg([a[i] for i in range(k)]))


def _q_mul(pf: PField, a, b):
    """Fq2 Karatsuba on (2K, M, 128) stacks via the mont kernel."""
    from .tablegen import _mm

    mm = _mm(pf)
    k = pf.k
    a0, a1 = a[:k], a[k:]
    b0, b1 = b[:k], b[k:]
    t0 = mm(a0, b0)
    t1 = mm(a1, b1)
    t2 = mm(_add_mod(pf, a0, a1), _add_mod(pf, b0, b1))
    k_ = pf.k
    c0 = jnp.stack(pf.f_sub([t0[i] for i in range(k_)],
                            [t1[i] for i in range(k_)]))
    s = _add_mod(pf, t0, t1)
    c1 = jnp.stack(pf.f_sub([t2[i] for i in range(k_)],
                            [s[i] for i in range(k_)]))
    return jnp.concatenate([c0, c1], axis=0)
