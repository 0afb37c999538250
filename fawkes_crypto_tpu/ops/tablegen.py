"""Device-side generation of large distinct-point tables (bench/test
fixtures).

BENCH honesty requires N genuinely distinct points (VERDICT round-1 weak
#2): generating 2^25 affine points on the host is minutes of Python
bigint work, so the table is built on-device instead: host computes two
small chains A_i = [i+1]G (i < na) and B_j = [(j+1)*2^20]G, the device
forms all pairwise sums A_i + B_j with the Pallas unified mixed add —
distinct scalars (i+1) + (j+1)*2^20 < r guarantee distinct points — and
converts Jacobian -> affine with a batched Fermat inversion
(z^(p-2), ~508 Montgomery muls/element on the mont_mul kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.jfield import FieldCtx
from ..ff.pfield import PField, make_mont_mul
from .pcurve import PCurve


def _host_chain(start, step, count, g_add):
    out = []
    p = start
    for _ in range(count):
        out.append(p)
        p = g_add(p, step)
    return out


@functools.lru_cache(maxsize=None)
def _mm(pf: PField):
    return make_mont_mul(pf)


def _fermat_inv(pf: PField, z: jnp.ndarray) -> jnp.ndarray:
    """Batched z^(p-2) on (K, M, 128) Montgomery limbs (0 -> 0)."""
    mm = _mm(pf)
    e = pf.fld.p - 2
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                 dtype=np.uint32))
    one = jnp.broadcast_to(
        jnp.asarray(np.array(pf.r_limbs, dtype=np.uint32))[:, None, None],
        z.shape,
    )

    def body(i, res):
        res = mm(res, res)
        t = mm(res, z)
        return jnp.where(bits[i] > 0, t, res)

    # L2R square-and-multiply; first bit of p-2 is 1 so start from z
    res = jax.lax.fori_loop(1, nbits, body, z)
    del one
    return res


def gen_distinct_rows(fctx: FieldCtx, n: int, chunk: int = 1 << 22,
                      na: int = 1 << 13, group=None):
    """(n, 2K) uint32 affine Montgomery rows of n DISTINCT G1 points
    (device-resident). n must be a multiple of na; chunk of na too."""
    if group is None:
        from ..native import bn_pairing as group
    G1_GEN, g_add, g_mul = group.G1_GEN, group.g_add, group.g_mul

    assert n % na == 0 and (n <= chunk or chunk % na == 0)
    chunk = min(chunk, n)
    nb = n // na
    k = fctx.k
    pf = PField.get(fctx.fld)
    pc = PCurve.get(pf)
    mm = _mm(pf)

    from .msm_wave import encode_points_affine_rows

    a_pts = _host_chain(G1_GEN, G1_GEN, na, g_add)
    step = g_mul(G1_GEN, 1 << 20)
    b_pts = _host_chain(step, step, nb, g_add)
    a_rows = encode_points_affine_rows(fctx, a_pts)       # (na, 2K)
    b_rows = encode_points_affine_rows(fctx, b_pts)       # (nb, 2K)

    one_col = jnp.asarray(np.array(pf.r_limbs, dtype=np.uint32))

    @jax.jit
    def make_chunk(b_slice):
        c_len = b_slice.shape[0] * na
        m = c_len // 128
        a_tiled = jnp.tile(a_rows, (b_slice.shape[0], 1))   # (c_len, 2K)
        q_rows = jnp.repeat(b_slice, na, axis=0)            # (c_len, 2K)
        # limbs-first state (3K, M, 128) with z = 1
        xy = a_tiled.T.reshape(2 * k, m, 128)
        z = jnp.broadcast_to(one_col[:, None, None], (k, m, 128))
        state = jnp.concatenate([xy, z], axis=0)
        pts = q_rows.T.reshape(2 * k, m, 128)
        ones = jnp.ones((m, 128), dtype=jnp.uint32)
        jac = pc.madd_affine_masked(state, pts, ones)
        zinv = _fermat_inv(pf, jac[2 * k:])
        zi2 = mm(zinv, zinv)
        zi3 = mm(zi2, zinv)
        x = mm(jac[:k], zi2)
        y = mm(jac[k:2 * k], zi3)
        return jnp.concatenate([x, y], axis=0).reshape(
            2 * k, c_len).T  # (c_len, 2K)

    per = chunk // na  # B points per chunk
    assert nb % per == 0, "n must be a multiple of chunk"
    outs = []
    for j0 in range(0, nb, per):
        outs.append(make_chunk(b_rows[j0:j0 + per]))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def random_scalar_limbs(n: int, k: int, bits: int = 254,
                        seed: int = 0) -> jnp.ndarray:
    """(n, K) uint32 16-bit scalar limbs, uniform over [0, 2^bits)."""
    rng = np.random.default_rng(seed)
    sc = rng.integers(0, 1 << 16, (n, k), dtype=np.uint64).astype(np.uint32)
    top = bits % 16
    sc[:, bits // 16:] = 0
    if top:
        sc[:, bits // 16] = rng.integers(
            0, 1 << top, (n,), dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(sc)
