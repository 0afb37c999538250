"""Batched short-Weierstrass (a=0) Jacobian point arithmetic on device.

BN254 G1 (y^2 = x^3 + 3 over Fq) and G2 (y^2 = x^3 + 3/(9+u) over Fq2) share
these kernels: all ops are generic over the coordinate-field context
(ff.jfield.FieldCtx for G1, ff.jquad.QuadCtx for G2) because a=0 doubling
and addition never reference the curve constant b.

This is the device-side group layer under the MSM (ops/msm.py) — the
TPU-native replacement for the curve arithmetic inside the reference's
external bellman_ce crate (SURVEY.md §2.4: create_random_proof's G1/G2
MSMs, invoked at /root/reference/fawkes-crypto/src/backend/bellman_groth16/
prover.rs:80).

A point is a tuple (X, Y, Z) of field elements (identity <=> Z == 0);
everything is branchless — identity/doubling/inverse cases resolved with
selects so the same compiled kernel serves every input.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Point = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


def ec_zero_like(f, pt: Point) -> Point:
    return tuple(jnp.zeros_like(c) for c in pt)


def ec_double(f, pt: Point) -> Point:
    """dbl-2009-l (a=0): 2M + 5S. Z==0 in -> Z==0 out; Y==0 cannot occur in
    odd-order subgroups (BN254 G1/G2 have no 2-torsion)."""
    x, y, z = pt
    a = f.mont_sqr(x)
    b = f.mont_sqr(y)
    c = f.mont_sqr(b)
    t = f.mont_sqr(f.add(x, b))
    d = f.double(f.sub(f.sub(t, a), c))
    e = f.add(f.add(a, a), a)
    ff_ = f.mont_sqr(e)
    x3 = f.sub(ff_, f.double(d))
    c8 = f.double(f.double(f.double(c)))
    y3 = f.sub(f.mont_mul(e, f.sub(d, x3)), c8)
    z3 = f.double(f.mont_mul(y, z))
    return (x3, y3, z3)


def ec_add(f, p: Point, q: Point) -> Point:
    """Unified Jacobian add (add-2007-bl, 11M + 5S) with branchless handling
    of P=O, Q=O, P=Q (falls back to ec_double), P=-Q (returns O)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = f.mont_sqr(z1)
    z2z2 = f.mont_sqr(z2)
    u1 = f.mont_mul(x1, z2z2)
    u2 = f.mont_mul(x2, z1z1)
    s1 = f.mont_mul(f.mont_mul(y1, z2), z2z2)
    s2 = f.mont_mul(f.mont_mul(y2, z1), z1z1)
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)

    i = f.mont_sqr(f.double(h))
    j = f.mont_mul(h, i)
    rr = f.double(r)
    v = f.mont_mul(u1, i)
    x3 = f.sub(f.sub(f.mont_sqr(rr), j), f.double(v))
    y3 = f.sub(
        f.mont_mul(rr, f.sub(v, x3)), f.double(f.mont_mul(s1, j))
    )
    z3 = f.mont_mul(
        f.sub(f.sub(f.mont_sqr(f.add(z1, z2)), z1z1), z2z2), h
    )
    add_pt = (x3, y3, z3)

    p_inf = f.is_zero(z1)
    q_inf = f.is_zero(z2)
    h_zero = f.is_zero(h)
    r_zero = f.is_zero(r)
    dbl_pt = ec_double(f, p)

    # same x, same y -> double; same x, opposite y -> infinity
    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    use_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    x_o, y_o, z_o = (
        f.select(use_dbl, c_dbl, c_add) for c_add, c_dbl in zip(add_pt, dbl_pt)
    )
    # infinity: zero the Z coordinate only (X/Y irrelevant when Z==0)
    z_o = f.select(use_inf, jnp.zeros_like(z_o), z_o)
    # identity operands
    x_o = f.select(q_inf, x1, f.select(p_inf, x2, x_o))
    y_o = f.select(q_inf, y1, f.select(p_inf, y2, y_o))
    z_o = f.select(q_inf, z1, f.select(p_inf, z2, z_o))
    return (x_o, y_o, z_o)


def ec_select(f, cond, p: Point, q: Point) -> Point:
    return tuple(f.select(cond, a, b) for a, b in zip(p, q))


def ec_scan_reduce(f, pt: Point, axis: int = 0) -> Point:
    """Sum points along `axis` with a lax.scan accumulator: ONE compiled
    add (vs log2(n) inlined ones for the tree) at the cost of sequential
    steps — the right trade when the remaining axes keep the VPU busy."""
    pts_m = tuple(jnp.moveaxis(c, axis, 0) for c in pt)
    zero = tuple(jnp.zeros_like(c[0]) for c in pts_m)

    def step(acc, p):
        return ec_add(f, acc, p), None

    acc, _ = jax.lax.scan(step, zero, pts_m)
    return acc


def ec_tree_reduce(f, pt: Point, axis: int = 0) -> Point:
    """Sum 2^k points along `axis` by halving: log2(n) batched adds."""
    n = pt[0].shape[axis]
    assert n & (n - 1) == 0, "tree_reduce needs a power-of-two length"
    while n > 1:
        n //= 2
        lo = tuple(jnp.take(c, np.arange(n), axis=axis) for c in pt)
        hi = tuple(jnp.take(c, np.arange(n, 2 * n), axis=axis) for c in pt)
        pt = ec_add(f, lo, hi)
    return tuple(jnp.squeeze(c, axis=axis) for c in pt)


# ---- host <-> device -------------------------------------------------------

def encode_points_g1(fctx, pts) -> Point:
    """Iterable of affine (x, y) int pairs or None -> device Jacobian
    (N, K) coordinate arrays, Montgomery form. None -> identity."""
    xs, ys, zs = [], [], []
    for p in pts:
        if p is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append(1)
    return (
        jnp.asarray(fctx.encode(xs)),
        jnp.asarray(fctx.encode(ys)),
        jnp.asarray(fctx.encode(zs)),
    )


def encode_points_g2(qctx, pts) -> Point:
    """Iterable of affine (Fq2, Fq2) pairs or None -> (N, 2, K) arrays."""
    zero = (0, 0)
    one = (1, 0)
    xs, ys, zs = [], [], []
    for p in pts:
        if p is None:
            xs.append(zero)
            ys.append(one)
            zs.append(zero)
        else:
            xs.append(p[0])
            ys.append(p[1])
            zs.append(one)
    return (
        jnp.asarray(qctx.encode(xs)),
        jnp.asarray(qctx.encode(ys)),
        jnp.asarray(qctx.encode(zs)),
    )


def decode_point_g1(fctx, pt: Point):
    """Single device Jacobian point -> affine (x, y) ints or None."""
    p = fctx.fld.p
    x, y, z = (np.asarray(c).reshape(1, -1) for c in pt)
    zi = fctx.decode(z)[0]
    if zi % p == 0:
        return None
    xi, yi = fctx.decode(x)[0], fctx.decode(y)[0]
    zinv = pow(zi, -1, p)
    return (xi * zinv * zinv % p, yi * zinv * zinv % p * zinv % p)


def decode_point_g2(qctx, pt: Point, group=None):
    p = qctx.fld.p
    if group is None:
        from ..native import bn_pairing as group
    Fq2 = group.Fq2

    x, y, z = (np.asarray(c).reshape(1, 2, -1) for c in pt)
    z0, z1 = qctx.decode(z)[0]
    zq = Fq2(z0, z1)
    if zq.is_zero():
        return None
    x0, x1 = qctx.decode(x)[0]
    y0, y1 = qctx.decode(y)[0]
    zinv = zq.inv()
    zinv2 = zinv.square()
    zinv3 = zinv2 * zinv
    return (Fq2(x0, x1) * zinv2, Fq2(y0, y1) * zinv3)
