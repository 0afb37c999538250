"""Batched fixed-base scalar multiplication on device.

CRS generation (the analog of bellman's generate_random_parameters,
reference backend/bellman_groth16/setup.rs:20) needs [s_i]G for tens of
millions of s_i over a handful of fixed bases (G1, G2, and the
query-specific combinations evaluated at tau). Host Pippenger is
O(minutes-hours) at rollup scale; on device it is W masked mixed adds
per point over the full batch:

  tables: T_w[d] = [d * 2^(c w)] G for d in [0, 2^c) — built ON DEVICE:
        host computes only the W*c doublings [2^i]G, then table entry d
        accumulates its set bits with c masked mixed adds over all
        W*2^c lanes at once, followed by one batched Fermat inversion
        (Jacobian -> affine rows);
  mul:  acc_i = sum_w T_w[digit_w(s_i)] — per window one row gather
        (XLA take) + one masked mixed add over all lanes.

Works for G1 (PField rows) and G2 (PQuadField rows, g2=True). Tables
depend only on (base, c); they are cached process-wide so every query of
a Groth16 setup (a/b/l/h over the same generator) shares one table.
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


def jac_to_affine_rows(pf, g2: bool, jac: jnp.ndarray) -> jnp.ndarray:
    """(3K, M, 128) device Jacobian -> (M*128, 2K) affine Montgomery rows
    via one batched Fermat inversion; identity (z=0) -> all-zero row.

    Off-TPU the Pallas kernels run in interpret mode where a 508-mul
    Fermat chain is pathologically slow; the (small, test-scale) host
    bignum conversion serves instead."""
    if jax.default_backend() != "tpu":
        return _jac_to_affine_rows_host(pf, g2, jac)
    from .tablegen import _fermat_inv, _mm

    base_pf = pf.base if g2 else pf
    mm = _mm(base_pf)
    k = pf.k

    @jax.jit
    def to_affine(jac):
        z = jac[2 * k:]
        if g2:
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


def _jac_to_affine_rows_host(pf, g2: bool, jac) -> jnp.ndarray:
    """Host bignum Jacobian -> affine rows (CPU/interpret fallback)."""
    base_pf = pf.base if g2 else pf
    fctx = FieldCtx.get(base_pf.fld)
    p = base_pf.fld.p
    k = pf.k
    kb = base_pf.k
    a = np.asarray(jax.device_get(jac)).reshape(3 * k, -1)
    n = a.shape[1]
    ncomp = 6 if g2 else 3
    comps = [fctx.decode(np.ascontiguousarray(a[i * kb:(i + 1) * kb, :].T))
             for i in range(ncomp)]
    out_cols = [[0] * n for _ in range(2 * (2 if g2 else 1))]
    for i in range(n):
        if g2:
            z0, z1 = comps[4][i], comps[5][i]
            if z0 == 0 and z1 == 0:
                continue
            norm = (z0 * z0 + z1 * z1) % p
            ni = pow(norm, -1, p)
            zi = (z0 * ni % p, (-z1 * ni) % p)

            def qmul(x, y):
                return ((x[0] * y[0] - x[1] * y[1]) % p,
                        (x[0] * y[1] + x[1] * y[0]) % p)

            zi2 = qmul(zi, zi)
            zi3 = qmul(zi2, zi)
            x = qmul((comps[0][i], comps[1][i]), zi2)
            y = qmul((comps[2][i], comps[3][i]), zi3)
            out_cols[0][i], out_cols[1][i] = x
            out_cols[2][i], out_cols[3][i] = y
        else:
            z = comps[2][i]
            if z == 0:
                continue
            zi = pow(z, -1, p)
            zi2 = zi * zi % p
            out_cols[0][i] = comps[0][i] * zi2 % p
            out_cols[1][i] = comps[1][i] * zi2 * zi % p
    out = np.zeros((n, 2 * k), dtype=np.uint32)
    for j, col in enumerate(out_cols):
        out[:, j * kb:(j + 1) * kb] = fctx.encode(col)
    # identity stays an all-zero row even in Montgomery form
    return jnp.asarray(out)


def _madd_xla(fld, g2: bool, state: jnp.ndarray, pts: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """XLA (batch-last, ops/curve.py) masked mixed-add — the off-TPU
    stand-in for PCurve.madd_affine_masked. Interpret-mode Pallas takes
    minutes of XLA-CPU compile PER kernel shape on the CI box; the XLA
    unified add compiles in seconds and is bit-identical (same Montgomery
    limb math through ff/jfield).

    state (3K', M, 128) Jacobian limbs-first; pts (2K', M, 128) affine
    (all-zero row = identity); mask (M, 128) uint32."""
    from ..ff.jquad import QuadCtx
    from .curve import ec_add, ec_select

    fctx = FieldCtx.get(fld)
    f = QuadCtx.get(fld) if g2 else fctx
    kq = state.shape[0] // 3
    m = state.shape[1] * 128

    def bl(a):
        out = a.reshape(kq, m).T
        return out.reshape(m, 2, kq // 2) if g2 else out

    def lf(a):
        if g2:
            a = a.reshape(m, kq)
        return a.T.reshape(kq, -1, 128)

    s = (bl(state[:kq]), bl(state[kq:2 * kq]), bl(state[2 * kq:]))
    px, py = bl(pts[:kq]), bl(pts[kq:])
    nz = jnp.any(pts != 0, axis=0).reshape(-1)  # (N,) non-identity rows
    one = jnp.asarray(fctx.const(1))
    if g2:
        z1 = jnp.zeros((m, 2, kq // 2), dtype=jnp.uint32)
        z1 = z1.at[:, 0, :].set(one[None, :])
        pz = jnp.where(nz[:, None, None], z1, 0)
    else:
        z1 = jnp.broadcast_to(one, (m, kq))
        pz = jnp.where(nz[:, None], z1, 0)
    cand = ec_add(f, s, (px, py, pz))
    out = ec_select(f, mask.reshape(-1).astype(bool), cand, s)
    return jnp.concatenate([lf(c) for c in out], axis=0)


def _madd_masked(pc, fld, g2, state, pts, mask):
    if jax.default_backend() == "tpu":
        return pc.madd_affine_masked(state, pts, mask)
    return _madd_xla(fld, g2, state, pts, mask)


_BUILD_JIT: dict = {}


def _table_build_jit(pc, fld, g2, k3, lanes):
    """Jitted scan accumulating the c bit-level madds of a table build."""
    key = (id(fld), g2, k3, lanes)
    fn = _BUILD_JIT.get(key)
    if fn is None:
        def build(pts_all, masks):
            state = jnp.zeros((k3, lanes // 128, 128), dtype=jnp.uint32)

            def step(st, xs):
                pts, mask = xs
                return _madd_masked(pc, fld, g2, st, pts, mask), None

            state, _ = jax.lax.scan(step, state, (pts_all, masks))
            return state

        fn = jax.jit(build)
        _BUILD_JIT[key] = fn
    return fn


_TABLE_CACHE: dict = {}


def fixed_base_tables(fctx: FieldCtx, base, w: int, c: int,
                      g2: bool = False, group=None) -> jnp.ndarray:
    """(W, 2^c, 2K|4K) affine Montgomery row tables for `base`, built on
    device. Host work is only the w*c doublings."""
    if group is None:
        from ..native import bn_pairing as group
    key = (id(fctx.fld), _point_key(base), w, c, g2)
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit

    from .msm_wave import (
        encode_points_affine_rows,
        encode_points_affine_rows_g2,
    )

    pf = PQuadField.get(fctx.fld) if g2 else PField.get(fctx.fld)
    pc = PCurve.get(pf)
    k = pf.k
    enc = encode_points_affine_rows_g2 if g2 else encode_points_affine_rows

    # host: the w*c doublings [2^i] base
    g_add = group.g_add
    doubles = []
    pt = base
    for _ in range(w * c):
        doubles.append(pt)
        pt = g_add(pt, pt)

    b = 1 << c
    lanes = w * b
    assert lanes % 128 == 0
    d_in_w = np.tile(np.arange(b, dtype=np.int64), w)

    def level(j):
        # per-window constant point [2^(c*w_ + j)] base on every lane of
        # window w_, masked by bit j of the lane's digit
        rows = np.asarray(enc(fctx, [doubles[c * w_ + j] for w_ in range(w)]))
        rep = np.repeat(rows, b, axis=0)  # (lanes, 2K|4K)
        return (rep.T.reshape(2 * k, lanes // 128, 128),
                ((d_in_w >> j) & 1).astype(np.uint32).reshape(-1, 128))

    if jax.default_backend() == "tpu":
        # eager per-bit loop: the Mosaic madd compiles once (shape-keyed)
        # and the (lanes, 2K) level tensors stay transient (the c-stacked
        # scan input would be GBs at the CRS chunk size)
        state = jnp.zeros((3 * k, lanes // 128, 128), dtype=jnp.uint32)
        for j in range(c):
            pts, mask = level(j)
            state = pc.madd_affine_masked(
                state, jnp.asarray(pts), jnp.asarray(mask))
    else:
        # stack the c bit-levels and scan: ONE compiled XLA madd body
        # (the eager loop compiled the unified-add graph c times —
        # minutes each on XLA-CPU)
        pts_all = np.empty((c, 2 * k, lanes // 128, 128), dtype=np.uint32)
        masks = np.empty((c, lanes // 128, 128), dtype=np.uint32)
        for j in range(c):
            pts_all[j], masks[j] = level(j)
        state = _table_build_jit(pc, fctx.fld, g2, 3 * k, lanes)(
            jnp.asarray(pts_all), jnp.asarray(masks))

    aff = jac_to_affine_rows(pf, g2, state)  # (lanes, 2K|4K)
    tables = aff.reshape(w, b, 2 * k)
    tables.block_until_ready()
    _TABLE_CACHE[key] = tables
    return tables


def _point_key(pt):
    if pt is None:
        return None
    x, y = pt
    if hasattr(x, "c0"):
        return (x.c0, x.c1, y.c0, y.c1)
    return (x, y)


class FixedBase:
    """Compiled fixed-base multiplier for one (base point, batch n)."""

    def __init__(self, fctx: FieldCtx, base, n: int, g2: bool = False,
                 scalar_bits: int = 254, c: int = LIMB_BITS, group=None):
        self.fctx = fctx
        self.g2 = g2
        self.pf = PQuadField.get(fctx.fld) if g2 else PField.get(fctx.fld)
        self.pc = PCurve.get(self.pf)
        self.n = n
        self.k = self.pf.k
        self.c = c
        assert n % 128 == 0
        self.w = (scalar_bits + c - 1) // c
        self.tables = fixed_base_tables(fctx, base, self.w, c, g2=g2,
                                        group=group)

    @functools.cached_property
    def _run(self):
        k, n, w = self.k, self.n, self.w
        pc = self.pc

        def run(scalars, tables):
            digits = extract_digits(scalars, self.c, w)        # (W, N)
            state = jnp.zeros((3 * k, n // 128, 128), dtype=jnp.uint32)

            # lax.scan over windows: ONE compiled madd body regardless of
            # W (the unrolled loop lowered the Pallas kernel W=64 times —
            # tens of minutes of XLA-CPU compile in interpret mode)
            def step(st, xs):
                tab, d = xs
                rows = jnp.take(tab, d, axis=0)                # (N, 2K)
                pts = rows.T.reshape(2 * k, n // 128, 128)
                valid = (d > 0).astype(jnp.uint32).reshape(-1, 128)
                return _madd_masked(pc, self.fctx.fld, self.g2, st, pts,
                                    valid), None

            state, _ = jax.lax.scan(step, state, (tables, digits))
            return state

        return jax.jit(run)

    def mul_jacobian(self, scalars: jnp.ndarray) -> jnp.ndarray:
        """scalars (N, K) canonical 16-bit limbs -> (3K, N/128, 128)
        Jacobian device points [s_i] base."""
        return self._run(scalars, self.tables)

    def mul_affine_rows(self, scalars: jnp.ndarray) -> jnp.ndarray:
        """-> (N, 2K) affine Montgomery rows (batched Fermat inversion)."""
        return jac_to_affine_rows(self.pf, self.g2,
                                  self._run(scalars, self.tables))


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
