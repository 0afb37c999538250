"""Pallas EC kernels: fused Jacobian point ops in limbs-first layout.

Points are (3K, M, 128) uint32 tensors — rows 0..K-1 = X limbs, K..2K-1 =
Y, 2K..3K-1 = Z; batch spread over (M, 128) sublanes x lanes; identity is
Z == 0. One `add_masked` kernel fuses the full branchless unified add
(P=O, Q=O, P=Q -> double, P=-Q -> O) with a validity select — a single
VPU pass of ~30 field muls per point, ~130 unrolled vector ops each, no
lax.scan carry chains (cf. ops/curve.py, the XLA fallback, which is
~100x slower per op on v5e).

Used by the wave-based Pippenger in ops/msm.py; the curve math mirrors
ops/curve.py (add-2007-bl / dbl-2009-l, a=0), which is itself differential
-tested against native/bn_pairing.py.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ff.pfield import PField


def _interpret() -> bool:
    """Mosaic kernels need real TPU; elsewhere (CPU test mesh) run the
    same kernel bodies in the Pallas interpreter."""
    return jax.default_backend() != "tpu"


def _ec_dbl_lists(pf: PField, x, y, z):
    f = pf
    a = f.f_sqr(x)
    b = f.f_sqr(y)
    c = f.f_sqr(b)
    t = f.f_sqr(f.f_add(x, b))
    d = f.f_double(f.f_sub(f.f_sub(t, a), c))
    e = f.f_add(f.f_add(a, a), a)
    ff_ = f.f_sqr(e)
    x3 = f.f_sub(ff_, f.f_double(d))
    c8 = f.f_double(f.f_double(f.f_double(c)))
    y3 = f.f_sub(f.f_mul(e, f.f_sub(d, x3)), c8)
    z3 = f.f_double(f.f_mul(y, z))
    return x3, y3, z3


def _ec_add_lists(pf: PField, p, q):
    """Unified add on limb-lists; returns (x3, y3, z3) lists."""
    f = pf
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = f.f_sqr(z1)
    z2z2 = f.f_sqr(z2)
    u1 = f.f_mul(x1, z2z2)
    u2 = f.f_mul(x2, z1z1)
    s1 = f.f_mul(f.f_mul(y1, z2), z2z2)
    s2 = f.f_mul(f.f_mul(y2, z1), z1z1)
    h = f.f_sub(u2, u1)
    r = f.f_sub(s2, s1)

    i = f.f_sqr(f.f_double(h))
    j = f.f_mul(h, i)
    rr = f.f_double(r)
    v = f.f_mul(u1, i)
    x3 = f.f_sub(f.f_sub(f.f_sqr(rr), j), f.f_double(v))
    y3 = f.f_sub(f.f_mul(rr, f.f_sub(v, x3)),
                 f.f_double(f.f_mul(s1, j)))
    z3 = f.f_mul(
        f.f_sub(f.f_sub(f.f_sqr(f.f_add(z1, z2)), z1z1), z2z2), h
    )

    p_inf = f.f_is_zero(z1)
    q_inf = f.f_is_zero(z2)
    h_zero = f.f_is_zero(h)
    r_zero = f.f_is_zero(r)
    dx, dy, dz = _ec_dbl_lists(pf, x1, y1, z1)

    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    use_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    x3 = f.f_select(use_dbl, dx, x3)
    y3 = f.f_select(use_dbl, dy, y3)
    z3 = f.f_select(use_dbl, dz, z3)
    z3 = f.f_select(use_inf, [jnp.zeros_like(v_) for v_ in z3], z3)
    x3 = f.f_select(q_inf, x1, f.f_select(p_inf, x2, x3))
    y3 = f.f_select(q_inf, y1, f.f_select(p_inf, y2, y3))
    z3 = f.f_select(q_inf, z1, f.f_select(p_inf, z2, z3))
    return x3, y3, z3


def _ec_madd_lists(pf: PField, p, q):
    """Mixed unified add: q affine-encoded (z2 in {0,1}; madd-2007-bl,
    6M + 4S vs 16M+5S for the general add). Handles p=O, q=O, p=q, p=-q."""
    f = pf
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = f.f_sqr(z1)
    u2 = f.f_mul(x2, z1z1)
    s2 = f.f_mul(f.f_mul(y2, z1), z1z1)
    h = f.f_sub(u2, x1)
    r = f.f_sub(s2, y1)

    hh = f.f_sqr(h)
    i = f.f_double(f.f_double(hh))
    j = f.f_mul(h, i)
    rr = f.f_double(r)
    v = f.f_mul(x1, i)
    x3 = f.f_sub(f.f_sub(f.f_sqr(rr), j), f.f_double(v))
    y3 = f.f_sub(f.f_mul(rr, f.f_sub(v, x3)),
                 f.f_double(f.f_mul(y1, j)))
    z3 = f.f_sub(f.f_sub(f.f_sqr(f.f_add(z1, h)), z1z1), hh)

    p_inf = f.f_is_zero(z1)
    q_inf = f.f_is_zero(z2)
    h_zero = f.f_is_zero(h)
    r_zero = f.f_is_zero(r)
    dx, dy, dz = _ec_dbl_lists(pf, x1, y1, z1)

    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    use_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    x3 = f.f_select(use_dbl, dx, x3)
    y3 = f.f_select(use_dbl, dy, y3)
    z3 = f.f_select(use_dbl, dz, z3)
    z3 = f.f_select(use_inf, [jnp.zeros_like(v_) for v_ in z3], z3)
    x3 = f.f_select(q_inf, x1, f.f_select(p_inf, x2, x3))
    y3 = f.f_select(q_inf, y1, f.f_select(p_inf, y2, y3))
    z3 = f.f_select(q_inf, z1, f.f_select(p_inf, z2, z3))
    return x3, y3, z3


def _ec_madd_affine_fast_lists(pf, p, x2, y2):
    """Mixed add WITHOUT the inline doubling path (~10 muls vs ~17):
    when p == q (h = r = 0, both finite) the lane reports need_dbl and
    keeps its state — the caller re-runs that wave through the unified
    kernel. Collisions require duplicate points landing on an equal
    accumulator, so the fast path covers virtually every wave of a
    distinct-point MSM. Returns (x3, y3, z3, need_dbl)."""
    f = pf
    x1, y1, z1 = p
    z1z1 = f.f_sqr(z1)
    u2 = f.f_mul(x2, z1z1)
    s2 = f.f_mul(f.f_mul(y2, z1), z1z1)
    h = f.f_sub(u2, x1)
    r = f.f_sub(s2, y1)

    hh = f.f_sqr(h)
    i = f.f_double(f.f_double(hh))
    j = f.f_mul(h, i)
    rr = f.f_double(r)
    v = f.f_mul(x1, i)
    x3 = f.f_sub(f.f_sub(f.f_sqr(rr), j), f.f_double(v))
    y3 = f.f_sub(f.f_mul(rr, f.f_sub(v, x3)),
                 f.f_double(f.f_mul(y1, j)))
    z3 = f.f_sub(f.f_sub(f.f_sqr(f.f_add(z1, h)), z1z1), hh)

    p_inf = f.f_is_zero(z1)
    q_inf = f.f_is_zero(x2) & f.f_is_zero(y2)
    h_zero = f.f_is_zero(h)
    r_zero = f.f_is_zero(r)
    need_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    use_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    one = [jnp.full_like(x1[0], v_) for v_ in pf.r_limbs]
    z3 = f.f_select(use_inf, [jnp.zeros_like(v_) for v_ in z3], z3)
    x3 = f.f_select(q_inf, x1, f.f_select(p_inf, x2, x3))
    y3 = f.f_select(q_inf, y1, f.f_select(p_inf, y2, y3))
    z3 = f.f_select(q_inf, z1, f.f_select(p_inf, one, z3))
    # on need_dbl keep the original state (caller re-dispatches the wave)
    x3 = f.f_select(need_dbl, x1, x3)
    y3 = f.f_select(need_dbl, y1, y3)
    z3 = f.f_select(need_dbl, z1, z3)
    return x3, y3, z3, need_dbl


def _ec_madd_affine_lists(pf: PField, p, x2, y2):
    """Unified mixed add with q strictly affine: q = (x2, y2), z2 = 1
    implicit; q is the identity iff x2 == y2 == 0 ((0,0) is not on
    y^2 = x^3 + 3). 6M + 4S on the main path."""
    f = pf
    x1, y1, z1 = p
    z1z1 = f.f_sqr(z1)
    u2 = f.f_mul(x2, z1z1)
    s2 = f.f_mul(f.f_mul(y2, z1), z1z1)
    h = f.f_sub(u2, x1)
    r = f.f_sub(s2, y1)

    hh = f.f_sqr(h)
    i = f.f_double(f.f_double(hh))
    j = f.f_mul(h, i)
    rr = f.f_double(r)
    v = f.f_mul(x1, i)
    x3 = f.f_sub(f.f_sub(f.f_sqr(rr), j), f.f_double(v))
    y3 = f.f_sub(f.f_mul(rr, f.f_sub(v, x3)),
                 f.f_double(f.f_mul(y1, j)))
    z3 = f.f_sub(f.f_sub(f.f_sqr(f.f_add(z1, h)), z1z1), hh)

    p_inf = f.f_is_zero(z1)
    q_inf = f.f_is_zero(x2) & f.f_is_zero(y2)
    h_zero = f.f_is_zero(h)
    r_zero = f.f_is_zero(r)
    dx, dy, dz = _ec_dbl_lists(pf, x1, y1, z1)

    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    use_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    one = [jnp.full_like(x1[0], v_) for v_ in pf.r_limbs]
    x3 = f.f_select(use_dbl, dx, x3)
    y3 = f.f_select(use_dbl, dy, y3)
    z3 = f.f_select(use_dbl, dz, z3)
    z3 = f.f_select(use_inf, [jnp.zeros_like(v_) for v_ in z3], z3)
    x3 = f.f_select(q_inf, x1, f.f_select(p_inf, x2, x3))
    y3 = f.f_select(q_inf, y1, f.f_select(p_inf, y2, y3))
    z3 = f.f_select(q_inf, z1, f.f_select(p_inf, one, z3))
    return x3, y3, z3


class PCurve:
    """Compiled Pallas EC kernels for one base field (Fq for BN254 G1)."""

    _cache = {}

    def __init__(self, pf: PField, sub: int = None):
        self.pf = pf
        self.k = pf.k
        if sub is None:
            import os

            sub = int(os.environ.get("FAWKES_PC_SUB", "8"))
        self.sub = sub

    @classmethod
    def get(cls, pf: PField) -> "PCurve":
        if id(pf) not in cls._cache:
            cls._cache[id(pf)] = cls(pf)
        return cls._cache[id(pf)]

    def _point_from_ref(self, ref) -> Tuple[List, List, List]:
        k = self.k
        return (
            [ref[i] for i in range(k)],
            [ref[k + i] for i in range(k)],
            [ref[2 * k + i] for i in range(k)],
        )

    def _point_to_ref(self, ref, pt):
        k = self.k
        for c, base in zip(pt, (0, k, 2 * k)):
            for i in range(self.k):
                ref[base + i] = c[i]

    # ---- kernels -------------------------------------------------------------
    @functools.cached_property
    def add_masked(self):
        """(state (3K,M,128), pts (3K,M,128), valid (M,128) u32) ->
        where(valid, state + pts, state)."""
        k, sub = self.k, self.sub

        def kernel(s_ref, p_ref, m_ref, o_ref):
            s = self._point_from_ref(s_ref)
            q = self._point_from_ref(p_ref)
            x3, y3, z3 = _ec_add_lists(self.pf, s, q)
            valid = m_ref[:] > 0
            out = (
                self.pf.f_select(valid, x3, s[0]),
                self.pf.f_select(valid, y3, s[1]),
                self.pf.f_select(valid, z3, s[2]),
            )
            self._point_to_ref(o_ref, out)

        @jax.jit
        def run(state, pts, valid):
            m = state.shape[1]
            sb = min(sub, m)
            spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec((sb, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(state.shape, state.dtype),
                grid=(m // sb,),
                in_specs=[spec, spec, mspec],
                out_specs=spec,
                interpret=_interpret(),
            )(state, pts, valid)

        return run

    @functools.cached_property
    def madd_masked(self):
        """Mixed add (q affine, z2 in {0,1}) with validity select — the
        wave-accumulation workhorse; ~1.8x cheaper than add_masked."""
        k, sub = self.k, self.sub

        def kernel(s_ref, p_ref, m_ref, o_ref):
            s = self._point_from_ref(s_ref)
            q = self._point_from_ref(p_ref)
            x3, y3, z3 = _ec_madd_lists(self.pf, s, q)
            valid = m_ref[:] > 0
            out = (
                self.pf.f_select(valid, x3, s[0]),
                self.pf.f_select(valid, y3, s[1]),
                self.pf.f_select(valid, z3, s[2]),
            )
            self._point_to_ref(o_ref, out)

        @jax.jit
        def run(state, pts, valid):
            m = state.shape[1]
            sb = min(sub, m)
            spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec((sb, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(state.shape, state.dtype),
                grid=(m // sb,),
                in_specs=[spec, spec, mspec],
                out_specs=spec,
                interpret=_interpret(),
            )(state, pts, valid)

        return run

    @functools.cached_property
    def madd_affine_masked(self):
        """(state (3K,M,128), pts (2K,M,128) affine [X|Y], valid) ->
        where(valid, state + pts, state). The wave-accumulation
        workhorse: 128-byte gather rows, 6M+4S main path."""
        k, sub = self.k, self.sub

        def kernel(s_ref, p_ref, m_ref, o_ref):
            s = self._point_from_ref(s_ref)
            x2 = [p_ref[i] for i in range(k)]
            y2 = [p_ref[k + i] for i in range(k)]
            x3, y3, z3 = _ec_madd_affine_lists(self.pf, s, x2, y2)
            valid = m_ref[:] > 0
            out = (
                self.pf.f_select(valid, x3, s[0]),
                self.pf.f_select(valid, y3, s[1]),
                self.pf.f_select(valid, z3, s[2]),
            )
            self._point_to_ref(o_ref, out)

        @jax.jit
        def run(state, pts, valid):
            m = state.shape[1]
            sb = min(sub, m)
            spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            pspec = pl.BlockSpec((2 * k, sb, 128), lambda g: (0, g, 0),
                                 memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec((sb, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(state.shape, state.dtype),
                grid=(m // sb,),
                in_specs=[spec, pspec, mspec],
                out_specs=spec,
                interpret=_interpret(),
            )(state, pts, valid)

        return run

    @functools.cached_property
    def madd_affine_fast(self):
        """Fast mixed add: no inline doubling (~1.6x the throughput of
        madd_affine_masked). Returns (state', flags) — flags (M,128)
        uint32, 1 where a lane needed p == q doubling (state kept); the
        wave scheduler re-runs such waves through the unified kernel."""
        k, sub = self.k, self.sub

        def kernel(s_ref, p_ref, m_ref, o_ref, f_ref):
            s = self._point_from_ref(s_ref)
            x2 = [p_ref[i] for i in range(k)]
            y2 = [p_ref[k + i] for i in range(k)]
            x3, y3, z3, need_dbl = _ec_madd_affine_fast_lists(
                self.pf, s, x2, y2)
            valid = m_ref[:] > 0
            out = (
                self.pf.f_select(valid, x3, s[0]),
                self.pf.f_select(valid, y3, s[1]),
                self.pf.f_select(valid, z3, s[2]),
            )
            self._point_to_ref(o_ref, out)
            f_ref[:] = jnp.where(need_dbl & valid, 1, 0).astype(jnp.uint32)

        @jax.jit
        def run(state, pts, valid):
            m = state.shape[1]
            sb = min(sub, m)
            spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            pspec = pl.BlockSpec((2 * k, sb, 128), lambda g: (0, g, 0),
                                 memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec((sb, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct(state.shape, state.dtype),
                    jax.ShapeDtypeStruct(valid.shape, jnp.uint32),
                ),
                grid=(m // sb,),
                in_specs=[spec, pspec, mspec],
                out_specs=(spec, mspec),
                interpret=_interpret(),
            )(state, pts, valid)

        return run

    @functools.cached_property
    def madd_affine_fast_packed(self):
        """madd_affine_fast variant reading points in point-major packed
        blocks: pts (M, 2K, 128) — limb i's tile is pts[:, i, :]. This is
        the layout the wave2 gather pipeline produces (ops/msm_wave2.py)
        without any XLA transpose of the gathered rows."""
        k, sub = self.k, self.sub

        def kernel(s_ref, p_ref, m_ref, o_ref, f_ref):
            s = self._point_from_ref(s_ref)
            x2 = [p_ref[:, i, :] for i in range(k)]
            y2 = [p_ref[:, k + i, :] for i in range(k)]
            x3, y3, z3, need_dbl = _ec_madd_affine_fast_lists(
                self.pf, s, x2, y2)
            valid = m_ref[:] > 0
            out = (
                self.pf.f_select(valid, x3, s[0]),
                self.pf.f_select(valid, y3, s[1]),
                self.pf.f_select(valid, z3, s[2]),
            )
            self._point_to_ref(o_ref, out)
            f_ref[:] = jnp.where(need_dbl & valid, 1, 0).astype(jnp.uint32)

        @jax.jit
        def run(state, pts, valid):
            m = state.shape[1]
            sb = min(sub, m)
            spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            pspec = pl.BlockSpec((sb, 2 * k, 128), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec((sb, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=(
                    jax.ShapeDtypeStruct(state.shape, state.dtype),
                    jax.ShapeDtypeStruct(valid.shape, jnp.uint32),
                ),
                grid=(m // sb,),
                in_specs=[spec, pspec, mspec],
                out_specs=(spec, mspec),
                interpret=_interpret(),
            )(state, pts, valid)

        return run

    @functools.cached_property
    def madd_affine_masked_packed(self):
        """Unified (doubling-capable) mixed add over point-major packed
        blocks — the collision-wave fallback for madd_affine_fast_packed."""
        k, sub = self.k, self.sub

        def kernel(s_ref, p_ref, m_ref, o_ref):
            s = self._point_from_ref(s_ref)
            x2 = [p_ref[:, i, :] for i in range(k)]
            y2 = [p_ref[:, k + i, :] for i in range(k)]
            x3, y3, z3 = _ec_madd_affine_lists(self.pf, s, x2, y2)
            valid = m_ref[:] > 0
            out = (
                self.pf.f_select(valid, x3, s[0]),
                self.pf.f_select(valid, y3, s[1]),
                self.pf.f_select(valid, z3, s[2]),
            )
            self._point_to_ref(o_ref, out)

        @jax.jit
        def run(state, pts, valid):
            m = state.shape[1]
            sb = min(sub, m)
            spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            pspec = pl.BlockSpec((sb, 2 * k, 128), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM)
            mspec = pl.BlockSpec((sb, 128), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(state.shape, state.dtype),
                grid=(m // sb,),
                in_specs=[spec, pspec, mspec],
                out_specs=spec,
                interpret=_interpret(),
            )(state, pts, valid)

        return run

    @functools.cached_property
    def dbl(self):
        """(3K, M, 128) -> doubled points."""
        k, sub = self.k, self.sub

        def kernel(s_ref, o_ref):
            x, y, z = self._point_from_ref(s_ref)
            self._point_to_ref(o_ref, _ec_dbl_lists(self.pf, x, y, z))

        @jax.jit
        def run(state):
            m = state.shape[1]
            sb = min(sub, m)
            spec = pl.BlockSpec((3 * k, sb, 128), lambda g: (0, g, 0),
                                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(state.shape, state.dtype),
                grid=(m // sb,),
                in_specs=[spec],
                out_specs=spec,
                interpret=_interpret(),
            )(state)

        return run


# ---- host <-> device (limbs-first) ------------------------------------------

def encode_points_lf(fctx, pts) -> jnp.ndarray:
    """Affine (x, y) int pairs (None = identity) -> (3K, N) uint32 in
    Montgomery, Jacobian with Z in {0, 1}. N padded by caller."""
    import numpy as np

    k = fctx.k
    n = len(pts)
    out = np.zeros((3 * k, n), dtype=np.uint32)
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
    out[0:k, :] = fctx.encode(xs).T
    out[k:2 * k, :] = fctx.encode(ys).T
    out[2 * k:, :] = fctx.encode(zs).T
    return jnp.asarray(out)


def decode_points_lf(fctx, arr) -> list:
    """(3K, N) device -> list of affine (x, y) or None."""
    import numpy as np

    k = fctx.k
    a = np.asarray(jax.device_get(arr))
    n = a.shape[1]
    xs = fctx.decode(np.ascontiguousarray(a[0:k, :].T))
    ys = fctx.decode(np.ascontiguousarray(a[k:2 * k, :].T))
    zs = fctx.decode(np.ascontiguousarray(a[2 * k:, :].T))
    p = fctx.fld.p
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z % p == 0:
            out.append(None)
            continue
        zi = pow(z, -1, p)
        out.append((x * zi * zi % p, y * zi * zi % p * zi % p))
    return out
