"""Pippenger multi-scalar multiplication on TPU (XLA, scatter-free hot path).

Replaces the MSMs inside the reference's external bellman_ce prover — the
A/B/C queries of Groth16 create_random_proof (SURVEY.md §2.4, invoked at
/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:80).
Generic over the coordinate field: G1 (FieldCtx) and G2 (QuadCtx).

TPU-first bucket accumulation (SURVEY.md §7 hard part #2 — scatter-hostile
architecture):

  per window (lax.scan over W windows):
    1. digit extraction from 16-bit scalar limbs (static indexing);
    2. argsort points by digit — gathers, no scatters;
    3. reshape sorted stream to (S, C): a length-S sequential scan,
       vectorized over C independent columns, computes running
       segment sums (carry resets at digit boundaries) — exactly N
       point-adds of work, the Pippenger optimum;
    4. each column's per-digit partial (the running sum at the last
       position of each digit run) is placed into a (C, B) slot array —
       the only scatter, collision-free by construction (one slot per
       (column, digit); non-final positions target a dump slot);
    5. tree-reduce columns (log2 C batched adds) -> B bucket sums;
    6. sum_b b * S_b via masked double-and-add over the *static* bit
       pattern of the bucket index (c doublings + c masked adds,
       batched over B), then a log2 B reduction tree.
  windows combine by Horner: c doublings + 1 add per window (scan).

All field elements are Montgomery uint32 limb tensors; points are Jacobian
(X, Y, Z) tuples (ops/curve.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.limbs import LIMB_BITS, ints_to_limbs
from .curve import (
    Point,
    ec_add,
    ec_double,
    ec_scan_reduce,
    ec_select,
    ec_zero_like,
)


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class MSMCtx:
    """Compiled MSM for one (field ctx, N, window size) configuration."""

    def __init__(self, f, n: int, c: int = 8, scan_len: Optional[int] = None,
                 scalar_bits: int = 254):
        assert n & (n - 1) == 0, "MSM size must be padded to a power of two"
        self.f = f
        self.n = n
        self.c = c
        self.n_buckets = 1 << c
        self.n_windows = (scalar_bits + c - 1) // c
        if scan_len is None:
            # balance sequential depth (S) against the (C, B) slot-array
            # footprint; both S and C = N/S stay powers of two
            scan_len = min(max(n // 256, 1), 512)
        assert scan_len & (scan_len - 1) == 0 and n % scan_len == 0
        self.s = scan_len
        self.cols = n // scan_len

    # ---- digit extraction ---------------------------------------------------
    def _digits(self, scalars: jnp.ndarray) -> jnp.ndarray:
        """(N, K) canonical 16-bit limbs -> (W, N) int32 window digits."""
        k = scalars.shape[-1]
        mask = jnp.uint32(self.n_buckets - 1)
        outs = []
        for w in range(self.n_windows):
            off = w * self.c
            l0 = off // LIMB_BITS
            sh = off % LIMB_BITS
            d = scalars[:, l0] >> sh
            if sh + self.c > LIMB_BITS and l0 + 1 < k:
                d = d | (scalars[:, l0 + 1] << (LIMB_BITS - sh))
            outs.append((d & mask).astype(jnp.int32))
        return jnp.stack(outs, axis=0)

    # ---- bucket accumulation -------------------------------------------------
    def _bucket_sums(self, pts: Point, dig: jnp.ndarray) -> Point:
        """Points (N,...) sorted by digit externally? No: sorts here.
        Returns (B, ...) bucket sums (bucket 0 included, weight 0 later)."""
        f = self.f
        s, cols, b = self.s, self.cols, self.n_buckets
        order = jnp.argsort(dig)
        sd = jnp.take(dig, order, axis=0)
        spts = tuple(jnp.take(p, order, axis=0) for p in pts)

        # scan-major layout: element (t, j) = sorted[j*S + t]
        def to_sc(x):
            return jnp.moveaxis(x.reshape((cols, s) + x.shape[1:]), 1, 0)

        seg = to_sc(sd)  # (S, C)
        pts_sc = tuple(to_sc(p) for p in spts)
        prev = jnp.concatenate([seg[:1] - 1, seg[:-1]], axis=0)
        is_new = seg != prev  # (S, C); first row always True
        is_last = jnp.concatenate(
            [seg[:-1] != seg[1:], jnp.ones_like(seg[:1], dtype=bool)], axis=0
        )

        zero = tuple(jnp.zeros_like(p[0]) for p in pts_sc)

        def step(acc, inp):
            p_t, new_t = inp
            acc = ec_select(f, new_t, p_t, ec_add(f, acc, p_t))
            return acc, acc

        _, running = jax.lax.scan(step, zero, (pts_sc, is_new))
        # slot array: (C, B+1); non-final positions -> dump slot B
        slot = jnp.where(is_last, seg, b)  # (S, C)
        col_ix = jnp.broadcast_to(jnp.arange(cols), (s, cols))
        buckets = []
        for r in running:
            tail = r.shape[2:]
            acc = jnp.zeros((cols, b + 1) + tail, dtype=r.dtype)
            acc = acc.at[col_ix.ravel(), slot.ravel()].set(
                r.reshape((s * cols,) + tail)
            )
            buckets.append(acc[:, :b])
        # reduce columns -> (B, ...): scan-accumulate keeps the graph at one
        # compiled add while each step stays B-points wide on the VPU
        return ec_scan_reduce(f, tuple(buckets), axis=0)

    def _weighted_bucket_sum(self, buckets: Point) -> Point:
        """sum_b b * S_b via static-bit masked double-and-add (one scanned
        add+double body), then a two-level scan reduction over buckets."""
        f = self.f
        b = self.n_buckets
        idx = np.arange(b)
        masks = jnp.asarray(
            ((idx[None, :] >> np.arange(self.c)[:, None]) & 1).astype(bool)
        )  # (c, B)

        def bit_step(carry, m):
            res, cur = carry
            res = ec_select(f, m, ec_add(f, res, cur), res)
            cur = ec_double(f, cur)
            return (res, cur), None

        zero = ec_zero_like(f, buckets)
        (res, _), _ = jax.lax.scan(bit_step, (zero, buckets), masks)
        # reduce B points: reshape to 2D so each scan step stays vectorized
        lo = 1 << (self.c // 2)
        hi = b // lo
        res2 = tuple(r.reshape((hi, lo) + r.shape[1:]) for r in res)
        return ec_scan_reduce(f, ec_scan_reduce(f, res2, axis=0), axis=0)

    # ---- full MSM --------------------------------------------------------------
    def msm(self, pts: Point, scalars: jnp.ndarray) -> Point:
        """pts: Jacobian (N, ...) coords; scalars: (N, K) canonical limbs.
        Returns a single Jacobian point (coords without the N axis)."""
        f = self.f
        digits = self._digits(scalars)  # (W, N)

        def window_body(_, dig):
            bsums = self._bucket_sums(pts, dig)
            return 0, self._weighted_bucket_sum(bsums)

        _, ts = jax.lax.scan(window_body, 0, digits)  # coords (W, ...)

        top = tuple(t[-1] for t in ts)
        rest = tuple(t[self.n_windows - 2 :: -1] for t in ts)  # high -> low

        def horner(acc, t_w):
            def dbl(_, a):
                return ec_double(f, a)

            acc = jax.lax.fori_loop(0, self.c, dbl, acc)
            return ec_add(f, acc, t_w), None

        acc, _ = jax.lax.scan(horner, top, rest)
        return acc

    @functools.cached_property
    def jit_msm(self):
        return jax.jit(self.msm)


# ---- host-facing helpers -----------------------------------------------------

def pad_msm_size(n: int, min_size: int = 16) -> int:
    return max(_next_pow2(n), min_size)


def encode_scalars(scalars, n_padded: int, k: int) -> jnp.ndarray:
    """Canonical ints (or an already-encoded (N, K) uint32 limb array —
    the native witness path, backend/groth16/witness_native.py) ->
    (n_padded, K) uint32 16-bit limbs (zero padded)."""
    if isinstance(scalars, np.ndarray) and scalars.ndim == 2:
        assert scalars.shape[1] == k
        if scalars.shape[0] < n_padded:
            scalars = np.pad(
                scalars, ((0, n_padded - scalars.shape[0]), (0, 0)))
        return jnp.asarray(scalars)
    xs = list(scalars) + [0] * (n_padded - len(scalars))
    return jnp.asarray(ints_to_limbs(xs, k))
