"""Wave-based Pippenger MSM on Pallas EC kernels (the fast G1 path).

Replaces hot loop #4 of SURVEY.md §3.2 (the A/B/C MSMs inside bellman's
create_random_proof, /root/reference/fawkes-crypto/src/backend/
bellman_groth16/prover.rs:80) with a TPU-shaped schedule:

  1. digit extraction (W windows x N points) and per-window argsort;
  2. bucket-run boundaries via one flattened manual binary search;
  3. WAVE accumulation with V-fold interleaving: every (window, digit)
     gets V x R independent accumulator slots (R = replicas claiming the
     bucket slots a window's digit range leaves unused — the top window
     has only 254 mod c live bits, so its runs are up to 2^(c - r) times
     longer and would otherwise dominate the wave count). Wave step s,
     copy (q, v) consumes sorted-run position start + (q*V + v) + s*R*V.
     Each step is ONE fused masked *mixed* Jacobian add (ops/pcurve.py
     madd_masked) over all W*B*V lanes — 2^18 lanes at the defaults,
     where the measured mont-mul hits its 633M/s peak on v5e.
     Conflict-free by construction: no scatters, no segmented scans;
  4. V-copy reduction (log2 V lane-rolled general adds), compaction;
  5. digit weighting sum_d d*S_slot by static-bit masked double-and-add
     (replica slots carry their digit's weight, so replicas just sum in);
  6. in-window reduction over all B slots (log2 B lane-rolled adds);
  7. final Horner over W window sums on the host (W tiny; C++ backend).

The point table is row-major affine (N, 2K) — 128-byte rows [X|Y] with
(0,0) encoding the identity (not on y^2 = x^3 + 3) — so wave gathers are
contiguous row reads. Scalars are (N, K) canonical 16-bit limbs.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.jfield import FieldCtx
from ..ff.limbs import LIMB_BITS
from ..ff.pfield import PField
from ..ff.pquad import PQuadField
from .pcurve import PCurve, decode_points_lf


def encode_points_affine_rows(fctx: FieldCtx, pts) -> jnp.ndarray:
    """Affine (x, y) int pairs (None = identity) -> (N, 2K) uint32
    Montgomery rows [X limbs | Y limbs]; identity = all-zero row."""
    k = fctx.k
    xs, ys = [], []
    for p in pts:
        if p is None:
            xs.append(0)
            ys.append(0)
        else:
            xs.append(p[0])
            ys.append(p[1])
    out = np.zeros((len(pts), 2 * k), dtype=np.uint32)
    out[:, 0:k] = fctx.encode(xs)
    out[:, k:] = fctx.encode(ys)
    # identity rows must be all-zero in *Montgomery* form too (0 -> 0)
    for i, p in enumerate(pts):
        if p is None:
            out[i, :] = 0
    return jnp.asarray(out)


def encode_points_affine_rows_g2(fctx: FieldCtx, pts) -> jnp.ndarray:
    """Affine (Fq2, Fq2) pairs (None = identity) -> (N, 4K) uint32
    Montgomery rows [X.c0 | X.c1 | Y.c0 | Y.c1]; identity = all-zero
    ((0,0) is not on y^2 = x^3 + 3/(9+u))."""
    k = fctx.k
    cols = [[], [], [], []]
    for p in pts:
        if p is None:
            for c in cols:
                c.append(0)
        else:
            x, y = p
            cols[0].append(x.c0 if hasattr(x, "c0") else x[0])
            cols[1].append(x.c1 if hasattr(x, "c1") else x[1])
            cols[2].append(y.c0 if hasattr(y, "c0") else y[0])
            cols[3].append(y.c1 if hasattr(y, "c1") else y[1])
    out = np.zeros((len(pts), 4 * k), dtype=np.uint32)
    for j, c in enumerate(cols):
        out[:, j * k:(j + 1) * k] = fctx.encode(c)
    for i, p in enumerate(pts):
        if p is None:
            out[i, :] = 0
    return jnp.asarray(out)


def decode_points_lf_g2(fctx: FieldCtx, arr, group=None) -> list:
    """(6K, N) device Fq2-Jacobian -> list of affine (Fq2, Fq2) or None.
    `group` is the engine's host group module (defaults to BN254)."""
    if group is None:
        from ..native import bn_pairing as group
    Fq2 = group.Fq2

    k = fctx.k
    a = np.asarray(jax.device_get(arr))
    comps = [fctx.decode(np.ascontiguousarray(a[i * k:(i + 1) * k, :].T))
             for i in range(6)]
    out = []
    for i in range(a.shape[1]):
        z = Fq2(comps[4][i], comps[5][i])
        if z.is_zero():
            out.append(None)
            continue
        zi = z.inv()
        zi2 = zi.square()
        out.append((Fq2(comps[0][i], comps[1][i]) * zi2,
                    Fq2(comps[2][i], comps[3][i]) * zi2 * zi))
    return out


class MSMWave:
    """Compiled wave MSM for one (field, N, c, V) configuration.

    `g2=True` runs the identical schedule over Fq2 coordinates (the
    PQuadField limb rows): point rows are (N, 4K), accumulator state is
    (6K, ., 128), and every wave step is the same unified mixed add
    compiled over the quadratic extension — the Groth16 B-query on TPU
    (VERDICT round-1 item #1)."""

    def __init__(self, fctx: FieldCtx, n: int, c: int = 8, v: int = 32,
                 scalar_bits: int = 254, g2: bool = False, group=None,
                 batch: int = 1):
        # host group module for the tail arithmetic (Horner, chunk
        # accumulation); BN254 by default, pass E.g for other engines so
        # the device path never reduces mod the wrong prime
        # (round-2 VERDICT weak #4 / ADVICE high).
        if group is None:
            from ..native import bn_pairing as group
        self.group = group
        self.fctx = fctx
        self.g2 = g2
        self.pf = (PQuadField.get(fctx.fld) if g2 else PField.get(fctx.fld))
        self.pc = PCurve.get(self.pf)
        self.n = n
        self.c = c
        self.v = v
        self.b = 1 << c
        # `batch` > 1 runs B independent MSMs over ONE shared point table
        # in a single schedule: proof i's windows are just W more windows
        # (digit sort, wave accumulation, reductions all amortize — the
        # dp prove_many path, backend/groth16/prover.py)
        self.batch = batch
        self.w_base = (scalar_bits + c - 1) // c
        self.w = self.w_base * batch
        self.k = self.pf.k  # per-coordinate limb rows (2K for Fq2)
        wbv = self.w * self.b * v
        assert wbv % 1024 == 0, "W*B*V must tile (multiple of 1024)"
        self.wbv = wbv
        wb = self.w * self.b
        assert wb % 128 == 0
        self.wb = wb

        # per-window live digit counts and replica factors
        live_bits = [min(c, scalar_bits - w_ * c)
                     for w_ in range(self.w_base)] * batch
        self.digit_counts = [1 << lb for lb in live_bits]
        self.replicas = [self.b // dc for dc in self.digit_counts]

        # static slot maps (W, B): slot b of window w -> digit, copy index
        d_idx = np.zeros((self.w, self.b), dtype=np.int32)
        q_idx = np.zeros((self.w, self.b), dtype=np.int32)
        stride = np.zeros((self.w, 1, 1), dtype=np.int32)
        for w_ in range(self.w):
            dc, r = self.digit_counts[w_], self.replicas[w_]
            d_idx[w_] = np.arange(self.b) % dc
            q_idx[w_] = np.arange(self.b) // dc
            stride[w_, 0, 0] = r * v
        self.d_idx = jnp.asarray(d_idx)
        self.q_off = jnp.asarray(q_idx[:, :, None] * v)  # (W, B, 1)
        self.stride = jnp.asarray(stride)

        # static masks. Wide phase lane = ((w*B + b)*V + v_copy)
        v_pos = np.tile(np.arange(v), wb)
        self.v_masks = jnp.asarray(np.stack([
            (v_pos < (v >> (l + 1))).astype(np.uint32).reshape(-1, 128)
            for l in range(int(np.log2(v)))
        ])) if v > 1 else None
        # compact phase lane = (w*B + b): weight = DIGIT of the slot
        d_flat = d_idx.reshape(-1)
        self.bit_masks = jnp.asarray(np.stack([
            ((d_flat >> bit) & 1).astype(np.uint32).reshape(-1, 128)
            for bit in range(c)
        ]))
        b_pos = np.tile(np.arange(self.b), self.w)
        self.tree_masks = jnp.asarray(np.stack([
            (b_pos < (self.b >> (l + 1))).astype(np.uint32).reshape(-1, 128)
            for l in range(c)
        ]))

    # ---- digit extraction ----------------------------------------------------
    def _digits_one(self, scalars: jnp.ndarray) -> jnp.ndarray:
        k = scalars.shape[-1]
        mask = jnp.uint32(self.b - 1)
        outs = []
        for w in range(self.w_base):
            off = w * self.c
            l0 = off // LIMB_BITS
            sh = off % LIMB_BITS
            d = scalars[:, l0] >> sh
            if sh + self.c > LIMB_BITS and l0 + 1 < k:
                d = d | (scalars[:, l0 + 1] << (LIMB_BITS - sh))
            outs.append((d & mask).astype(jnp.int32))
        return jnp.stack(outs, axis=0)

    def _digits(self, scalars: jnp.ndarray) -> jnp.ndarray:
        """(N, K) -> (W, N); batch mode: (B, N, K) -> (B*W_base, N)."""
        if self.batch == 1:
            return self._digits_one(scalars)
        assert scalars.shape[0] == self.batch
        return jnp.concatenate(
            [self._digits_one(scalars[i]) for i in range(self.batch)],
            axis=0,
        )

    # ---- device pipeline -------------------------------------------------------
    @functools.cached_property
    def _window_sums(self):
        n, w, b, c, k = self.n, self.w, self.b, self.c, self.k
        v, wbv, wb = self.v, self.wbv, self.wb
        pc = self.pc

        def run(points_rows, scalars):
            digits = self._digits(scalars)  # (W, N)
            order = jnp.argsort(digits, axis=1).astype(jnp.int32)
            sd = jnp.take_along_axis(digits, order, axis=1)
            order_t = order.T  # (N, W): major-axis gathers below
            # run boundaries: offset window w's digits by w*B so the
            # flattened (W*N,) array is globally sorted; one lower-bound
            # binary search answers all W*B starts and ends
            woff = (jnp.arange(w, dtype=jnp.int32) * b)[:, None]
            sd_flat = (sd + woff).reshape(-1)
            queries = (woff + jnp.arange(b, dtype=jnp.int32)[None, :])
            q_all = jnp.concatenate(
                [queries.reshape(-1), queries.reshape(-1) + 1]
            )

            def lower_bound(q):
                total = w * n
                lo = jnp.zeros_like(q)
                hi = jnp.full_like(q, total)

                def step(_, lohi):
                    lo_, hi_ = lohi
                    live = lo_ < hi_
                    mid = (lo_ + hi_) >> 1
                    val = jnp.take(sd_flat, mid)
                    right = live & (val < q)
                    return (jnp.where(right, mid + 1, lo_),
                            jnp.where(live & ~right, mid, hi_))

                lo, hi = jax.lax.fori_loop(
                    0, total.bit_length() + 1, step, (lo, hi)
                )
                return lo

            bounds = lower_bound(q_all)
            row_off = jnp.repeat(jnp.arange(w, dtype=jnp.int32) * n, b)
            d_starts = (bounds[: w * b] - row_off).reshape(w, b)
            d_ends = (bounds[w * b:] - row_off).reshape(w, b)
            d_ends = d_ends.at[:, 0].set(d_starts[:, 0])  # weight-0 digit

            # per-slot run windows via the static replica maps
            s_starts = jnp.take_along_axis(d_starts, self.d_idx, axis=1)
            s_ends = jnp.take_along_axis(d_ends, self.d_idx, axis=1)
            slot_base = s_starts[:, :, None] + self.q_off  # (W, B, 1)
            slot_end = s_ends[:, :, None]

            state = jnp.zeros((3 * k, wbv // 128, 128), dtype=jnp.uint32)
            voff = jnp.arange(v, dtype=jnp.int32)

            def cond(carry):
                wave, _ = carry
                return jnp.any(slot_base + wave * self.stride + voff
                               < slot_end)

            def body(carry):
                wave, st = carry
                pos = slot_base + wave * self.stride + voff  # (W, B, V)
                valid = (pos < slot_end).astype(jnp.uint32)
                safe = jnp.minimum(jnp.maximum(pos, 0), n - 1)
                idx = jnp.take_along_axis(
                    order_t,
                    safe.transpose(1, 2, 0).reshape(b * v, w),
                    axis=0,
                )  # (B*V, W)
                idx = idx.reshape(b, v, w).transpose(2, 0, 1).reshape(-1)
                pts = jnp.take(points_rows, idx, axis=0)  # (WBV, 2K) rows
                pts = pts.T.reshape(2 * k, wbv // 128, 128)
                vmask = valid.reshape(-1, 128)
                # fast path: mixed add without the doubling branch; if any
                # lane hit p == q (duplicate point onto an equal
                # accumulator) re-run the whole wave unified — rare, and
                # only that wave pays.
                st2, flags = pc.madd_affine_fast(st, pts, vmask)
                st = jax.lax.cond(
                    jnp.any(flags > 0),
                    lambda s, q, m: pc.madd_affine_masked(s, q, m),
                    lambda s, q, m: st2,
                    st, pts, vmask,
                )
                return wave + 1, st

            _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))

            # reduce the V copies: log2(V) lane-rolled general adds
            flat = state.reshape(3 * k, wbv)
            for l in range(int(np.log2(v)) if v > 1 else 0):
                shift = v >> (l + 1)
                other = jnp.roll(flat, -shift, axis=1)
                flat = pc.add_masked(
                    flat.reshape(3 * k, -1, 128),
                    other.reshape(3 * k, -1, 128),
                    self.v_masks[l],
                ).reshape(3 * k, wbv)
            # compact: keep v==0 lanes -> (3K, W*B)
            comp = flat.reshape(3 * k, wb, v)[:, :, 0]

            # weighted sum over slots: weight = slot digit
            res = jnp.zeros_like(comp).reshape(3 * k, -1, 128)
            cur = comp.reshape(3 * k, -1, 128)
            for bit in range(c):
                res = pc.add_masked(res, cur, self.bit_masks[bit])
                if bit + 1 < c:
                    cur = pc.dbl(cur)

            # in-window reduction over B slots
            flat = res.reshape(3 * k, wb)
            for level in range(c):
                shift = b >> (level + 1)
                other = jnp.roll(flat, -shift, axis=1)
                flat = pc.add_masked(
                    flat.reshape(3 * k, -1, 128),
                    other.reshape(3 * k, -1, 128),
                    self.tree_masks[level],
                ).reshape(3 * k, wb)

            return flat[:, jnp.asarray([i * b for i in range(w)])]  # (3K, W)

        return jax.jit(run)

    # ---- public API ---------------------------------------------------------
    def window_sums(self, points_rows, scalars):
        return self._window_sums(points_rows, scalars)

    @property
    def _is_bn(self) -> bool:
        return self.group.__name__.endswith("bn_pairing")

    def _horner(self, window_pts):
        """Host finish: sum_w 2^(c*w) * W_w, Horner over ~22 points."""
        g_add, g_mul = self.group.g_add, self.group.g_mul
        if self.g2:
            acc = None
            for wpt in reversed(window_pts):
                if acc is not None:
                    acc = g_mul(acc, 1 << self.c)
                if wpt is not None:
                    acc = g_add(acc, wpt)
            return acc
        from ..native import cext

        use_c = self._is_bn and cext.available()
        acc = None
        for wpt in reversed(window_pts):
            if acc is not None:
                acc = (cext.g1_mul(acc, 1 << self.c) if use_c
                       else g_mul(acc, 1 << self.c))
            if wpt is not None:
                acc = (cext.g1_add_pts(acc, wpt) if use_c
                       else g_add(acc, wpt))
        return acc

    def msm_chunked(self, points_rows, scalars):
        """MSM over tables LARGER than this context's n: slices the
        (N_total, .) table/scalars into n-sized chunks, runs the compiled
        wave pipeline per chunk (one compile — shapes are fixed), and
        accumulates the per-chunk window sums on the host (W tiny). This
        is the streamed-CRS shape of SURVEY.md §7 hard part 7: peak HBM
        is one chunk's sort arrays + state, not the whole table's."""
        g_add = self.group.g_add

        n_total = points_rows.shape[0]
        assert n_total % self.n == 0, "table must be a multiple of chunk n"
        acc = [None] * self.w
        for i in range(0, n_total, self.n):
            tw = self._window_sums(points_rows[i:i + self.n],
                                   scalars[i:i + self.n])
            pts = (decode_points_lf_g2(self.fctx, tw, self.group)
                   if self.g2 else decode_points_lf(self.fctx, tw))
            for w_ in range(self.w):
                if pts[w_] is not None:
                    acc[w_] = g_add(acc[w_], pts[w_])
        return self._horner(acc)

    def msm(self, points_rows: jnp.ndarray, scalars: jnp.ndarray):
        """points_rows (N, 2K) affine ((N, 4K) for g2); scalars (N, K)
        canonical 16-bit limbs. Returns the affine point (or None) on
        the host: (x, y) ints for G1, (Fq2, Fq2) for G2."""
        assert self.batch == 1, "use msm_batch on a batched context"
        tw = self._window_sums(points_rows, scalars)
        window_pts = (decode_points_lf_g2(self.fctx, tw, self.group)
                      if self.g2 else decode_points_lf(self.fctx, tw))
        return self._horner(window_pts)

    def msm_batch(self, points_rows: jnp.ndarray, scalars: jnp.ndarray):
        """Batched MSMs over one table: scalars (B, N, K) -> list of B
        affine points (one schedule; proof i owns windows
        [i*W_base, (i+1)*W_base))."""
        assert scalars.shape[0] == self.batch
        tw = self._window_sums(points_rows, scalars)
        pts = (decode_points_lf_g2(self.fctx, tw, self.group)
               if self.g2 else decode_points_lf(self.fctx, tw))
        wb_ = self.w_base
        return [self._horner(pts[i * wb_:(i + 1) * wb_])
                for i in range(self.batch)]
