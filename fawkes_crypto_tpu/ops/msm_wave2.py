"""Gather-optimized wave Pippenger: the round-3 rework of ops/msm_wave.py.

The round-2 profile showed the wave MSM is gather-bound: XLA's row gather
of (N, 2K) point tables costs ~47 ns/row (the 32-word rows pad to 128
lanes, and the gather is DMA-issue-bound), plus ~14 ns/row of narrow
transposes — ~85% of MSM wall-clock, with the Pallas madd at only ~7.5
ns/lane.  Three measured fixes (scripts/exp_take.py, exp_wave2.py):

1. PACKED GATHER ROWS — the same table bytes viewed as (N*2K/128, 128):
   a gather row is a full 128-lane line holding `pack` = 128/(2K)
   consecutive points (4 for G1, 2 for G2).  XLA take on full-lane rows
   runs ~10 ns/row: 4.5x the bytes per issue, same issue cost.
2. MXU EXTRACTION — the per-point lane-group select and the row->limb
   transpose fuse into one einsum against a 128x128 identity
   (exact for 16-bit limbs at HIGHEST precision): gathered (WBV, 128)
   becomes point-major (WBV/128, 2K, 128) blocks on the MXU, replacing
   the slow XLA narrow transpose.
3. POINT-MAJOR MADD — PCurve.madd_affine_{fast,masked}_packed consume
   those blocks directly (limb tile = pts[:, i, :]), so no limbs-first
   relayout of gathered data ever materializes.
4. V-ALIGNED INDEX FETCH — slot run starts round down to V-multiples
   (invalid lanes masked), so each wave's sorted-position lookup becomes
   one (V,)-row fetch per slot instead of W*B*V scalar gathers.

Replaces hot loop #4 of SURVEY.md §3.2 (the A/B/C MSMs inside bellman's
create_random_proof, /root/reference/fawkes-crypto/src/backend/
bellman_groth16/prover.rs:80) on the TPU path; scheduling (digit sort,
replica-balanced slots, V-fold copies, masked double-and-add weighting,
tree reduction, host Horner) is inherited from MSMWave.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.jfield import FieldCtx
from .msm_wave import MSMWave


class MSMWave2(MSMWave):
    """Packed-gather wave MSM for one (field, N, c, V) configuration.

    `lf=True` (default) has the extraction einsum emit the gathered
    points directly in the limbs-first layout ((2K, WBV/128, 128) — one
    cheap XLA relayout on the MXU output) so the wave madd runs the
    contiguous-tile `madd_affine_fast` kernel; the point-major variant
    (`lf=False`) keeps the gathered blocks point-major and pays strided
    sublane reads inside `madd_affine_fast_packed` (~3x slower madd at
    2^22 bench shapes; scripts/exp_madd_layout.py)."""

    def __init__(self, fctx: FieldCtx, n: int, c: int = 12, v: int = 8,
                 scalar_bits: int = 254, g2: bool = False, group=None,
                 lf: bool = True, batch: int = 1):
        super().__init__(fctx, n, c=c, v=v, scalar_bits=scalar_bits,
                         g2=g2, group=group, batch=batch)
        row_words = (4 if g2 else 2) * fctx.k  # per-point affine words
        assert 128 % row_words == 0, "point row must divide a 128 lane line"
        self.row_words = row_words
        self.pack = 128 // row_words
        self.lf = lf
        assert n % self.pack == 0
        assert n % v == 0, "table size must be a multiple of V"

    # ---- device pipeline -----------------------------------------------------
    @functools.cached_property
    def _schedule_fn(self):
        """scalars -> the sort-derived wave schedule, as a tuple of
        arrays. Split out of the accumulation so the A/B1/B2 proof MSMs
        (which share one scalar vector z — reference prover.rs:80 runs
        three separate sorts) sort ONCE and run three accumulations
        (ROADMAP perf item 3). Schedule arrays depend only on
        (n, c, v, scalar_bits, batch), so the G2 wave context consumes a
        G1-computed schedule unchanged."""
        n, w, b = self.n, self.w, self.b
        v = self.v

        def sched(scalars):
            digits = self._digits(scalars)  # (W, N)
            # one fused pass returns sorted digits AND the permutation —
            # argsort + take_along_axis costs an extra 92M-element gather
            # (~1.4 s/chunk measured; scripts/exp_wave2.py)
            iota = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32), (w, n))
            sd, order = jax.lax.sort_key_val(digits, iota, dimension=1)
            order_v = order.reshape(w, n // v, v)
            # run boundaries: one flattened lower-bound binary search
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

            # per-slot run windows; bases rounded down to V so every
            # wave's V-lane read is one aligned (V,) row of order_v
            s_starts = jnp.take_along_axis(d_starts, self.d_idx, axis=1)
            s_ends = jnp.take_along_axis(d_ends, self.d_idx, axis=1)
            a_starts = s_starts & jnp.int32(~(v - 1))
            slot_base = a_starts[:, :, None] + self.q_off  # (W, B, 1)
            slot_lo = s_starts[:, :, None]
            slot_end = s_ends[:, :, None]
            base_brow = (slot_base[:, :, 0] >> v.bit_length() - 1)  # /V
            return order_v, slot_base, slot_lo, slot_end, base_brow

        return jax.jit(sched)

    @functools.cached_property
    def _accumulate_fn(self):
        """(points_rows, schedule arrays) -> window sums."""
        n, w, b, c, k = self.n, self.w, self.b, self.c, self.k
        v, wbv, wb = self.v, self.wbv, self.wb
        pack, row_words = self.pack, self.row_words
        pc = self.pc
        lf = self.lf
        g_cnt = wbv // 128
        eye = jnp.eye(128, dtype=jnp.float32)
        madd_fast = pc.madd_affine_fast if lf else pc.madd_affine_fast_packed
        madd_uni = (pc.madd_affine_masked if lf
                    else pc.madd_affine_masked_packed)

        def extract(rows, lsel):
            """(WBV, 128) gathered lines + (WBV,) lane-group selectors ->
            limbs-first (2K, WBV/128, 128) (lf) or point-major
            (WBV/128, 2K, 128) blocks via one MXU einsum."""
            r3 = rows.reshape(g_cnt, 128, 128)
            ls = lsel.reshape(g_cnt, 128, 1)
            sel = r3[:, :, 0:row_words]
            for l in range(1, pack):
                sel = jnp.where(
                    ls == l,
                    r3[:, :, l * row_words:(l + 1) * row_words],
                    sel,
                )
            t = jnp.einsum(
                "gpw,pq->wgq" if lf else "gpw,pq->gwq",
                sel.astype(jnp.float32), eye,
                precision=jax.lax.Precision.HIGHEST,
            )
            return t.astype(jnp.uint32)

        def run(points_rows, order_v, slot_base, slot_lo, slot_end,
                base_brow):
            packed = points_rows.reshape(-1, 128)  # (N/pack, 128)
            stride_rows = self.stride[:, :, 0] // v  # (W, 1) rows per wave

            state = jnp.zeros((3 * k, g_cnt, 128), dtype=jnp.uint32)
            voff = jnp.arange(v, dtype=jnp.int32)

            def cond(carry):
                wave, _ = carry
                return jnp.any(slot_base + wave * self.stride + voff
                               < slot_end)

            def body(carry, *, _extract=extract):
                wave, st = carry
                pos = slot_base + wave * self.stride + voff  # (W, B, V)
                valid = ((pos >= slot_lo) & (pos < slot_end)) \
                    .astype(jnp.uint32)
                brow = base_brow + wave * stride_rows  # (W, B)
                brow = jnp.minimum(jnp.maximum(brow, 0), n // v - 1)
                j = jnp.take_along_axis(
                    order_v, brow[:, :, None], axis=1
                )  # (W, B, V) point indices
                jf = j.reshape(-1)
                rows = jnp.take(packed, jf // pack, axis=0)  # (WBV, 128)
                pts = _extract(rows, (jf % pack).astype(jnp.int32))
                vmask = valid.reshape(-1, 128)
                st2, flags = madd_fast(st, pts, vmask)
                st = jax.lax.cond(
                    jnp.any(flags > 0),
                    lambda s, q, m: madd_uni(s, q, m),
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

            return flat[:, jnp.asarray([i * b for i in range(w)])]

        return jax.jit(run)

    @functools.cached_property
    def _window_sums(self):
        """(points_rows, scalars) -> window sums; composition of the
        split schedule + accumulate jits (call-site compatible with
        MSMWave._window_sums)."""
        def run(points_rows, scalars):
            return self._accumulate_fn(points_rows,
                                       *self._schedule_fn(scalars))

        return run

    # ---- shared-schedule entry points (A/B1/B2 share z's digit sort) -----
    def schedule(self, scalars):
        return self._schedule_fn(scalars)

    def msm_sched(self, points_rows, sched):
        """Like msm() but consuming a precomputed schedule()."""
        from .msm_wave import decode_points_lf, decode_points_lf_g2

        assert self.batch == 1
        tw = self._accumulate_fn(points_rows, *sched)
        window_pts = (decode_points_lf_g2(self.fctx, tw, self.group)
                      if self.g2 else decode_points_lf(self.fctx, tw))
        return self._horner(window_pts)

    def msm_batch_sched(self, points_rows, sched):
        from .msm_wave import decode_points_lf, decode_points_lf_g2

        tw = self._accumulate_fn(points_rows, *sched)
        pts = (decode_points_lf_g2(self.fctx, tw, self.group)
               if self.g2 else decode_points_lf(self.fctx, tw))
        wb_ = self.w_base
        return [self._horner(pts[i * wb_:(i + 1) * wb_])
                for i in range(self.batch)]
