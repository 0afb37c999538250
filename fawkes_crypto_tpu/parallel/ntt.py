"""Domain-sharded NTT over a device mesh (shard_map + ppermute).

This is the TPU-native replacement for the CPU thread-pool FFT inside the
reference's external bellman_ce prover (SURVEY.md §2.4/§2.5: "butterfly
stages exchanged all-to-all across hosts"). Decomposition:

  A DIF (natural -> bit-reversed) network on N = D*M points, stored
  row-major as (D, M) with row d on device d, has the property that its
  first log2(D) stages pair element (d, c) with ((d XOR mask), c) for
  mask = D/2, D/4, ..., 1 — i.e. *whole-shard* exchanges, one ppermute
  each — and its remaining stages form an independent size-M DIF per
  device with root w^D. The inverse DIT runs the mirror image: local
  size-M DIT first, then log2(D) ppermute stages in reverse.

So a length-N transform costs log2(D) ICI hops of one shard each, plus a
purely local transform — no global bit-reversal, no transpose (pairs with
the bit-reversed-order convention of ops/ntt.py).

All arrays are (..., N, K) uint32 Montgomery limbs outside shard_map and
(..., M, K) inside; twiddle tables are passed in sharded over the same
axis so each device reads only its (1, M, K) slice.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ff.jfield import FieldCtx
from ..ff.limbs import LIMB_BITS, LIMB_MASK
from ..ops.ntt import NTTCtx


def _mont_table(fld, values, k) -> np.ndarray:
    out = np.zeros((len(values), k), dtype=np.uint32)
    for i, v in enumerate(values):
        m = fld.to_mont(v % fld.p)
        for j in range(k):
            out[i, j] = (m >> (LIMB_BITS * j)) & LIMB_MASK
    return out


class DistNTT:
    """Per (field, N, mesh-axis) distributed transform pair."""

    def __init__(self, fctx: FieldCtx, n: int, mesh: Mesh, axis: str = "sp"):
        d = mesh.shape[axis]
        assert n % d == 0 and (d & (d - 1)) == 0, "shards must divide N, pow2"
        m = n // d
        assert m >= 1 and (m & (m - 1)) == 0
        self.fctx = fctx
        self.n = n
        self.d = d
        self.m = m
        self.mesh = mesh
        self.axis = axis
        self.logd = d.bit_length() - 1
        self.local = NTTCtx.get(fctx, m)  # root w^D == root_{M}; see ops/ntt.py
        fld = fctx.fld
        p = fld.p
        logn = n.bit_length() - 1
        w = pow(fld.root_of_unity, 1 << (fld.s - logn), p)
        winv = pow(w, -1, p)
        k = fctx.k
        # Global-stage twiddles: stage j uses h = N >> (j+1); element (r, c)
        # needs w^(((r mod (h/M))*M + c) * N/(2h)). h/M = D >> (j+1) = mask.
        self.fw_tw = []   # forward stages j = 0..logd-1, type (D, M, K)
        self.bw_tw = []   # inverse twiddles, same indexing
        for j in range(self.logd):
            h = n >> (j + 1)
            mask = d >> (j + 1)
            stride = n // (2 * h)
            fw = np.zeros((d, m, k), dtype=np.uint32)
            bw = np.zeros((d, m, k), dtype=np.uint32)
            for r in range(d):
                base = (r % mask) * m if mask else 0
                exps = [((base + c) * stride) % n for c in range(m)]
                fw[r] = _mont_table(fld, [pow(w, e, p) for e in exps], k)
                bw[r] = _mont_table(fld, [pow(winv, e, p) for e in exps], k)
            self.fw_tw.append(jnp.asarray(fw))
            self.bw_tw.append(jnp.asarray(bw))
        self.n_inv = jnp.asarray(_mont_table(fld, [pow(n, -1, p)], k)[0])

    # ---- shard-local bodies (run under shard_map) -------------------------
    def _global_dif_stage(self, x, tw, j):
        f = self.fctx
        mask = self.d >> (j + 1)
        perm = [(i, i ^ mask) for i in range(self.d)]
        other = jax.lax.ppermute(x, self.axis, perm)
        r = jax.lax.axis_index(self.axis)
        is_bot = (r & mask) != 0
        top = f.add(x, other)                      # valid when we hold u
        bot = f.mont_mul(f.sub(other, x), tw)      # u=other, w=x when bot
        return jnp.where(is_bot, bot, top)

    def _global_dit_stage(self, x, tw, j):
        f = self.fctx
        mask = self.d >> (j + 1)
        perm = [(i, i ^ mask) for i in range(self.d)]
        r = jax.lax.axis_index(self.axis)
        is_bot = (r & mask) != 0
        # DIT butterfly: wv = w*tw; top = u + wv; bot = u - wv.
        # top device holds u, partner holds w; bot device vice versa.
        my_scaled = f.mont_mul(x, tw)
        other = jax.lax.ppermute(
            jnp.where(is_bot, my_scaled, x), self.axis, perm
        )
        top = f.add(x, other)        # u + (w*tw) from partner
        bot = f.sub(other, my_scaled)  # u from partner - w*tw
        return jnp.where(is_bot, bot, top)

    def _fwd_body(self, x, *tws):
        for j in range(self.logd):
            x = self._global_dif_stage(x, tws[j][0], j)
        return self.local.ntt(x)

    def _inv_body(self, x, *tws):
        x = self.local._inv(x, self.local.winv_pows)
        for j in range(self.logd - 1, -1, -1):
            x = self._global_dit_stage(x, tws[j][0], j)
        return self.fctx.mont_mul(x, self.n_inv)

    # ---- public API --------------------------------------------------------
    def _specs(self, batch_axes: Tuple) -> Tuple:
        lead = tuple(batch_axes)
        return P(*lead, self.axis, None)

    def make(self, batch_axes: Tuple = ()):
        """Returns (ntt_fn, intt_fn) shard-mapped over the mesh.

        batch_axes: mesh axis names (or None) for leading batch dims, e.g.
        ("dp",) for a (B, N, K) input with B data-parallel.
        """
        spec = self._specs(batch_axes)
        tw_spec = P(self.axis, None, None)
        in_specs_f = (spec,) + tuple(tw_spec for _ in range(self.logd))
        in_specs_b = (spec,) + tuple(tw_spec for _ in range(self.logd))

        # jitted: an un-jitted shard_map executes primitive-by-primitive
        # (one tiny sharded executable per op — see parallel/msm.py)
        fwd = jax.jit(shard_map(self._fwd_body, mesh=self.mesh,
                                in_specs=in_specs_f, out_specs=spec,
                                check_vma=False))
        inv = jax.jit(shard_map(self._inv_body, mesh=self.mesh,
                                in_specs=in_specs_b, out_specs=spec,
                                check_vma=False))

        def ntt_fn(x):
            return fwd(x, *self.fw_tw)

        def intt_fn(x):
            return inv(x, *self.bw_tw)

        return ntt_fn, intt_fn
