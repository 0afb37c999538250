"""Mesh-parallel Groth16 prover: the REAL prove() pipeline sharded over a
jax.sharding.Mesh.

The TPU-native analog of the multicore worker inside the reference's
external bellman_ce crate (SURVEY.md §2.4 last row / §2.5): where bellman
fans FFT butterflies and MSM chunks over a CPU thread pool during
create_random_proof (/root/reference/fawkes-crypto/src/backend/
bellman_groth16/prover.rs:80), this prover shards

  * the h(x) NTT pipeline over the `sp` mesh axis (parallel/ntt.py
    DistNTT: log2(D) ppermute shard exchanges + local transforms), and
  * all five proof MSMs (A, B1, B G2, L, H) over the same axis
    (parallel/msm.py DistMSM: point-sharded local Pippenger + ppermute
    butterfly reduction),

with the CRS queries resident device-side, sharded along the point axis
so each device holds 1/D of every query. Proofs are bit-identical to the
single-chip DeviceProver / host path under a fixed seed (the pipeline is
the same math in the same order; only the layout is distributed).

Used by prove(..., mesh=...) and exercised end-to-end (real prove() on a
virtual CPU mesh) by __graft_entry__.dryrun_multichip and
tests/test_mesh_prove.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ...ff.jfield import FieldCtx
from ...ff.jquad import QuadCtx
from ...ops.curve import encode_points_g1, encode_points_g2
from ...ops.msm import encode_scalars, pad_msm_size
from ...ops.ntt import NTTCtx, bitrev_permutation
from ...ops.spmv import SpMV
from ...parallel.msm import DistMSM
from ...parallel.ntt import DistNTT


class MeshProver:
    """Per-(Parameters, mesh) distributed device state + compiled kernels.

    `axis` is the mesh axis the NTT domain and MSM point tables shard
    over; other mesh axes (e.g. a dp axis for batched proving) are left
    free for the caller.
    """

    def __init__(self, params, mesh: Mesh, axis: str = "sp"):
        self.params = params
        self.mesh = mesh
        self.axis = axis
        d = mesh.shape[axis]
        assert d & (d - 1) == 0, "mesh axis size must be a power of two"
        self.d = d

        E = params.E
        self.E = E
        Fq, Fr = E.fq, E.fr
        self.fq = FieldCtx.get(Fq)
        self.fr = FieldCtx.get(Fr)
        self.qq = QuadCtx.get(Fq)
        sbits = E.scalar_bits

        r1cs = params.r1cs
        pk = params.pk
        n = r1cs.domain
        m = r1cs.num_wires
        assert n % d == 0, "NTT domain must divide across the mesh axis"

        # ---- sharded CRS residency -------------------------------------
        # ONE padded size for every query (power of two >= d): identity
        # rows/zero scalars are cheap, while each distinct size would
        # compile its own sharded Pippenger graph (XLA-CPU compiles of
        # the limb-arithmetic body run minutes on the virtual test mesh)
        self.m_pad = max(pad_msm_size(m), pad_msm_size(r1cs.num_aux),
                         n, d)
        self.aux_pad = self.m_pad

        def shard(coords):
            sh = NamedSharding(
                mesh, P(axis, *([None] * (coords[0].ndim - 1))))
            return tuple(jax.device_put(c, sh) for c in coords)

        from .params import G1Rows

        def as_pts(q):
            return q.to_points() if isinstance(q, G1Rows) else list(q)

        pad_w = [None] * (self.m_pad - m)
        pad_a = [None] * (self.aux_pad - r1cs.num_aux)
        self.a_g1 = shard(encode_points_g1(self.fq, as_pts(pk.a_g1) + pad_w))
        self.b_g1 = shard(encode_points_g1(self.fq, as_pts(pk.b_g1) + pad_w))
        self.l_g1 = shard(encode_points_g1(self.fq, as_pts(pk.l_g1) + pad_a))
        self.b_g2 = shard(encode_points_g2(self.qq, as_pts(pk.b_g2) + pad_w))

        # H query: bit-reversed order so h coefficients feed the MSM with
        # no permutation (same convention as DeviceProver)
        rev = bitrev_permutation(n)
        h_nat = as_pts(pk.h_g1) + [None] * (n - len(pk.h_g1))
        h_br = [h_nat[rev[i]] for i in range(n)]
        self.h_g1 = shard(encode_points_g1(
            self.fq, h_br + [None] * (self.m_pad - n)))

        # ---- distributed kernels (one G1 + one G2 graph) ---------------
        self.msm_w = DistMSM(self.fq, self.m_pad, mesh, axis=axis)
        self.msm_g2 = DistMSM(self.qq, self.m_pad, mesh, axis=axis)
        self._msm_run = self.msm_w.make()
        self._msm_aux_run = self._msm_run
        self._msm_h_run = self._msm_run
        self._msm_g2_run = self.msm_g2.make()
        self.sbits = sbits

        # Overlap the two pathological XLA-CPU compiles (G1 + G2 sharded
        # Pippenger SPMD programs) on cold runs: kick the G2 graph's
        # compile off on a daemon thread now; msms() joins before its B2
        # stage. With a warm persistent cache both are instant loads.
        import threading

        def _prewarm_g2():
            try:
                sh = NamedSharding(self.mesh, P(self.axis, None))
                zs = jax.device_put(
                    jnp.zeros((self.m_pad, self.fq.k), dtype=jnp.uint32),
                    sh)
                with self.mesh:
                    jax.block_until_ready(self._msm_g2_run(self.b_g2, zs))
            except Exception:
                pass

        self._g2_warm = threading.Thread(target=_prewarm_g2, daemon=True)
        self._g2_warm.start()

        self.spmv_a = SpMV(self.fr, r1cs.a_rows, r1cs.a_cols, r1cs.a_vals,
                           n, m)
        self.spmv_b = SpMV(self.fr, r1cs.b_rows, r1cs.b_cols, r1cs.b_vals,
                           n, m)
        self.spmv_c = SpMV(self.fr, r1cs.c_rows, r1cs.c_cols, r1cs.c_vals,
                           n, m)

        self.dist_ntt = DistNTT(self.fr, n, mesh, axis=axis)
        self._ntt_fn, self._intt_fn = self.dist_ntt.make()

        ntt = NTTCtx.get(self.fr, n)
        g = Fr.generator
        p = Fr.p
        dom_sh = NamedSharding(mesh, P(axis, None))
        self.gp = jax.device_put(jnp.asarray(ntt.shift_pows_br(g)), dom_sh)
        self.ginvp = jax.device_put(
            jnp.asarray(ntt.shift_pows_br(pow(g, -1, p))), dom_sh)
        zinv = pow(pow(g, n, p) - 1, -1, p)
        self.zinv = jax.device_put(
            jnp.broadcast_to(self.fr.const(zinv), (n, self.fr.k)), dom_sh)
        self._jit_h = None

    # ---- QAP h(x) -------------------------------------------------------
    def h_scalars_br(self, z_mont) -> jnp.ndarray:
        """Witness z (num_wires, K) Montgomery -> h coefficients, canonical
        limbs, bit-reversed, (N, K), domain-sharded over the mesh axis."""
        fr = self.fr
        ntt_fn, intt_fn = self._ntt_fn, self._intt_fn

        def pipeline(z):
            az = self.spmv_a.apply(z)
            bz = self.spmv_b.apply(z)
            cz = self.spmv_c.apply(z)

            def coset(x):
                return ntt_fn(fr.mont_mul(intt_fn(x), self.gp))

            ea, eb, ec = coset(az), coset(bz), coset(cz)
            h_ev = fr.mont_mul(fr.sub(fr.mont_mul(ea, eb), ec), self.zinv)
            h_br = fr.mont_mul(intt_fn(h_ev), self.ginvp)
            return fr.from_mont(h_br)

        if self._jit_h is None:
            self._jit_h = jax.jit(pipeline)
        with self.mesh:
            return self._jit_h(z_mont)

    # ---- MSMs -----------------------------------------------------------
    def msms(self, z, aux, h_br, timer=None):
        """z, aux: host canonical int lists; h_br: (N, K) canonical device
        limbs (domain-sharded). Returns (a, b1, b2, l, h) host affine."""
        from ...ops.curve import decode_point_g1, decode_point_g2
        from ...utils.profiling import StageTimer

        tm = timer if timer is not None else StageTimer(publish=False)
        k = self.fq.k
        ax = self.axis

        def sh_sc(sc):
            return jax.device_put(
                sc, NamedSharding(self.mesh, P(ax, None)))

        z_sc = sh_sc(encode_scalars(z, self.m_pad, k))
        aux_sc = sh_sc(encode_scalars(aux, self.aux_pad, k))
        if h_br.shape[0] < self.m_pad:
            h_br = jnp.pad(
                h_br, ((0, self.m_pad - h_br.shape[0]), (0, 0)))
        h_br = jax.device_put(
            h_br, NamedSharding(self.mesh, P(ax, None)))
        with self.mesh:
            with tm.stage("msm_a"):
                a = decode_point_g1(self.fq, self._msm_run(self.a_g1, z_sc))
            with tm.stage("msm_b1"):
                b1 = decode_point_g1(self.fq, self._msm_run(self.b_g1, z_sc))
            with tm.stage("msm_b2"):
                if self._g2_warm.is_alive():
                    self._g2_warm.join()
                b2 = decode_point_g2(
                    self.qq, self._msm_g2_run(self.b_g2, z_sc),
                    group=self.E.g)
            with tm.stage("msm_l"):
                l = decode_point_g1(
                    self.fq, self._msm_aux_run(self.l_g1, aux_sc))
            with tm.stage("msm_h"):
                h = decode_point_g1(
                    self.fq, self._msm_h_run(self.h_g1, h_br))
        return a, b1, b2, l, h
