"""Device-resident proving-key queries + TPU MSM/NTT prover pipeline.

This is where the Groth16 hot path (SURVEY.md §3.2 hot loops #3/#4 — QAP
h(x) + the A/B/C MSMs of bellman's create_random_proof, invoked from
/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:80)
actually runs on TPU. The CRS queries are encoded once per Parameters
object and stay resident in HBM; each proof then costs 3 NTT pipelines +
5 MSMs on device and only single-point host arithmetic afterwards.

H-query layout: ops/ntt.py transforms produce coefficients in bit-reversed
order, so the H points are stored bit-reversed too and the h scalars never
get permuted at prove time (zero-gather design; the reference's bellman
equivalent does an explicit bit-reversal pass per FFT).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ff.jfield import FieldCtx
from ...ff.jquad import QuadCtx
from ...ops.curve import encode_points_g2
from ...ops.msm import MSMCtx, encode_scalars, pad_msm_size
from ...ops.lntt import LNTTCtx, from_lf, to_lf
from ...ops.msm_wave import (
    MSMWave,
    encode_points_affine_rows,
    encode_points_affine_rows_g2,
)
from ...ops.ntt import NTTCtx, bitrev_permutation
from ...ops.spmv import SpMV


class DeviceProver:
    """Per-Parameters device state: encoded queries + compiled kernels.

    `batch` > 1 compiles the dp prove_many pipeline: the five MSMs run
    as batched wave schedules (B proofs' windows in one accumulation,
    ops/msm_wave.py `batch`) and the h pipeline vmaps over proofs."""

    def __init__(self, params, batch: int = 1):
        self.params = params
        self.batch = batch
        E = params.E
        self.E = E
        Fq, Fr = E.fq, E.fr
        self.fq = FieldCtx.get(Fq)
        self.fr = FieldCtx.get(Fr)
        self.qq = QuadCtx.get(Fq)
        # engine threading (round-2 ADVICE high): every device MSM uses the
        # engine's scalar width and host group module, so BLS12-381 circuits
        # on the device path stay on their own curve
        sbits = E.scalar_bits
        grp = E.g
        r1cs = params.r1cs
        pk = params.pk
        n = r1cs.domain
        m = r1cs.num_wires

        self.m_pad = pad_msm_size(m)
        pad_w = [None] * (self.m_pad - m)

        # Pallas wave MSM needs a real TPU (Mosaic); the XLA MSM covers the
        # virtual-CPU test mesh.
        self.use_wave = jax.default_backend() == "tpu"
        from .params import G1Rows

        def enc_rows(q, size, g2=False):
            """Query -> padded (size, 2K|4K) device rows. G1Rows/G2Rows
            (device-generated CRS, setup.py _device_queries) upload
            directly — they already ARE the wave-table format."""
            if isinstance(q, G1Rows):
                r = q.rows
                return jnp.asarray(np.pad(
                    r, ((0, size - r.shape[0]), (0, 0))))
            enc = (encode_points_affine_rows_g2 if g2
                   else encode_points_affine_rows)
            return enc(self.fq, list(q) + [None] * (size - len(q)))

        def as_pts(q):
            return q.to_points() if isinstance(q, G1Rows) else q

        rev = bitrev_permutation(n)
        if isinstance(pk.h_g1, G1Rows):
            hr = pk.h_g1.rows
            if hr.shape[0] < n:
                hr = np.pad(hr, ((0, n - hr.shape[0]), (0, 0)))
            h_br_pts = G1Rows(hr[rev], pk.h_g1.fld)
        else:
            h_nat = pk.h_g1 + [None] * (n - len(pk.h_g1))
            h_br_pts = [h_nat[rev[i]] for i in range(n)]
        if self.use_wave:
            # Wave sizes round up to a power of two (identity rows, zero
            # scalars) so the expensive Mosaic kernel compiles are shared
            # across circuits — the compile cache keys on shapes. Above
            # 2^18, pow2 padding could nearly double the MSM (a 4.2M-wire
            # rollup would pad to 2^23), so round to 2^16 multiples
            # instead and let the persistent compile cache absorb the
            # larger shape space.
            def wpad(size):
                if size <= (1 << 18):
                    return max(1 << (size - 1).bit_length(), 1024)
                return -(-size // (1 << 16)) * (1 << 16)

            self.m_wave = wpad(m)
            self.aux_wave = wpad(r1cs.num_aux)
            # G1 queries: affine row tables for the Pallas wave MSM
            self.a_g1 = enc_rows(pk.a_g1, self.m_wave)
            self.b_g1 = enc_rows(pk.b_g1, self.m_wave)
            self.l_g1 = enc_rows(pk.l_g1, self.aux_wave)
            self.h_g1 = enc_rows(h_br_pts, wpad(n))

            def wave(size, **kw):
                kw.setdefault("scalar_bits", sbits)
                kw.setdefault("group", grp)
                kw.setdefault("batch", batch)
                if size >= (1 << 18):
                    # packed-gather limbs-first schedule: 2.7x the
                    # row-gather wave at 2^22 (scripts/scan_wave2lf.py);
                    # G2 chip-validated vs the host Pippenger
                    # (scripts/exp_g2wave2.py)
                    from ...ops.msm_wave2 import MSMWave2

                    return MSMWave2(self.fq, size, c=12, v=8, **kw)
                return MSMWave(self.fq, size, **kw)

            self.n_wave = wpad(n)
            self.msm_w_g1 = wave(self.m_wave)
            self.msm_aux = (self.msm_w_g1 if self.aux_wave == self.m_wave
                            else wave(self.aux_wave))
            self.msm_h = (self.msm_w_g1 if self.n_wave == self.m_wave
                          else wave(self.n_wave))
        else:
            from ...ops.curve import encode_points_g1

            self.aux_pad = pad_msm_size(r1cs.num_aux)
            pad_a = [None] * (self.aux_pad - r1cs.num_aux)
            self.a_g1 = encode_points_g1(self.fq, as_pts(pk.a_g1) + pad_w)
            self.b_g1 = encode_points_g1(self.fq, as_pts(pk.b_g1) + pad_w)
            self.l_g1 = encode_points_g1(self.fq, as_pts(pk.l_g1) + pad_a)
            self.h_g1 = encode_points_g1(self.fq, as_pts(h_br_pts))
            self.msm_w_g1 = MSMCtx(self.fq, self.m_pad, scalar_bits=sbits)
            self.msm_aux = (self.msm_w_g1 if self.aux_pad == self.m_pad
                            else MSMCtx(self.fq, self.aux_pad,
                                        scalar_bits=sbits))
            self.msm_h = (self.msm_w_g1 if n == self.m_pad
                          else MSMCtx(self.fq, n, scalar_bits=sbits))

        # G2 B-query (the single most expensive MSM of the proof,
        # VERDICT round-1 item #1): on TPU it rides the same wave
        # schedule as G1 over the Pallas Fq2 kernels (ff/pquad.py).
        # Off-TPU, the C++ host Pippenger beats the XLA device MSM by
        # ~17x; keep XLA as last-resort when the toolchain is absent.
        self.g2_host = (not self.use_wave) and E.cext_ok
        if self.use_wave:
            self.b_g2 = enc_rows(pk.b_g2, self.m_wave, g2=True)
            self.msm_w_g2 = wave(self.m_wave, g2=True)
        elif self.g2_host:
            self.b_g2_pts = as_pts(pk.b_g2)
            self.b_g2 = None
            self.msm_w_g2 = None
        else:
            self.b_g2 = encode_points_g2(self.qq, as_pts(pk.b_g2) + pad_w)
            self.msm_w_g2 = MSMCtx(self.qq, self.m_pad, scalar_bits=sbits)

        # az/bz/cz sparse products (rows padded straight into the domain)
        self.spmv_a = SpMV(self.fr, r1cs.a_rows, r1cs.a_cols, r1cs.a_vals,
                           n, m)
        self.spmv_b = SpMV(self.fr, r1cs.b_rows, r1cs.b_cols, r1cs.b_vals,
                           n, m)
        self.spmv_c = SpMV(self.fr, r1cs.c_rows, r1cs.c_cols, r1cs.c_vals,
                           n, m)

        # h-polynomial NTT pipeline constants. On TPU: limbs-first Pallas
        # NTT (ops/lntt.py). Off-TPU (the virtual-CPU test mesh) the
        # interpret-mode Pallas compile is minutes-slow, so the XLA NTT
        # (batch-last NTTCtx) serves the same pipeline instead.
        self.ntt = NTTCtx.get(self.fr, n)
        g = Fr.generator
        p = Fr.p
        gp = self.ntt.shift_pows_br(g)
        ginvp = self.ntt.shift_pows_br(pow(g, -1, p))
        zinv = pow(pow(g, n, p) - 1, -1, p)
        if self.use_wave:
            self.lntt = LNTTCtx.get(self.fr, n)
            self.gp_lf = to_lf(gp)
            self.ginvp_lf = to_lf(ginvp)
            self.zinv_k = self.fr.const(zinv)  # (K,), broadcast in-graph
            # every large array is passed as a jit ARGUMENT, not captured:
            # the axon remote compiler ships captured constants inside the
            # HLO payload (GBs at rollup scale -> broken pipe)
            self._tables = {
                "a": self.spmv_a.arrays,
                "b": self.spmv_b.arrays,
                "c": self.spmv_c.arrays,
                "w": self.lntt.w_pows,
                "winv": self.lntt.winv_pows,
                "gp": self.gp_lf,
                "ginvp": self.ginvp_lf,
            }
        else:
            self.gp_xla = gp
            self.ginvp_xla = ginvp
            self.zinv_xla = jnp.broadcast_to(
                self.fr.const(zinv), (n, self.fr.k))

    @property
    def _shared_sched(self) -> bool:
        """A/B1/B2 can share one schedule iff all three wave contexts
        have identical schedule geometry (MSMWave2 only). Opt-in via
        FAWKES_MSM_SHARED_SCHED=1 until chip-validated
        (scripts/check_sched_share.py)."""
        import os

        from ...ops.msm_wave2 import MSMWave2

        if os.environ.get("FAWKES_MSM_SHARED_SCHED", "") in ("", "0"):
            return False
        return (isinstance(self.msm_w_g1, MSMWave2)
                and isinstance(self.msm_w_g2, MSMWave2)
                and (self.msm_w_g1.n, self.msm_w_g1.c, self.msm_w_g1.v,
                     self.msm_w_g1.w, self.msm_w_g1.b)
                == (self.msm_w_g2.n, self.msm_w_g2.c, self.msm_w_g2.v,
                    self.msm_w_g2.w, self.msm_w_g2.b))

    # ---- QAP h(x) ----------------------------------------------------------
    def h_scalars_br(self, z_mont) -> jnp.ndarray:
        """Witness z (num_wires, K) Montgomery on device -> h coefficients as
        canonical limbs in bit-reversed order, (N, K). Entirely on device:
        sparse matvecs, iNTT/coset/NTT pipeline, pointwise combine — the
        limbs-first Pallas kernels on TPU, the XLA NTT elsewhere."""
        if self.use_wave:
            lntt = self.lntt

            def pipeline(z, t):
                az = self.spmv_a.apply_arrays(z, t["a"])
                bz = self.spmv_b.apply_arrays(z, t["b"])
                cz = self.spmv_c.apply_arrays(z, t["c"])

                def e2c_br(x):
                    return lntt._scale(lntt._fwd(x, t["winv"]),
                                       lntt.n_inv)

                def coset(x):
                    cbr = e2c_br(to_lf(x))
                    return lntt._bwd(lntt.mul(cbr, t["gp"]), t["w"])

                ea, eb, ec = coset(az), coset(bz), coset(cz)
                zinv_lf = jnp.broadcast_to(
                    self.zinv_k[:, None], (self.fr.k, ea.shape[1]))
                h_ev = lntt.mul(lntt.sub(lntt.mul(ea, eb), ec), zinv_lf)
                h_br = lntt.mul(e2c_br(h_ev), t["ginvp"])
                # canonical limbs, MSM-ready
                return from_lf(lntt.from_mont(h_br))
        else:
            ntt, fr = self.ntt, self.fr

            def pipeline(z):
                az = self.spmv_a.apply(z)
                bz = self.spmv_b.apply(z)
                cz = self.spmv_c.apply(z)

                def coset(x):
                    cbr = ntt.evals_to_coeffs_br(x)
                    return ntt.coeffs_br_to_evals(
                        fr.mont_mul(cbr, self.gp_xla))

                ea, eb, ec = coset(az), coset(bz), coset(cz)
                h_ev = fr.mont_mul(
                    fr.sub(fr.mont_mul(ea, eb), ec), self.zinv_xla)
                h_br = fr.mont_mul(ntt.evals_to_coeffs_br(h_ev),
                                   self.ginvp_xla)
                return fr.from_mont(h_br)

        if not hasattr(self, "_jit_pipeline"):
            if self.use_wave:
                if self.batch > 1:
                    # batch mode: z (B, m, K) -> (B, N, K); lax.map keeps
                    # one compiled pipeline (the MSMs, not h, dominate)
                    self._jit_pipeline = jax.jit(
                        lambda zb, t: jax.lax.map(
                            lambda z: pipeline(z, t), zb))
                else:
                    self._jit_pipeline = jax.jit(pipeline)
            elif self.batch > 1:
                self._jit_pipeline = jax.jit(
                    lambda zb: jax.lax.map(pipeline, zb))
            else:
                self._jit_pipeline = jax.jit(pipeline)
        if self.use_wave:
            return self._jit_pipeline(z_mont, self._tables)
        return self._jit_pipeline(z_mont)

    # ---- MSMs ---------------------------------------------------------------
    def msms(self, z, aux, h_br, timer=None):
        """z, aux: host int lists (canonical); h_br: (N, K) canonical device
        limbs. Returns (a, b1, b2, l, h) as host affine points. `timer`
        (utils.profiling.StageTimer) records a per-MSM breakdown."""
        from ...native import cext
        from ...ops.curve import decode_point_g1, decode_point_g2
        from ...utils.profiling import StageTimer

        tm = timer if timer is not None else StageTimer(publish=False)
        k = self.fq.k
        if self.use_wave:
            assert self.batch == 1, "batched context: use msms_batch"
            z_sc = encode_scalars(z, self.m_wave, k)
            aux_sc = encode_scalars(aux, self.aux_wave, k)
            if h_br.shape[0] < self.n_wave:
                h_br = jnp.pad(
                    h_br, ((0, self.n_wave - h_br.shape[0]), (0, 0)))
            shared = self._shared_sched
            if shared:
                # A/B1/B2 share the z scalars: ONE digit sort serves all
                # three accumulations (ROADMAP perf item 3); the G2 wave
                # context consumes the same schedule arrays.
                with tm.stage("msm_sched"):
                    sched = self.msm_w_g1.schedule(z_sc)
                with tm.stage("msm_a"):
                    a = self.msm_w_g1.msm_sched(self.a_g1, sched)
                with tm.stage("msm_b1"):
                    b1 = self.msm_w_g1.msm_sched(self.b_g1, sched)
                with tm.stage("msm_b2"):
                    b2 = self.msm_w_g2.msm_sched(self.b_g2, sched)
            else:
                with tm.stage("msm_a"):
                    a = self.msm_w_g1.msm(self.a_g1, z_sc)
                with tm.stage("msm_b1"):
                    b1 = self.msm_w_g1.msm(self.b_g1, z_sc)
                with tm.stage("msm_b2"):
                    b2 = self.msm_w_g2.msm(self.b_g2, z_sc)
            with tm.stage("msm_l"):
                l = self.msm_aux.msm(self.l_g1, aux_sc)
            with tm.stage("msm_h"):
                h = self.msm_h.msm(self.h_g1, h_br)
            return a, b1, b2, l, h
        z_sc_pad = encode_scalars(z, self.m_pad, k)
        with tm.stage("msm_b2"):
            if self.g2_host:
                if isinstance(z, np.ndarray):  # native-witness limb rows
                    from ...ff.limbs import limbs_to_ints

                    z = limbs_to_ints(z)
                b2 = cext.g2_msm(self.b_g2_pts, z)
            else:
                b2 = decode_point_g2(
                    self.qq, self.msm_w_g2.jit_msm(self.b_g2, z_sc_pad),
                    group=self.E.g,
                )
        aux_sc = encode_scalars(aux, self.aux_pad, k)
        with tm.stage("msm_a"):
            a = decode_point_g1(
                self.fq, self.msm_w_g1.jit_msm(self.a_g1, z_sc_pad))
        with tm.stage("msm_b1"):
            b1 = decode_point_g1(
                self.fq, self.msm_w_g1.jit_msm(self.b_g1, z_sc_pad))
        with tm.stage("msm_l"):
            l = decode_point_g1(
                self.fq, self.msm_aux.jit_msm(self.l_g1, aux_sc))
        with tm.stage("msm_h"):
            h = decode_point_g1(
                self.fq, self.msm_h.jit_msm(self.h_g1, h_br))
        return a, b1, b2, l, h

    def msms_batch(self, z_list, aux_list, h_br, timer=None):
        """Batched (dp) MSMs for B proofs sharing this CRS. z_list /
        aux_list: B host int lists; h_br: (B, N, K) canonical limbs.
        Returns a list of B (a, b1, b2, l, h) tuples. On the wave path
        all B proofs ride ONE schedule per query (ops/msm_wave.py
        msm_batch); off-TPU falls back to a per-proof loop."""
        from ...utils.profiling import StageTimer

        tm = timer if timer is not None else StageTimer(publish=False)
        B = len(z_list)
        assert self.batch in (1, B)
        if not (self.use_wave and self.batch == B):
            return [
                self.msms(z, aux, h_br[i], timer=tm)
                for i, (z, aux) in enumerate(zip(z_list, aux_list))
            ]
        k = self.fq.k
        z_sc = jnp.stack(
            [encode_scalars(z, self.m_wave, k) for z in z_list])
        aux_sc = jnp.stack(
            [encode_scalars(a, self.aux_wave, k) for a in aux_list])
        if h_br.shape[1] < self.n_wave:
            h_br = jnp.pad(
                h_br, ((0, 0), (0, self.n_wave - h_br.shape[1]), (0, 0)))
        if self._shared_sched:
            with tm.stage("msm_sched"):
                sched = self.msm_w_g1.schedule(z_sc)
            with tm.stage("msm_a"):
                a = self.msm_w_g1.msm_batch_sched(self.a_g1, sched)
            with tm.stage("msm_b1"):
                b1 = self.msm_w_g1.msm_batch_sched(self.b_g1, sched)
            with tm.stage("msm_b2"):
                b2 = self.msm_w_g2.msm_batch_sched(self.b_g2, sched)
        else:
            with tm.stage("msm_a"):
                a = self.msm_w_g1.msm_batch(self.a_g1, z_sc)
            with tm.stage("msm_b1"):
                b1 = self.msm_w_g1.msm_batch(self.b_g1, z_sc)
            with tm.stage("msm_b2"):
                b2 = self.msm_w_g2.msm_batch(self.b_g2, z_sc)
        with tm.stage("msm_l"):
            l = self.msm_aux.msm_batch(self.l_g1, aux_sc)
        with tm.stage("msm_h"):
            h = self.msm_h.msm_batch(self.h_g1, h_br)
        return list(zip(a, b1, b2, l, h))
