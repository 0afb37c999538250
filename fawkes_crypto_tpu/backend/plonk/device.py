"""Device (TPU/XLA) pipeline for the PLONK prover's heavy polynomial math.

Replaces the host NTTs and the per-element quotient loop of
backend/plonk/prover.py (the analog of halo2's create_proof internals,
/root/reference/fawkes-crypto/src/backend/plonk/prover.rs:43-104) with
batched device work:

  * round-1/2 interpolations: device size-n iNTTs,
  * round-3: ONE jitted kernel — 5 coset NTTs of size m = 8n (wires, z,
    z(omega x), PI) over static device-resident selector/sigma/L1/x
    tables, the full gate+permutation+Lagrange combine, zh division and
    the closing coset interpolation.

Everything stays in the m-domain's bit-reversed order between the NTTs
(elementwise math is order-agnostic); z(omega x) is produced by scaling
z's coefficients with omega^i BEFORE the coset NTT, so no rotation of
bit-reversed data is ever needed.

Static per-ProvingKey tables are built once on first use and cached on
the pk object; per-proof device work is ~6 NTTs + ~20 elementwise
Montgomery muls of length m.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ...engines.bn256 import Fr
from ...ff.jfield import FieldCtx
from ...ops.ntt import NTTCtx, bitrev_permutation
from .poly import root_of_unity
from .setup import K1, K2


class PlonkDevice:
    """Per-(ProvingKey) device state for the PLONK prover."""

    def __init__(self, pk):
        self.pk = pk
        n = pk.n
        m = 8 * n
        self.n = n
        self.m = m
        p = Fr.p
        self.p = p
        self.fctx = FieldCtx.get(Fr)
        self.ntt_n = NTTCtx.get(self.fctx, n)
        self.ntt_m = NTTCtx.get(self.fctx, m)
        self.rev_n = bitrev_permutation(n)
        self.rev_m = bitrev_permutation(m)
        f = self.fctx

        shift = Fr.generator
        omega = pk.omega

        # coset scaling tables (natural coefficient order)
        self.shift_pows = jnp.asarray(self.ntt_m._pow_table(shift, m))
        self.shiftinv_pows = jnp.asarray(
            self.ntt_m._pow_table(pow(shift, -1, p), m))
        self.omega_pows = jnp.asarray(self.ntt_m._pow_table(omega, m))

        # static m-domain tables, bit-reversed eval order
        wm = root_of_unity(Fr, m)
        xs = [0] * m
        acc = shift % p
        for i in range(m):
            xs[i] = acc
            acc = acc * wm % p
        rot = m // n
        gn = pow(shift, n, p)
        zh = [(gn * pow(pow(wm, i, p), n, p) - 1) % p for i in range(rot)]
        zh_inv_c = _batch_inv(zh, p)
        zh_inv = [zh_inv_c[i % rot] for i in range(m)]

        def enc_br_m(vals: List[int]) -> jnp.ndarray:
            a = np.asarray(f.encode(vals))
            return jnp.asarray(a[self.rev_m])

        self.xse = enc_br_m(xs)
        self.k1_xse = enc_br_m([K1 * x % p for x in xs])
        self.k2_xse = enc_br_m([K2 * x % p for x in xs])
        self.zh_inv = enc_br_m(zh_inv)
        self.one = jnp.broadcast_to(f.const(1), (m, f.k))

        # selector / sigma / L1 coset evals (static): ext() on device
        def ext_static(coeffs: List[int]) -> jnp.ndarray:
            return self._ext(jnp.asarray(f.encode(
                list(coeffs) + [0] * (m - len(coeffs)))))

        from .poly import intt as host_intt
        from .prover import _q_coeffs

        self.QL, self.QR, self.QO, self.QM, self.QC = (
            ext_static(c) for c in _q_coeffs(pk))
        self.S1, self.S2, self.S3 = (ext_static(c) for c in pk.s_coeffs)
        l1 = [0] * n
        l1[0] = 1
        self.L1 = ext_static(host_intt(l1, omega, p))
        self._jit_round3 = None
        self._jit_intt_n = None

    # ---- helpers ---------------------------------------------------------
    def _ext(self, coeffs_mont):
        """(m, K) natural-order Montgomery coeffs -> coset evals, m-domain
        bit-reversed order (coset_eval analog, backend/plonk/poly.py)."""
        f = self.fctx
        return self.ntt_m.ntt(f.mont_mul(coeffs_mont, self.shift_pows))

    def _enc_poly(self, coeffs: List[int], size: int) -> jnp.ndarray:
        return jnp.asarray(self.fctx.encode(
            list(coeffs) + [0] * (size - len(coeffs))))

    def intt_n(self, evals: List[int]) -> List[int]:
        """Size-n interpolation on device: natural evals -> natural coeffs
        (rounds 1-2: wire and grand-product polynomials)."""
        f = self.fctx
        if self._jit_intt_n is None:
            self._jit_intt_n = jax.jit(
                lambda v: f.from_mont(self.ntt_n.evals_to_coeffs_br(v)))
        x = self._enc_poly(evals, self.n)
        cbr = self._jit_intt_n(x)
        host = f.decode(np.asarray(jax.device_get(cbr)), mont=False)
        out = [0] * self.n
        for i in range(self.n):
            out[int(self.rev_n[i])] = host[i]
        return out

    # ---- round 3 ---------------------------------------------------------
    def quotient(self, wire_coeffs, z_coeffs, pub_vals, beta, gamma,
                 alpha) -> List[int]:
        """t(X) coefficients (natural order, length m) — the whole round-3
        computation of prover.py on device."""
        f = self.fctx
        p = self.p
        m, n = self.m, self.n

        pi_vec = [0] * n
        for i, x in enumerate(pub_vals):
            pi_vec[i] = (-x) % p

        a_c = self._enc_poly(wire_coeffs[0], m)
        b_c = self._enc_poly(wire_coeffs[1], m)
        c_c = self._enc_poly(wire_coeffs[2], m)
        z_c = self._enc_poly(z_coeffs, m)
        pi_c = self._enc_poly(pi_vec, m)
        be = jnp.broadcast_to(f.const(beta % p), (m, f.k))
        ga = jnp.broadcast_to(f.const(gamma % p), (m, f.k))
        al = jnp.broadcast_to(f.const(alpha % p), (m, f.k))

        if self._jit_round3 is None:
            def round3(a_c, b_c, c_c, z_c, pi_c, be, ga, al):
                A = self._ext(a_c)
                B = self._ext(b_c)
                C = self._ext(c_c)
                Z = self._ext(z_c)
                # z(omega x): scale coeffs by omega^i, then the same ext
                Zw = self._ext(f.mont_mul(z_c, self.omega_pows))
                PI = self._ext(pi_c)

                gate = f.add(
                    f.add(f.mont_mul(self.QM, f.mont_mul(A, B)),
                          f.add(f.mont_mul(self.QL, A),
                                f.mont_mul(self.QR, B))),
                    f.add(f.mont_mul(self.QO, C), f.add(self.QC, PI)))

                def trip(t1, t2, t3):
                    return f.mont_mul(f.mont_mul(t1, t2), t3)

                prod_id = trip(
                    f.add(A, f.add(f.mont_mul(be, self.xse), ga)),
                    f.add(B, f.add(f.mont_mul(be, self.k1_xse), ga)),
                    f.add(C, f.add(f.mont_mul(be, self.k2_xse), ga)))
                prod_sg = trip(
                    f.add(A, f.add(f.mont_mul(be, self.S1), ga)),
                    f.add(B, f.add(f.mont_mul(be, self.S2), ga)),
                    f.add(C, f.add(f.mont_mul(be, self.S3), ga)))
                perm = f.sub(f.mont_mul(prod_id, Z),
                             f.mont_mul(prod_sg, Zw))
                lag = f.mont_mul(f.sub(Z, self.one), self.L1)
                num = f.add(gate,
                            f.add(f.mont_mul(al, perm),
                                  f.mont_mul(f.mont_mul(al, al), lag)))
                t_ev = f.mont_mul(num, self.zh_inv)
                # coset interpolation: evals br -> natural coeffs,
                # unscale by shift^-i, leave Montgomery
                t_c = f.mont_mul(self.ntt_m.intt(t_ev),
                                 self.shiftinv_pows)
                return f.from_mont(t_c)

            self._jit_round3 = jax.jit(round3)

        out = self._jit_round3(a_c, b_c, c_c, z_c, pi_c, be, ga, al)
        return self.fctx.decode(np.asarray(jax.device_get(out)),
                                mont=False)


def _batch_inv(vals: List[int], p: int) -> List[int]:
    pref = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        pref[i + 1] = pref[i] * v % p
    inv = pow(pref[-1], -1, p)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = pref[i] * inv % p
        inv = inv * vals[i] % p
    return out
