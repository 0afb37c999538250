"""Device CRS generation (setup(device=True) -> G1Rows/G2Rows queries)
vs the host per-point setup — the analog of bellman's
generate_random_parameters (reference backend/bellman_groth16/setup.rs:20)
moved onto the fixed-base kernels (ops/fixed_base.py)."""

import os

import numpy as np
import pytest

from fawkes_crypto_tpu.backend.groth16.params import G1Rows, G2Rows
from fawkes_crypto_tpu.engines.bn256 import Fq
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.native.bn_pairing import Fq2, G1_GEN, G2_GEN, g_mul

from conftest import heavy_test


def test_g1_rows_roundtrip():
    """Row containers decode back to the host points they encode."""
    from fawkes_crypto_tpu.ops.msm_wave import (
        encode_points_affine_rows,
        encode_points_affine_rows_g2,
    )

    fctx = FieldCtx.get(Fq)
    pts = [None, G1_GEN, g_mul(G1_GEN, 7), None, g_mul(G1_GEN, 12345)]
    rows = G1Rows(np.asarray(encode_points_affine_rows(fctx, pts)), Fq)
    assert len(rows) == 5
    assert rows.to_points() == pts

    q_pts = [None, G2_GEN, g_mul(G2_GEN, 9)]
    qrows = G2Rows(
        np.asarray(encode_points_affine_rows_g2(fctx, q_pts)), Fq,
        quad_cls=Fq2)
    assert qrows.to_points() == q_pts


@heavy_test
def test_device_setup_matches_host():
    """setup(device=True) must be bit-identical to the host setup under a
    fixed seed, and the resulting Parameters must prove + verify.
    (Interpret-mode Pallas on CPU: tiny circuit only.)"""
    from fawkes_crypto_tpu.backend.groth16.prover import prove
    from fawkes_crypto_tpu.backend.groth16.setup import setup
    from fawkes_crypto_tpu.backend.groth16.verifier import verify
    from fawkes_crypto_tpu.circuit.num import CNum
    from fawkes_crypto_tpu.engines.bn256 import Fr
    from fawkes_crypto_tpu.ff.hostfield import Num

    def circuit(pub, sec):
        a, b = sec
        (a * b + a).assert_eq(pub)

    def alloc_pub(cs, v):
        return CNum.alloc(cs, v)

    def alloc_sec(cs, v):
        if v is None:
            return tuple(CNum.alloc(cs, None) for _ in range(2))
        return tuple(CNum.alloc(cs, x) for x in v)

    ph = setup(circuit, alloc_pub, alloc_sec, seed=b"ds", device=False)
    pd = setup(circuit, alloc_pub, alloc_sec, seed=b"ds", device=True)

    assert isinstance(pd.pk.a_g1, G1Rows)
    assert isinstance(pd.pk.b_g2, G2Rows)
    for name in ("a_g1", "b_g1", "l_g1", "h_g1", "b_g2"):
        assert getattr(pd.pk, name).to_points() == getattr(ph.pk, name), name
    assert pd.vk.ic == ph.vk.ic

    a, b = Num(Fr, 3), Num(Fr, 5)
    pub = a * b + a
    inputs, proof = prove(pd, pub, (a, b), circuit, alloc_pub, alloc_sec,
                          seed=b"p", device_msm=False)
    assert verify(pd.vk, proof, inputs)
    inputs_h, proof_h = prove(ph, pub, (a, b), circuit, alloc_pub,
                              alloc_sec, seed=b"p", device_msm=False)
    assert (proof.a, proof.b, proof.c) == (proof_h.a, proof_h.b, proof_h.c)
