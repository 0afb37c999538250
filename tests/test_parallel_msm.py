"""Mesh-sharded MSM vs host oracle on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fawkes_crypto_tpu.engines.bn256 import Fq, Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.native.bn_pairing import G1_GEN, g_add, g_mul
from fawkes_crypto_tpu.ops.curve import decode_point_g1, encode_points_g1
from fawkes_crypto_tpu.ops.msm import encode_scalars
from fawkes_crypto_tpu.parallel.msm import DistMSM


def test_dist_msm_g1_matches_host():
    import random

    random.seed(11)
    fctx = FieldCtx.get(Fq)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    n = 64
    pts = [g_mul(G1_GEN, random.randrange(1, 1 << 62)) for _ in range(n)]
    scalars = [random.randrange(Fr.p) for _ in range(n)]

    dev_pts = encode_points_g1(fctx, pts)
    dev_sc = encode_scalars(scalars, n, fctx.k)
    dist = DistMSM(fctx, n, mesh, axis="sp")
    run = dist.make()
    with mesh:
        got = jax.jit(run)(dev_pts, dev_sc)
    want = None
    for p, s in zip(pts, scalars):
        want = g_add(want, g_mul(p, s))
    assert decode_point_g1(fctx, got) == want
