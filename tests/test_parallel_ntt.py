"""Domain-sharded NTT vs single-device NTT on the virtual 8-device mesh
(SURVEY.md §4 implication (d): multi-chip tests over CPU-device meshes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.ops.ntt import NTTCtx
from fawkes_crypto_tpu.parallel.ntt import DistNTT


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("dp", "sp"))


def _rand(n, k, batch=()):
    # canonical field elements (mont ops assume inputs < p)
    import random

    random.seed(7)
    fctx = FieldCtx.get(Fr)
    cnt = n
    for b in batch:
        cnt *= b
    vals = [random.randrange(Fr.p) for _ in range(cnt)]
    return jnp.asarray(fctx.encode(vals)).reshape(batch + (n, k))


def test_dist_ntt_matches_local(mesh):
    fctx = FieldCtx.get(Fr)
    n = 64
    ref = NTTCtx.get(fctx, n)
    dist = DistNTT(fctx, n, mesh, axis="sp")
    x = _rand(n, fctx.k)
    ntt_fn, _ = dist.make()
    got = jax.jit(ntt_fn)(x)
    want = ref.jit_ntt(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dist_intt_roundtrip_batched(mesh):
    fctx = FieldCtx.get(Fr)
    n = 32
    dist = DistNTT(fctx, n, mesh, axis="sp")
    x = _rand(n, fctx.k, batch=(4,))
    ntt_fn, intt_fn = dist.make(batch_axes=("dp",))
    y = jax.jit(ntt_fn)(x)
    back = jax.jit(intt_fn)(y)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_dist_intt_matches_local(mesh):
    fctx = FieldCtx.get(Fr)
    n = 64
    ref = NTTCtx.get(fctx, n)
    dist = DistNTT(fctx, n, mesh, axis="sp")
    x = _rand(n, fctx.k)
    _, intt_fn = dist.make()
    got = jax.jit(intt_fn)(x)
    want = ref.jit_intt(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
