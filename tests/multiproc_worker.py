"""Worker for tests/test_multiprocess.py: one of two jax.distributed
processes (the DCN stand-in — SURVEY.md §2.5 multi-host axis).

Each process owns 4 virtual CPU devices; the global mesh spans 8 devices
across the 2 processes, so every ppermute/all-gather in DistNTT/DistMSM
crosses a process boundary exactly as it would cross DCN between hosts.

Usage: python multiproc_worker.py <coordinator> <n_procs> <pid> <outfile>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import jax

jax.config.update("jax_platforms", "cpu")


def main(coord: str, n_procs: int, pid: int, outfile: str):
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_procs, process_id=pid)
    assert len(jax.devices()) == 4 * n_procs, "global device count"

    import random

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fawkes_crypto_tpu.engines.bn256 import Fq, Fr
    from fawkes_crypto_tpu.ff.hostfield import Num
    from fawkes_crypto_tpu.ff.jfield import FieldCtx
    from fawkes_crypto_tpu.native.bn_pairing import G1_GEN, g_add, g_mul
    from fawkes_crypto_tpu.ops.curve import decode_point_g1, encode_points_g1
    from fawkes_crypto_tpu.ops.msm import encode_scalars
    from fawkes_crypto_tpu.ops.ntt import NTTCtx, bitrev_permutation
    from fawkes_crypto_tpu.parallel.msm import DistMSM
    from fawkes_crypto_tpu.parallel.ntt import DistNTT

    mesh = Mesh(np.array(jax.devices()), ("sp",))
    fr = FieldCtx.get(Fr)
    fq = FieldCtx.get(Fq)
    rng = random.Random(7)
    results = {}

    # ---- NTT across the process boundary --------------------------------
    n = 1 << 10
    vals = [rng.randrange(Fr.p) for _ in range(n)]
    x_host = np.asarray(fr.encode(vals))
    sh = NamedSharding(mesh, P("sp", None))
    x = jax.make_array_from_callback(
        x_host.shape, sh, lambda idx: x_host[idx])
    dntt = DistNTT(fr, n, mesh, axis="sp")
    ntt_fn, intt_fn = dntt.make()
    with mesh:
        fwd = ntt_fn(intt_fn(x))  # round trip
    got = fr.decode(np.asarray(jax.device_get(fwd)))
    results["ntt_roundtrip"] = bool(got == vals)

    # forward transform vs the single-device NTT oracle
    ntt1 = NTTCtx.get(fr, n)
    with mesh:
        coeffs_dist = intt_fn(x)
    host_coeffs = fr.decode(np.asarray(
        ntt1.jit_evals_to_coeffs_br(jnp.asarray(x_host))))
    dist_coeffs = fr.decode(np.asarray(jax.device_get(coeffs_dist)))
    results["ntt_matches_single"] = bool(host_coeffs == dist_coeffs)

    # ---- MSM across the process boundary --------------------------------
    m = 64
    pts = [g_mul(G1_GEN, rng.randrange(1, 1 << 62)) for _ in range(m)]
    scalars = [rng.randrange(Fr.p) for _ in range(m)]
    dev_pts_h = tuple(np.asarray(c) for c in encode_points_g1(fq, pts))
    dev_sc_h = np.asarray(encode_scalars(scalars, m, fq.k))

    def sharded(a):
        s = NamedSharding(mesh, P("sp", *([None] * (a.ndim - 1))))
        return jax.make_array_from_callback(a.shape, s, lambda i: a[i])

    dist = DistMSM(fq, m, mesh, axis="sp")
    run = dist.make()
    with mesh:
        got_pt = jax.jit(run)(
            tuple(sharded(c) for c in dev_pts_h), sharded(dev_sc_h))
    got_pt = tuple(np.asarray(jax.device_get(c)) for c in got_pt)
    want = None
    for p, s in zip(pts, scalars):
        want = g_add(want, g_mul(p, s))
    results["msm_matches_host"] = bool(
        decode_point_g1(fq, tuple(jnp.asarray(c) for c in got_pt)) == want)

    if pid == 0:
        with open(outfile, "w") as f:
            json.dump(results, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
