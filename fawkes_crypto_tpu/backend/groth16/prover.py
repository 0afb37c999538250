"""Groth16 prover: witness replay -> QAP h(x) via TPU NTT -> MSMs -> proof.

Mirrors /root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:63-90
with bellman's create_random_proof replaced by our own pipeline:
  1. witness generation (WitnessCS replay consuming the const tracker,
     prover.rs:69-74; compiled witness program path in witness.py),
  2. az/bz/cz evaluations -> coset -> h(x) coefficients via the TPU NTT
     (the hot loop #3 of SURVEY.md §3.2),
  3. A/B/C multi-scalar multiplications (hot loop #4; TPU MSM in ops/msm.py,
     host fallback here for small circuits).
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from ...circuit.cs import WitnessCS
from ...ff.jfield import FieldCtx
from ...ops.ntt import NTTCtx
from ...seedbox import SeedboxChaCha20
from .params import Parameters, Proof
from .qap import sparse_matvec
from .setup import inputize_signal


def msm_host(points, scalars, p, E=None):
    """Host MSM: C++ Pippenger when available (BN254), pure-Python oracle
    else (TPU path in ops/msm.py)."""
    if E is None:
        from ...engines.engine import Bn256 as E
    from .params import G1Rows

    if isinstance(points, G1Rows):
        points = points.to_points()
    G = E.g
    scalars = [s % p for s in scalars]
    if E.cext_ok and points:
        from ...native import cext

        is_g2 = any(pt is not None and isinstance(pt[0], G.Fq2)
                    for pt in points)
        return (cext.g2_msm if is_g2 else cext.g1_msm)(points, scalars)
    acc = None
    for pt, s in zip(points, scalars):
        if s == 0 or pt is None:
            continue
        acc = G.g_add(acc, G.g_mul(pt, s))
    return acc


def compute_h_coeffs(params: Parameters, az, bz, cz) -> list:
    """h(x) = (a(x)b(x) - c(x)) / Z_H(x) coefficients (natural order),
    computed on a multiplicative coset via the TPU NTT."""
    Fr = params.E.fr
    n = params.r1cs.domain
    p = Fr.p
    fctx = FieldCtx.get(Fr)
    ntt = NTTCtx.get(fctx, n)
    g = Fr.generator
    gp = ntt.shift_pows_br(g)
    ginvp = ntt.shift_pows_br(pow(g, -1, p))
    zh_coset_inv = pow(pow(g, n, p) - 1, -1, p)
    zinv_c = jnp.broadcast_to(fctx.const(zh_coset_inv), (n, fctx.k))

    def to_coset_evals(vals):
        x = jnp.asarray(fctx.encode(vals + [0] * (n - len(vals))))
        coeffs_br = ntt.jit_evals_to_coeffs_br(x)
        return ntt.jit_coeffs_br_to_evals(fctx.jit_mul(coeffs_br, gp))

    ea, eb, ec = to_coset_evals(az), to_coset_evals(bz), to_coset_evals(cz)
    h_evals = fctx.jit_mul(fctx.jit_sub(fctx.jit_mul(ea, eb), ec), zinv_c)
    h_coeffs_br = fctx.jit_mul(ntt.jit_evals_to_coeffs_br(h_evals), ginvp)
    # back to natural order for the host MSM (TPU MSM uses bitrev H directly)
    from ...ops.ntt import bitrev_permutation

    coeffs_br_host = fctx.decode(h_coeffs_br)
    rev = bitrev_permutation(n)
    coeffs = [0] * n
    for i in range(n):
        coeffs[int(rev[i])] = coeffs_br_host[i]
    assert coeffs[n - 1] == 0, "h degree must be <= domain-2"
    return coeffs[: n - 1]


def generate_witness(params: Parameters, input_pub, input_sec,
                     circuit: Callable, alloc_pub: Callable,
                     alloc_sec: Callable):
    """Reference-style witness replay (prover.rs:69-74): re-run the circuit
    on WitnessCS with concrete values, consuming recorded const decisions."""
    wcs = WitnessCS(params.E.fr, params.const_tracker)
    signal_pub = alloc_pub(wcs, input_pub)
    inputize_signal(signal_pub)
    signal_sec = alloc_sec(wcs, input_sec)
    circuit(signal_pub, signal_sec)
    assert wcs.const_tracker_index == len(params.const_tracker), \
        "not all cached data used"
    inputs = [v.x for v in wcs.values_input]
    aux = [v.x for v in wcs.values_aux]
    return inputs, aux


def generate_witness_fast(params: Parameters, input_pub, input_sec,
                          circuit: Callable, alloc_pub: Callable,
                          alloc_sec: Callable):
    """Compiled witness-program path (backend/groth16/witness.py): 10-100x
    faster than DSL replay; falls back to replay when the program is
    unavailable (e.g. Parameters loaded from disk without hints)."""
    if params.batch is not None:
        # batch-replicated circuit: input_pub is the opening root,
        # input_sec the list of tx witnesses (replicate.py)
        from .replicate import BatchWitness

        bw = params.__dict__.get("_batch_witness")
        if bw is None:
            bw = BatchWitness(params.batch[0])
            params.__dict__["_batch_witness"] = bw
        root_in = input_pub.x if hasattr(input_pub, "x") else int(input_pub)
        return bw.evaluate(root_in, input_sec)
    if params.witness_ops:
        from .witness import WitnessProgram

        wp = params.__dict__.get("_witness_program")
        if wp is None:
            wp = WitnessProgram.from_params(params)
            params.__dict__["_witness_program"] = wp
        return wp.evaluate_fast(input_pub, input_sec)
    return generate_witness(params, input_pub, input_sec, circuit,
                            alloc_pub, alloc_sec)


def _assert_satisfied(r1cs, z, p):
    az = sparse_matvec(r1cs.a_rows, r1cs.a_cols, r1cs.a_vals, z,
                       r1cs.num_constraints, p)
    bz = sparse_matvec(r1cs.b_rows, r1cs.b_cols, r1cs.b_vals, z,
                       r1cs.num_constraints, p)
    cz = sparse_matvec(r1cs.c_rows, r1cs.c_cols, r1cs.c_vals, z,
                       r1cs.num_constraints, p)
    for i, (x, y, w_) in enumerate(zip(az, bz, cz)):
        assert x * y % p == w_, f"R1CS not satisfied at constraint {i}"


def prove(params: Parameters, input_pub, input_sec, circuit: Callable,
          alloc_pub: Callable, alloc_sec: Callable,
          seed: Optional[bytes] = None,
          device_msm: Optional[bool] = None,
          mesh=None) -> Tuple[list, Proof]:
    """Returns (public_inputs, proof). Randomizers r,s from seed or OS.

    device_msm: True -> TPU MSM/NTT pipeline (backend/groth16/device.py);
    False -> host oracle path; None -> device for large circuits.
    mesh: a jax.sharding.Mesh -> shard the NTT domain and all five MSMs
    over its "sp" axis (backend/groth16/mesh.py MeshProver) — the
    multi-chip prover; proofs stay bit-identical to single-chip.
    """
    from ...utils.profiling import StageTimer, device_trace

    E = params.E
    Fr = E.fr
    g_add, g_mul, g_neg = E.g.g_add, E.g.g_mul, E.g.g_neg

    tm = StageTimer()
    p = Fr.p
    # Raw-limb fast path: the native batch evaluator emits canonical LE
    # bytes that reinterpret directly as the device 16-bit limb layout —
    # rollup-scale witnesses never materialize as Python ints
    # (witness_native.py; the reference streams Rust values into bellman
    # at prover.rs:74-80, this is the TPU analog).
    aux_arr = z_arr = z_mont_arr = None
    with tm.stage("witness"):
        raw = None
        if params.batch is not None:
            from .replicate import BatchWitness

            bw = params.__dict__.get("_batch_witness")
            if bw is None:
                bw = BatchWitness(params.batch[0])
                params.__dict__["_batch_witness"] = bw
            root_in = (input_pub.x if hasattr(input_pub, "x")
                       else int(input_pub))
            raw = bw.evaluate_raw(root_in, input_sec, want_mont=True)
        if raw is not None:
            import numpy as np

            from ...ff.limbs import ints_to_limbs, n_limbs_for
            from .witness_native import limbs_from_u64

            inputs, aux_u64, _, aux_mont_u64 = raw
            aux = None
            k = n_limbs_for(Fr.word_count)
            aux_arr = limbs_from_u64(aux_u64, k)
            z_arr = np.concatenate(
                [ints_to_limbs(inputs, k), aux_arr])
            # Montgomery z straight from the native evaluator: feeding the
            # h pipeline without a device-side to_mont pass (whose wide-
            # product intermediates OOM HBM at rollup scale)
            z_mont_arr = np.concatenate([
                ints_to_limbs([Fr.to_mont(v) for v in inputs], k),
                limbs_from_u64(aux_mont_u64, k),
            ])
        else:
            inputs, aux = generate_witness_fast(
                params, input_pub, input_sec, circuit, alloc_pub,
                alloc_sec
            )
    r1cs = params.r1cs
    if aux is None:
        assert len(z_arr) == r1cs.num_wires
        z = None
    else:
        z = inputs + aux
        assert len(z) == r1cs.num_wires
    if mesh is not None:
        device_msm = True
    elif device_msm is None:
        device_msm = r1cs.domain >= 4096

    # Optional R1CS-satisfaction sanity check (both paths): an unsatisfied
    # witness otherwise only surfaces as a proof that fails verification.
    # Costs a full host SpMV pass per proof, so it's env-gated.
    if os.environ.get("FAWKES_CHECK_SATISFIED", "") not in ("", "0"):
        if z is None:
            from .witness_native import _u64_to_ints

            aux = _u64_to_ints(aux_u64)
            z = inputs + aux
        with tm.stage("check_satisfied"):
            _assert_satisfied(r1cs, z, p)

    if not device_msm:
        if z is None:
            from .witness_native import _u64_to_ints

            aux = _u64_to_ints(aux_u64)
            z = inputs + aux
        with tm.stage("spmv"):
            az = sparse_matvec(r1cs.a_rows, r1cs.a_cols, r1cs.a_vals, z,
                               r1cs.num_constraints, p)
            bz = sparse_matvec(r1cs.b_rows, r1cs.b_cols, r1cs.b_vals, z,
                               r1cs.num_constraints, p)
            cz = sparse_matvec(r1cs.c_rows, r1cs.c_cols, r1cs.c_vals, z,
                               r1cs.num_constraints, p)

    if seed is None:
        seed = os.urandom(32)
    sb = SeedboxChaCha20(b"groth16_prove" + seed)
    r = sb.gen_num(Fr).x
    s = sb.gen_num(Fr).x

    pk = params.pk
    if device_msm:
        import jax.numpy as jnp

        if mesh is not None:
            from .mesh import MeshProver

            dp = params.__dict__.get("_mesh_prover")
            if dp is None or dp.mesh is not mesh:
                with tm.stage("device_init"):
                    dp = MeshProver(params, mesh)
                    params.__dict__["_mesh_prover"] = dp
        else:
            from .device import DeviceProver

            dp = params.__dict__.setdefault("_device_prover", None)
            if dp is None:
                with tm.stage("device_init"):
                    dp = DeviceProver(params)
                    params.__dict__["_device_prover"] = dp
        with device_trace("groth16_prove"):
            with tm.stage("spmv_ntt_h"):
                if z_arr is not None:
                    z_mont = jnp.asarray(z_mont_arr)
                else:
                    z_mont = jnp.asarray(dp.fr.encode(z))
                h_br = jax_block(dp.h_scalars_br(z_mont))
            a_msm, b1_msm, b2_msm, l_pt, h_pt = dp.msms(
                z_arr if z_arr is not None else z,
                aux_arr if aux_arr is not None else aux,
                h_br, timer=tm
            )
        lh_msm = g_add(l_pt, h_pt)
    else:
        with tm.stage("ntt_h"):
            h = compute_h_coeffs(params, az, bz, cz)
        with tm.stage("msm_a"):
            a_msm = msm_host(pk.a_g1, z, p, E)
        with tm.stage("msm_b1"):
            b1_msm = msm_host(pk.b_g1, z, p, E)
        with tm.stage("msm_b2"):
            b2_msm = msm_host(pk.b_g2, z, p, E)
        with tm.stage("msm_lh"):
            lh_msm = g_add(msm_host(pk.l_g1, aux, p, E),
                           msm_host(pk.h_g1, h, p, E))

    with tm.stage("host_tail"):
        # A = alpha + sum z_i u_i(tau) + r*delta
        a_pt = g_add(g_add(pk.alpha_g1, a_msm), g_mul(pk.delta_g1, r))
        # B = beta + sum z_i v_i(tau) + s*delta (G2), B1 same in G1
        b_pt = g_add(g_add(pk.beta_g2, b2_msm), g_mul(pk.delta_g2, s))
        b1_pt = g_add(g_add(pk.beta_g1, b1_msm), g_mul(pk.delta_g1, s))
        # C = sum_aux z_i l_i + sum h_i H_i + s*A + r*B1 - r*s*delta
        c_pt = lh_msm
        c_pt = g_add(c_pt, g_mul(a_pt, s))
        c_pt = g_add(c_pt, g_mul(b1_pt, r))
        c_pt = g_add(c_pt, g_neg(g_mul(pk.delta_g1, r * s % p)))

    tm.close()
    return inputs[1:], Proof(a=a_pt, b=b_pt, c=c_pt)


def prove_many(params: Parameters, jobs, circuit: Callable,
               alloc_pub: Callable, alloc_sec: Callable,
               seeds: Optional[list] = None,
               device_msm: Optional[bool] = None):
    """Batched (dp) proving: N proofs sharing one CRS residency.

    jobs: list of (input_pub, input_sec). Returns a list of
    (public_inputs, Proof). On the TPU wave path, all N proofs' MSMs run
    as ONE batched wave schedule per CRS query (proof i's windows are
    extra windows of the same accumulation — ops/msm_wave.py `batch`)
    and the h pipelines share one compiled map, so fixed per-MSM costs
    (digit sort dispatch, reduction trees, host Horner roundtrips)
    amortize across the batch — the ZeroPool-operator shape
    (SURVEY.md §2.5 data parallel; reference has no analog)."""
    B = len(jobs)
    E = params.E
    Fr = E.fr
    p = Fr.p
    g_add, g_mul, g_neg = E.g.g_add, E.g.g_mul, E.g.g_neg
    if seeds is None:
        seeds = [os.urandom(32) for _ in range(B)]
    assert len(seeds) == B

    from ...utils.profiling import StageTimer

    tm = StageTimer()
    r1cs = params.r1cs
    with tm.stage("witness"):
        zs, inputs_l, aux_l = [], [], []
        for input_pub, input_sec in jobs:
            inputs, aux = generate_witness_fast(
                params, input_pub, input_sec, circuit, alloc_pub,
                alloc_sec)
            inputs_l.append(inputs)
            aux_l.append(aux)
            zs.append(inputs + aux)

    if device_msm is None:
        import jax

        device_msm = (r1cs.domain >= 4096
                      or jax.default_backend() == "tpu")
    if not device_msm:
        out = []
        for (input_pub, input_sec), seed in zip(jobs, seeds):
            out.append(prove(params, input_pub, input_sec, circuit,
                             alloc_pub, alloc_sec, seed=seed,
                             device_msm=False))
        return out

    import jax.numpy as jnp

    from .device import DeviceProver

    dp = params.__dict__.get("_batch_prover")
    if dp is None or dp.batch != B:
        with tm.stage("device_init"):
            dp = DeviceProver(params, batch=B)
            params.__dict__["_batch_prover"] = dp
    with tm.stage("spmv_ntt_h"):
        z_mont = jnp.stack([jnp.asarray(dp.fr.encode(z)) for z in zs])
        h_br = jax_block(dp.h_scalars_br(z_mont))
    per_proof = dp.msms_batch(zs, aux_l, h_br, timer=tm)

    pk = params.pk
    out = []
    with tm.stage("host_tail"):
        for i, (a_msm, b1_msm, b2_msm, l_pt, h_pt) in enumerate(per_proof):
            sb = SeedboxChaCha20(b"groth16_prove" + seeds[i])
            r = sb.gen_num(Fr).x
            s = sb.gen_num(Fr).x
            a_pt = g_add(g_add(pk.alpha_g1, a_msm), g_mul(pk.delta_g1, r))
            b_pt = g_add(g_add(pk.beta_g2, b2_msm), g_mul(pk.delta_g2, s))
            b1_pt = g_add(g_add(pk.beta_g1, b1_msm),
                          g_mul(pk.delta_g1, s))
            c_pt = g_add(l_pt, h_pt)
            c_pt = g_add(c_pt, g_mul(a_pt, s))
            c_pt = g_add(c_pt, g_mul(b1_pt, r))
            c_pt = g_add(c_pt, g_neg(g_mul(pk.delta_g1, r * s % p)))
            out.append((inputs_l[i][1:], Proof(a=a_pt, b=b_pt, c=c_pt)))
    tm.close()
    return out


def jax_block(x):
    """Block on device completion so stage timers measure real work
    (axon dispatch is async)."""
    try:
        return x.block_until_ready()
    except AttributeError:
        return x
