"""Flagship-scale rollup prove on a real TPU.

Builds an n-tx rollup batch (circuit/rollup.py — the reference's
README.md:54-56 workload analog: 1024 txs = 35,695,616 constraints),
generates the CRS on-chip (fixed-base kernels), proves on the device
MSM/NTT pipeline, and verifies. Per-stage wall-clock is printed and the
last line is a single JSON record.

Usage: python scripts/rollup_prove.py [n_txs] [--host-check]
  n_txs=120 -> 4,183,084 constraints, domain 2^22 (the largest slice
  that fits one v5e chip with the CRS resident).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import fawkes_crypto_tpu

fawkes_crypto_tpu.enable_compile_cache()

import random

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.replicate import rollup_setup
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.rollup import (
    TX_GATES,
    Account,
    SparseMerkleTree,
    make_txs,
)
from fawkes_crypto_tpu.engines.bn256 import Fr, Fs, jubjub_bn256
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.native.poseidon import poseidon


def main(n_txs=120, host_check=False):
    from fawkes_crypto_tpu.circuit.rollup import RollupParams

    rng = random.Random(42)
    t_all = time.perf_counter()
    params = RollupParams.new(Fr, jubjub_bn256())

    t0 = time.perf_counter()
    # Parameters persist in the framework's own npz format (VERDICT r4
    # item 6) — batch templates round-trip as the template + n_txs and
    # device CRS row tables as raw uint32 arrays (serialize.py), the
    # analog of bellman's Parameters::write/read (mod.rs:150-177).
    cache = f"/tmp/rollup_params_{n_txs}.npz"
    import os

    from fawkes_crypto_tpu.backend.groth16.serialize import (
        read_parameters,
        write_parameters,
    )

    if os.path.exists(cache):
        gp = read_parameters(cache)
        print(f"setup loaded from {cache}", flush=True)
    else:
        gp = rollup_setup(n_txs, params, seed=b"rollup-bench")
        try:
            write_parameters(cache, gp)
        except Exception as e:  # cache is best-effort
            print(f"params cache write failed: {e}", flush=True)
    t_setup = time.perf_counter() - t0
    n_constraints = gp.r1cs.num_constraints
    print(f"setup: {t_setup:.1f}s  constraints={n_constraints} "
          f"domain=2^{gp.r1cs.domain.bit_length()-1} "
          f"wires={gp.r1cs.num_wires}", flush=True)

    # host state: accounts + sparse tree + signed transfers
    t0 = time.perf_counter()
    tree = SparseMerkleTree(params)
    n_acc = min(64, 2 * n_txs)
    accounts = {}
    for i in range(n_acc):
        sk = Num(Fs, rng.randrange(1, Fs.p))
        pk = params.jubjub.edwards_g.mul(sk, params.jubjub).x
        acc = Account(bal=Num(Fr, rng.randrange(1 << 24, 1 << 26)),
                      nonce=Num(Fr, 0), pk=pk, sk=sk)
        accounts[i] = acc
        tree.set_leaf(i, poseidon([acc.bal, acc.nonce, acc.pk],
                                  params.leaf))
    root0 = tree.root()
    pairs = [(rng.randrange(n_acc), rng.randrange(n_acc)) for _ in range(n_txs)]
    pairs = [(a, b if b != a else (a + 1) % n_acc) for a, b in pairs]
    txs = make_txs(tree, accounts, pairs,
                   [Num(Fr, rng.randrange(1, 1 << 16)) for _ in range(n_txs)],
                   params)
    t_txgen = time.perf_counter() - t0
    print(f"txgen (host tree + signatures): {t_txgen:.1f}s", flush=True)

    # cold prove (compiles) then warm prove (the steady-state number)
    t0 = time.perf_counter()
    inputs, proof = prove(gp, root0, txs, None, None, None, seed=b"p1")
    t_cold = time.perf_counter() - t0
    print(f"prove cold (incl. compiles): {t_cold:.1f}s", flush=True)

    t0 = time.perf_counter()
    inputs, proof = prove(gp, root0, txs, None, None, None, seed=b"p2")
    t_warm = time.perf_counter() - t0
    from fawkes_crypto_tpu.utils.profiling import last_prove_timings

    stages = {k: round(v, 2) for k, v in last_prove_timings.items()}
    print(f"prove warm: {t_warm:.1f}s  stages={stages}", flush=True)

    ok = verify(gp.vk, proof, inputs)
    assert ok, "proof failed to verify"
    assert inputs[1] == tree.root().x
    print("verify: OK", flush=True)

    proof_match = None
    if host_check:
        t0 = time.perf_counter()
        _, proof_h = prove(gp, root0, txs, None, None, None, seed=b"p2",
                           device_msm=False)
        t_host = time.perf_counter() - t0
        proof_match = (proof.a, proof.b, proof.c) == \
            (proof_h.a, proof_h.b, proof_h.c)
        print(f"host prove: {t_host:.1f}s  device==host: {proof_match}",
              flush=True)
        assert proof_match, "device and host proofs differ"

    # per-constraint comparison vs the reference CPU flagship
    # (628 s / 35,695,616 constraints, README.md:56)
    ref_rate = 35_695_616 / 628.0
    ours = n_constraints / t_warm
    rec = {
        "n_txs": n_txs,
        "constraints": n_constraints,
        "setup_s": round(t_setup, 1),
        "txgen_s": round(t_txgen, 1),
        "prove_warm_s": round(t_warm, 2),
        "prove_cold_s": round(t_cold, 1),
        "stages": stages,
        "constraints_per_s": round(ours),
        "ref_constraints_per_s": round(ref_rate),
        "vs_ref_cpu": round(ours / ref_rate, 3),
        "verified": bool(ok),
        "device_host_match": proof_match,
        "native_witness": bool(
            getattr(gp.__dict__.get("_batch_witness"), "native", None)
            is not None),
        "total_s": round(time.perf_counter() - t_all, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    host_check = "--host-check" in args
    out = None
    for a in args:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
    args = [a for a in args if not a.startswith("--")]
    rec = main(int(args[0]) if args else 120, host_check=host_check)
    if out:
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
