"""Batch-replicated rollup proving (backend/groth16/replicate.py):
template trace -> numeric R1CS replication -> per-copy witness ->
setup/prove/verify, without ever tracing the full batch circuit."""

import random

import numpy as np

from fawkes_crypto_tpu.backend.groth16.prover import prove
from fawkes_crypto_tpu.backend.groth16.replicate import (
    BatchWitness,
    replicate_r1cs,
    rollup_setup,
    trace_tx_template,
)
from fawkes_crypto_tpu.backend.groth16.verifier import verify
from fawkes_crypto_tpu.circuit.rollup import TX_GATES, RollupParams
from fawkes_crypto_tpu.engines.bn256 import Fr, jubjub_bn256

from test_rollup import make_state, rollup_params

rng = random.Random(5)


def test_replicated_r1cs_counts():
    params = rollup_params()
    tmpl = trace_tx_template(params)
    assert tmpl.G == TX_GATES
    for n in (1, 3):
        r1cs = replicate_r1cs(tmpl, n, Fr.p)
        assert r1cs.num_constraints == n * TX_GATES + 1 + 3
        assert r1cs.num_aux == n * tmpl.T
        assert r1cs.num_input == 3
    # the flagship batch: 1024 txs == the reference's published
    # 35,695,616 constraints (README.md:54) before the root inputize +
    # input rows
    assert 1024 * tmpl.G == 35_695_616


def test_batch_witness_satisfies():
    """Replicated witness satisfies the replicated R1CS (host SpMV)."""
    from fawkes_crypto_tpu.backend.groth16.prover import _assert_satisfied
    from fawkes_crypto_tpu.circuit.rollup import make_txs
    from fawkes_crypto_tpu.ff.hostfield import Num

    params = rollup_params()
    tree, accounts = make_state(params)
    root0 = tree.root()
    txs = make_txs(tree, accounts, [(0, 1), (2, 3)],
                   [Num(Fr, 700), Num(Fr, 41)], params)
    tmpl = trace_tx_template(params)
    r1cs = replicate_r1cs(tmpl, 2, Fr.p)
    bw = BatchWitness(tmpl)
    inputs, aux = bw.evaluate(root0.x, txs)
    assert inputs[2] == tree.root().x
    _assert_satisfied(r1cs, inputs + aux, Fr.p)


def test_rollup_batch_prove_verify():
    """rollup_setup -> prove -> verify for a 1-tx batch (host MSMs)."""
    from fawkes_crypto_tpu.circuit.rollup import make_txs
    from fawkes_crypto_tpu.ff.hostfield import Num

    params = rollup_params()
    tree, accounts = make_state(params)
    root0 = tree.root()
    txs = make_txs(tree, accounts, [(0, 1)], [Num(Fr, 123)], params)

    gp = rollup_setup(1, params, seed=b"rollup-test", device=False)
    inputs, proof = prove(gp, root0, txs, None, None, None,
                          seed=b"p", device_msm=False)
    assert inputs == [root0.x, tree.root().x]
    assert verify(gp.vk, proof, inputs)
    assert not verify(gp.vk, proof, [root0.x, (tree.root() + 1).x])
