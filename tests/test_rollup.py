"""Rollup batch circuit: the reference's flagship-scale workload
(README.md:54-56 — 1024 txs over a 2^32 set = 35,695,616 constraints).

Pins the exact published constraint count and differentially tests the
circuit against the native sparse-tree oracle (the reference's
native-vs-circuit pattern, SURVEY.md §4.2)."""

import random

from fawkes_crypto_tpu.circuit.cs import BuildCS, DebugCS
from fawkes_crypto_tpu.circuit.num import CNum
from fawkes_crypto_tpu.circuit.rollup import (
    DEPTH,
    TX_GATES,
    Account,
    RollupParams,
    SparseMerkleTree,
    alloc_tx,
    c_rollup,
    c_rollup_tx,
    make_txs,
)
from fawkes_crypto_tpu.engines.bn256 import Fr, Fs, jubjub_bn256
from fawkes_crypto_tpu.ff.hostfield import Num

rng = random.Random(77)


def rollup_params():
    return RollupParams.new(Fr, jubjub_bn256())


def make_state(params, n_accounts=4):
    tree = SparseMerkleTree(params)
    accounts = {}
    from fawkes_crypto_tpu.native.poseidon import poseidon

    for i in range(n_accounts):
        sk = Num(Fs, rng.randrange(1, Fs.p))
        pk = params.jubjub.edwards_g.mul(sk, params.jubjub).x
        acc = Account(bal=Num(Fr, rng.randrange(1 << 20, 1 << 24)),
                      nonce=Num(Fr, rng.randrange(100)), pk=pk, sk=sk)
        accounts[i] = acc
        tree.set_leaf(i, poseidon([acc.bal, acc.nonce, acc.pk],
                                  params.leaf))
    return tree, accounts


def test_tx_gate_count_pin():
    """One padded tx costs exactly TX_GATES; 1024 of them hit the
    reference's published 35,695,616 (README.md:54)."""
    params = rollup_params()
    cs = BuildCS(Fr)
    root = CNum.alloc(cs, None)
    before = cs.num_gates()  # full copy cost: alloc (path-bit
    tx = alloc_tx(cs, None)  # booleanity) + circuit body + pad
    c_rollup_tx(root, tx, params)
    n = cs.num_gates() - before
    assert n == TX_GATES == 34_859, f"tx gates = {n}"
    assert 1024 * TX_GATES == 35_695_616


def test_rollup_chain_vs_oracle():
    """Two chained txs on DebugCS (eager satisfaction checks) against the
    sparse-tree oracle."""
    params = rollup_params()
    tree, accounts = make_state(params)
    root0 = tree.root()
    txs = make_txs(
        tree, accounts, [(0, 1), (1, 2)],
        [Num(Fr, 1000), Num(Fr, 500)], params)
    root_want = tree.root()

    cs = DebugCS(Fr)
    root = CNum.alloc(cs, root0)
    sig = [alloc_tx(cs, t) for t in txs]
    out = c_rollup(root, sig, params)
    assert out.get_value() == root_want
    out.assert_const(root_want)
    assert cs.num_gates() >= 2 * TX_GATES


def test_sparse_tree_proof_roundtrip():
    params = rollup_params()
    tree, accounts = make_state(params)
    from fawkes_crypto_tpu.native.poseidon import (
        poseidon,
        poseidon_merkle_proof_root,
    )

    acc = accounts[2]
    proof = tree.proof(2)
    leaf = poseidon([acc.bal, acc.nonce, acc.pk], params.leaf)
    assert poseidon_merkle_proof_root(leaf, proof, params.node) == tree.root()
