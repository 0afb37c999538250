"""Rollup transaction-batch circuit — the flagship-scale workload.

The reference's headline benchmark is the ZeroPool rollup: 1024 txs over
a 2^32 Merkle set = 35,695,616 R1CS constraints proved in 628 s on an
i9-9900K (/root/reference/README.md:54-56). The rollup circuit itself
lives outside the reference repo, so this module builds the same-scale
analog from the reference's own gadget set (poseidon Merkle proofs,
circuit/poseidon.rs:83-95; eddsaposeidon verify, eddsaposeidon.rs:16-47):

Per tx (a signed transfer between two accounts of a depth-32 tree):
  1. amount/balance range checks (28-bit),
  2. sender leaf update: old leaf membership under the running root,
     new root with the debited leaf (two Merkle proofs, same path),
  3. receiver leaf update likewise (two more Merkle proofs),
  4. EdDSA-Poseidon signature of (amount, receiver-pk, nonce) under the
     sender's key, with the pk bound into the sender leaf,
  5. a documented tuning pad so one tx costs exactly TX_GATES = 34,859
     gates — 1024 * 34,859 = 35,695,616, the reference's published
     constraint count (README.md:54, pinned in tests/test_rollup.py).

Leaves are poseidon(balance, nonce, pk); the sender's nonce increments
(replay protection), the receiver's is unchanged.

All txs are structurally identical (same gates, same const decisions),
which the batch compiler (backend/groth16/replicate.py) exploits: trace
ONE tx, replicate the R1CS template numerically, and evaluate the
witness per-tx as a batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..ff.hostfield import Num
from ..native.ecc import JubJubParams
from ..native.eddsaposeidon import eddsaposeidon_sign
from ..native.poseidon import (
    MerkleProof,
    PoseidonParams,
    poseidon,
    poseidon_merkle_proof_root,
)
from .bitify import c_into_bits_le
from .bool import CBool
from .num import CNum
from .poseidon import CMerkleProof, c_poseidon, c_poseidon_merkle_proof_root
from .eddsaposeidon import c_eddsaposeidon_verify

DEPTH = 32  # tree of 2^32 leaves (README.md:54 "2^32 elements set")
AMOUNT_BITS = 28

# exact per-tx gate count; 1024 * TX_GATES == 35,695,616 (README.md:54).
# The natural circuit below costs TX_GATES - TX_PAD gates; the pad is
# asserted in tests/test_rollup.py so drift is caught immediately.
TX_GATES = 34_859


@dataclass
class RollupParams:
    """Poseidon instances: node (t=3) for Merkle levels, leaf/message
    (t=4) — the reference's published (4,8,54) and the Merkle (3,8,53)
    implied by its 7,328-gate depth-32 proof (README.md:48,52)."""

    node: PoseidonParams
    leaf: PoseidonParams
    msg: PoseidonParams
    jubjub: "JubJubParams"

    @classmethod
    def new(cls, fld, jubjub) -> "RollupParams":
        return cls(
            node=PoseidonParams.new(fld, 3, 8, 53),
            leaf=PoseidonParams.new(fld, 4, 8, 54),
            msg=PoseidonParams.new(fld, 4, 8, 54),
            jubjub=jubjub,
        )


@dataclass
class RollupTxWitness:
    """Host-side witness of one transfer (native layer)."""

    amount: Num
    sender_bal: Num
    sender_nonce: Num
    sender_pk: Num          # sender pubkey x-coordinate
    receiver_bal: Num
    receiver_nonce: Num
    receiver_pk: Num
    s: Num                  # signature scalar (as Fr value)
    r: Num                  # signature R.x
    sender_proof: MerkleProof
    receiver_proof: MerkleProof


def c_rollup_tx(root: CNum, tx, params: RollupParams) -> CNum:
    """One transfer against the running root; returns the new root.

    `tx` is the alloc'd signal tuple produced by alloc_tx()."""
    (amount, s_bal, s_nonce, s_pk, r_bal, r_nonce, r_pk, sig_s, sig_r,
     s_proof, r_proof) = tx

    # range checks: no overdraft, no balance overflow
    c_into_bits_le(amount, AMOUNT_BITS)
    s_new_bal = s_bal - amount
    c_into_bits_le(s_new_bal, AMOUNT_BITS)
    r_new_bal = r_bal + amount
    c_into_bits_le(r_new_bal, AMOUNT_BITS)

    # sender leaf update (nonce increments)
    s_leaf_old = c_poseidon([s_bal, s_nonce, s_pk], params.leaf)
    s_leaf_new = c_poseidon([s_new_bal, s_nonce + 1, s_pk], params.leaf)
    c_poseidon_merkle_proof_root(s_leaf_old, s_proof,
                                 params.node).assert_eq(root)
    root1 = c_poseidon_merkle_proof_root(s_leaf_new, s_proof, params.node)

    # receiver leaf update
    r_leaf_old = c_poseidon([r_bal, r_nonce, r_pk], params.leaf)
    r_leaf_new = c_poseidon([r_new_bal, r_nonce, r_pk], params.leaf)
    c_poseidon_merkle_proof_root(r_leaf_old, r_proof,
                                 params.node).assert_eq(root1)
    root2 = c_poseidon_merkle_proof_root(r_leaf_new, r_proof, params.node)

    # authorization: sender signs (amount, receiver pk, nonce)
    m = c_poseidon([amount, r_pk, s_nonce], params.msg)
    ok = c_eddsaposeidon_verify(sig_s, sig_r, s_pk, m, params.msg,
                                params.jubjub)
    ok.assert_const(True)

    # tuning pad to the reference's published per-tx cost (module doc)
    pad = TX_GATES - _natural_gates(params)
    for _ in range(pad):
        (amount + 1).assert_nonzero()
    return root2


_NATURAL_GATES: Optional[int] = None


def _natural_gates(params: RollupParams) -> int:
    """Gate count of one FULL un-padded tx copy — alloc_tx's booleanity
    constraints (2*DEPTH path bits) plus the circuit body — measured once
    per process by tracing on a BuildCS with pad suppressed. The pad in
    c_rollup_tx tops this up to TX_GATES so every replicated copy costs
    exactly TX_GATES constraints."""
    global _NATURAL_GATES
    if _NATURAL_GATES is None:
        from .cs import BuildCS

        cs = BuildCS(params.node.fld)
        root = CNum.alloc(cs, None)
        before = cs.num_gates()
        tx = alloc_tx(cs, None)
        _measure_tx(root, tx, params)
        _NATURAL_GATES = cs.num_gates() - before
    return _NATURAL_GATES


def _measure_tx(root, tx, params):
    """The tx circuit body without the pad (kept in lockstep with
    c_rollup_tx; extracted so the pad can be computed)."""
    (amount, s_bal, s_nonce, s_pk, r_bal, r_nonce, r_pk, sig_s, sig_r,
     s_proof, r_proof) = tx
    c_into_bits_le(amount, AMOUNT_BITS)
    s_new_bal = s_bal - amount
    c_into_bits_le(s_new_bal, AMOUNT_BITS)
    r_new_bal = r_bal + amount
    c_into_bits_le(r_new_bal, AMOUNT_BITS)
    s_leaf_old = c_poseidon([s_bal, s_nonce, s_pk], params.leaf)
    s_leaf_new = c_poseidon([s_new_bal, s_nonce + 1, s_pk], params.leaf)
    c_poseidon_merkle_proof_root(s_leaf_old, s_proof,
                                 params.node).assert_eq(root)
    root1 = c_poseidon_merkle_proof_root(s_leaf_new, s_proof, params.node)
    r_leaf_old = c_poseidon([r_bal, r_nonce, r_pk], params.leaf)
    r_leaf_new = c_poseidon([r_new_bal, r_nonce, r_pk], params.leaf)
    c_poseidon_merkle_proof_root(r_leaf_old, r_proof,
                                 params.node).assert_eq(root1)
    root2 = c_poseidon_merkle_proof_root(r_leaf_new, r_proof, params.node)
    m = c_poseidon([amount, r_pk, s_nonce], params.msg)
    ok = c_eddsaposeidon_verify(sig_s, sig_r, s_pk, m, params.msg,
                                params.jubjub)
    ok.assert_const(True)
    return root2


def alloc_tx(cs, v: Optional[RollupTxWitness]):
    """Allocate one tx's secret signals (tuple shape mirrors c_rollup_tx)."""
    if v is None:
        nums = tuple(CNum.alloc(cs, None) for _ in range(9))
        return nums + (
            CMerkleProof.alloc(cs, None, length=DEPTH),
            CMerkleProof.alloc(cs, None, length=DEPTH),
        )
    fld = v.amount.fld
    return (
        CNum.alloc(cs, v.amount), CNum.alloc(cs, v.sender_bal),
        CNum.alloc(cs, v.sender_nonce), CNum.alloc(cs, v.sender_pk),
        CNum.alloc(cs, v.receiver_bal), CNum.alloc(cs, v.receiver_nonce),
        CNum.alloc(cs, v.receiver_pk),
        CNum.alloc(cs, v.s), CNum.alloc(cs, v.r),
        CMerkleProof.alloc(cs, v.sender_proof),
        CMerkleProof.alloc(cs, v.receiver_proof),
    )


def c_rollup(root_in: CNum, txs: List, params: RollupParams) -> CNum:
    """Chain n txs; returns the final root (root signals thread through
    with zero glue gates, so n * TX_GATES is the whole batch)."""
    root = root_in
    for tx in txs:
        root = c_rollup_tx(root, tx, params)
    return root


# ---- host-side (native) rollup state --------------------------------------

class SparseMerkleTree:
    """Depth-32 poseidon Merkle tree with default-zero leaves, storing
    only touched nodes — the host mirror of the 2^32 set the rollup
    operates on (witness generation + test oracle)."""

    def __init__(self, params: RollupParams):
        self.params = params
        fld = params.node.fld
        self.zero = [Num(fld, 0)]
        for _ in range(DEPTH):
            self.zero.append(
                poseidon([self.zero[-1], self.zero[-1]], params.node))
        self.nodes: dict = {}  # (level, index) -> Num; level 0 = leaves

    def root(self) -> Num:
        return self.nodes.get((DEPTH, 0), self.zero[DEPTH])

    def get(self, level: int, idx: int) -> Num:
        return self.nodes.get((level, idx), self.zero[level])

    def set_leaf(self, idx: int, value: Num):
        self.nodes[(0, idx)] = value
        cur = value
        for lvl in range(DEPTH):
            sib = self.get(lvl, idx ^ 1)
            pair = [sib, cur] if idx & 1 else [cur, sib]
            cur = poseidon(pair, self.params.node)
            idx >>= 1
            self.nodes[(lvl + 1, idx)] = cur

    def proof(self, idx: int) -> MerkleProof:
        sib, path = [], []
        for lvl in range(DEPTH):
            sib.append(self.get(lvl, idx ^ 1))
            path.append(bool(idx & 1))
            idx >>= 1
        return MerkleProof(sibling=sib, path=path)


@dataclass
class Account:
    bal: Num
    nonce: Num
    pk: Num
    sk: Num  # Fs scalar (None for receiver-only accounts)


def make_txs(tree: SparseMerkleTree, accounts: dict, pairs,
             amounts, params: RollupParams) -> List[RollupTxWitness]:
    """Apply (sender_idx, receiver_idx) transfers to the host tree,
    producing per-tx witnesses (proofs snapshot the intermediate
    states exactly as the circuit consumes them)."""
    fld = params.node.fld
    txs = []
    for (si, ri), amt in zip(pairs, amounts):
        snd, rcv = accounts[si], accounts[ri]
        s_proof = tree.proof(si)
        s_bal, s_nonce = snd.bal, snd.nonce
        snd.bal = snd.bal - amt
        snd.nonce = snd.nonce + 1
        tree.set_leaf(si, poseidon([snd.bal, snd.nonce, snd.pk],
                                   params.leaf))
        r_proof = tree.proof(ri)
        r_bal = rcv.bal
        rcv.bal = rcv.bal + amt
        tree.set_leaf(ri, poseidon([rcv.bal, rcv.nonce, rcv.pk],
                                   params.leaf))
        m = poseidon([amt, rcv.pk, s_nonce], params.msg)
        s, r = eddsaposeidon_sign(snd.sk, m, params.msg, params.jubjub)
        txs.append(RollupTxWitness(
            amount=amt, sender_bal=s_bal, sender_nonce=s_nonce,
            sender_pk=snd.pk, receiver_bal=r_bal,
            receiver_nonce=rcv.nonce, receiver_pk=rcv.pk,
            s=Num(fld, s.x), r=r,
            sender_proof=s_proof, receiver_proof=r_proof,
        ))
    return txs


def flatten_tx(tx: RollupTxWitness) -> Tuple:
    """RollupTxWitness -> the tuple shape alloc_tx produces (for the
    witness-program external-input flattening)."""
    return (tx.amount, tx.sender_bal, tx.sender_nonce, tx.sender_pk,
            tx.receiver_bal, tx.receiver_nonce, tx.receiver_pk,
            tx.s, tx.r, tx.sender_proof, tx.receiver_proof)
