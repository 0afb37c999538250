"""Native Poseidon permutation / hash / sponge / Merkle helpers.

Host path mirrors /root/reference/fawkes-crypto/src/native/poseidon.rs:15-150
(params from the seedbox with the exact salt format string and Cauchy-matrix
MDS). Batched TPU path lives in ops/poseidon.py and is tested against this.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from ..ff.hostfield import Num, PrimeField
from ..seedbox import SeedboxChaCha20


@dataclass
class PoseidonParams:
    c: List[List[Num]]  # (f+p) x t round constants
    m: List[List[Num]]  # t x t MDS (Cauchy: 1/(x_i + y_j))
    t: int
    f: int
    p: int
    fld: PrimeField
    salt: str = ""  # kept so witness macro-ops can reconstruct the params

    @staticmethod
    def new(fld: PrimeField, t: int, f: int, p: int) -> "PoseidonParams":
        return PoseidonParams.new_with_salt(fld, t, f, p, "")

    @staticmethod
    def new_with_salt(fld: PrimeField, t: int, f: int, p: int, salt: str) -> "PoseidonParams":
        # salt format: reference native/poseidon.rs:40
        sb = SeedboxChaCha20(
            f"fawkes_poseidon(t={t},f={f},p={p},salt={salt})".encode()
        )
        c = [[sb.gen_num(fld) for _ in range(t)] for _ in range(f + p)]
        x = [sb.gen_num(fld) for _ in range(t)]
        y = [sb.gen_num(fld) for _ in range(t)]
        m = [[(x[i] + y[j]).checked_inv() for j in range(t)] for i in range(t)]
        return PoseidonParams(c=c, m=m, t=t, f=f, p=p, fld=fld, salt=salt)


def _sigma(a: Num) -> Num:
    return a.square().square() * a  # x^5


def poseidon_perm(state: List[Num], params: PoseidonParams) -> List[Num]:
    assert len(state) == params.t
    state = list(state)
    half_f = params.f >> 1
    for i in range(params.f + params.p):
        state = [s + c for s, c in zip(state, params.c[i])]
        if i < half_f or i >= half_f + params.p:
            state = [_sigma(s) for s in state]
        else:
            state[0] = _sigma(state[0])
        state = [
            sum((params.m[i][j] * state[j] for j in range(params.t)),
                Num(params.fld, 0))
            for i in range(params.t)
        ]
    return state


def poseidon(inputs: List[Num], params: PoseidonParams) -> Num:
    n = len(inputs)
    assert 0 < n < params.t, "number of inputs should be in (0, t)"
    state = list(inputs) + [Num(params.fld, 0)] * (params.t - n)
    return poseidon_perm(state, params)[0]


def poseidon_sponge(inputs: List[Num], params: PoseidonParams) -> Num:
    state = [Num(params.fld, 0)] * params.t
    items = [Num(params.fld, len(inputs))] + list(inputs)
    r = params.t - 1
    for off in range(0, len(items), r):
        chunk = items[off : off + r]
        for i, v in enumerate(chunk):
            state[i] = state[i] + v
        state = poseidon_perm(state, params)
    return state[0]


@dataclass
class MerkleProof:
    sibling: List[Num]
    path: List[bool]


def poseidon_merkle_proof_root(leaf: Num, proof: MerkleProof,
                               params: PoseidonParams) -> Num:
    root = leaf
    for p, s in zip(proof.path, proof.sibling):
        pair = [s, root] if p else [root, s]
        root = poseidon(pair, params)
    return root


def poseidon_merkle_tree_root(leaf: List[Num], params: PoseidonParams) -> Num:
    n = len(leaf)
    assert n > 0
    proof_sz = (n - 1).bit_length()
    total = 1 << proof_sz
    state = list(leaf) + [Num(params.fld, 0)] * (total - n)
    for j in range(proof_sz):
        state = [
            poseidon([state[2 * i], state[2 * i + 1]], params)
            for i in range(total >> (j + 1))
        ]
    return state[0]
