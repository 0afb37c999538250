"""Poseidon hash / sponge / Merkle gadgets.

Mirror of /root/reference/fawkes-crypto/src/circuit/poseidon.rs:9-117; MDS mix
is LC-only (no gates), sigma costs 3 muls unless const-folded, giving the
reference's 255-constraint poseidon(4,8,54) and 7,328-constraint depth-32
Merkle proof.
"""

from __future__ import annotations

from typing import List, Optional

from ..core.signal import SizedVec, signal
from ..ff.hostfield import Num
from ..native.poseidon import MerkleProof, PoseidonParams
from .bool import CBool
from .cs import BaseCS
from .num import CNum


def _sigma(a: CNum) -> CNum:
    a_sq = a * a
    a_quad = a_sq * a_sq
    return a_quad * a


def _mix(state: List[CNum], params: PoseidonParams) -> List[CNum]:
    t = len(state)
    cs = state[0].cs
    new_state = [CNum.from_const(cs, 0) for _ in range(t)]
    for i in range(t):
        for j in range(t):
            new_state[i] = new_state[i] + state[j] * params.m[i][j]
    return new_state


def _perm(state: List[CNum], params: PoseidonParams) -> List[CNum]:
    assert len(state) == params.t
    state = list(state)
    cs = state[0].cs

    def meta_fn():
        # witness-macro metadata (BuildCS only): lane const-ness decides
        # which sigma muls fold and so which wires the macro outputs —
        # replayed identically by the "poseidon_perm" hint
        # (circuit/hints.py / native_ext/witness.cpp)
        in_const = [s.lc.as_const() is not None for s in state]
        meta = {"t": params.t, "f": params.f, "p": params.p,
                "salt": params.salt, "in_const": in_const}
        return meta, [list(s.lc.to_vec()) for s in state]

    with cs.hint_block("poseidon_perm", meta_fn, state):
        half_f = params.f >> 1
        for i in range(params.f + params.p):
            state = [s + c for s, c in zip(state, params.c[i])]
            if i < half_f or i >= half_f + params.p:
                state = [_sigma(s) for s in state]
            else:
                state[0] = _sigma(state[0])
            state = _mix(state, params)
    return state


def c_poseidon(inputs: List[CNum], params: PoseidonParams) -> CNum:
    n = len(inputs)
    assert 0 < n < params.t, "number of inputs should be less than t"
    cs = inputs[0].cs
    state = list(inputs) + [CNum.from_const(cs, 0) for _ in range(params.t - n)]
    return _perm(state, params)[0]


def c_poseidon_sponge(inputs: List[CNum], params: PoseidonParams) -> CNum:
    cs = inputs[0].cs
    state = [CNum.from_const(cs, 0) for _ in range(params.t)]
    items = [CNum.from_const(cs, len(inputs))] + list(inputs)
    r = params.t - 1
    for off in range(0, len(items), r):
        chunk = items[off : off + r]
        for i, v in enumerate(chunk):
            state[i] = state[i] + v
        state = _perm(state, params)
    return state[0]


@signal(MerkleProof)
class CMerkleProof:
    """Composite signal (sibling: Vec<CNum>, path: Vec<CBool>); the Signal
    protocol is derived by @signal, the analog of the reference's
    #[derive(Signal)] CMerkleProof (circuit/poseidon.rs:9-15)."""

    __slots__ = ("sibling", "path")
    __signal_fields__ = {"sibling": (SizedVec, CNum), "path": (SizedVec, CBool)}

    def __init__(self, sibling, path):
        self.sibling = sibling
        self.path = path


def c_poseidon_merkle_proof_root(leaf: CNum, proof: CMerkleProof,
                                 params: PoseidonParams) -> CNum:
    root = leaf.clone()
    for p, s in zip(proof.path, proof.sibling):
        first = s.switch(p, root)
        second = root + s - first
        root = c_poseidon([first, second], params)
    return root


def c_poseidon_merkle_tree_root(leaf: List[CNum], params: PoseidonParams) -> CNum:
    n = len(leaf)
    assert n > 0, "should be at least one leaf in the tree"
    cs = leaf[0].cs
    proof_sz = (n - 1).bit_length()
    total = 1 << proof_sz
    state = list(leaf) + [CNum.from_const(cs, 0) for _ in range(total - n)]
    for j in range(proof_sz):
        state = [
            c_poseidon([state[2 * i], state[2 * i + 1]], params)
            for i in range(total >> (j + 1))
        ]
    return state[0]
