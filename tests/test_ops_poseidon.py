"""Batched device Poseidon vs the host oracle (differential pattern of
SURVEY.md §4.2); covers perm, hash, merkle proof root, full-tree root."""

import random

import jax.numpy as jnp
import numpy as np

from fawkes_crypto_tpu.engines.bn256 import Fr
from fawkes_crypto_tpu.ff.jfield import FieldCtx
from fawkes_crypto_tpu.native.poseidon import (
    MerkleProof,
    PoseidonParams,
    poseidon,
    poseidon_merkle_proof_root,
    poseidon_merkle_tree_root,
    poseidon_perm,
)
from fawkes_crypto_tpu.ff.hostfield import Num
from fawkes_crypto_tpu.ops.poseidon import PoseidonCtx

rng = random.Random(29)


def _nums(n):
    return [Num(Fr, rng.randrange(Fr.p)) for _ in range(n)]


def test_perm_and_hash_batched():
    fctx = FieldCtx.get(Fr)
    params = PoseidonParams.new(Fr, 4, 8, 54)
    ctx = PoseidonCtx(fctx, params)
    batch = 5
    states = [_nums(4) for _ in range(batch)]
    dev = jnp.asarray(
        fctx.encode([x for st in states for x in st])
    ).reshape(batch, 4, fctx.k)
    got = fctx.decode(ctx.jit_perm(dev).reshape(batch * 4, fctx.k))
    want = [v.x for st in states for v in poseidon_perm(st, params)]
    assert got == want

    inp = [_nums(3) for _ in range(batch)]
    dev_in = jnp.asarray(
        fctx.encode([x for st in inp for x in st])
    ).reshape(batch, 3, fctx.k)
    got_h = fctx.decode(ctx.jit_hash(dev_in))
    assert got_h == [poseidon(st, params).x for st in inp]


def test_merkle_proof_root_batched():
    fctx = FieldCtx.get(Fr)
    params = PoseidonParams.new(Fr, 3, 8, 53)
    ctx = PoseidonCtx(fctx, params)
    depth, batch = 6, 4
    leaves = _nums(batch)
    proofs = [
        MerkleProof(sibling=_nums(depth),
                    path=[rng.random() < 0.5 for _ in range(depth)])
        for _ in range(batch)
    ]
    dev_leaf = jnp.asarray(fctx.encode(leaves))
    dev_sib = jnp.asarray(
        fctx.encode([s for pr in proofs for s in pr.sibling])
    ).reshape(batch, depth, fctx.k)
    dev_bits = jnp.asarray(
        np.asarray([pr.path for pr in proofs], dtype=bool)
    )
    got = fctx.decode(ctx.jit_merkle_proof_root(dev_leaf, dev_sib, dev_bits))
    want = [
        poseidon_merkle_proof_root(l, pr, params).x
        for l, pr in zip(leaves, proofs)
    ]
    assert got == want


def test_merkle_tree_root():
    fctx = FieldCtx.get(Fr)
    params = PoseidonParams.new(Fr, 3, 8, 53)
    ctx = PoseidonCtx(fctx, params)
    leaves = _nums(8)
    dev = jnp.asarray(fctx.encode(leaves)).reshape(1, 8, fctx.k)
    got = fctx.decode(ctx.merkle_tree_root(dev))
    assert got == [poseidon_merkle_tree_root(leaves, params).x]
