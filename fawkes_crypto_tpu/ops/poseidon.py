"""Batched Poseidon permutation / hash / Merkle kernels on device.

Witness-side counterpart of native/poseidon.py (which mirrors the
reference /root/reference/fawkes-crypto/src/native/poseidon.rs:51-110):
the rollup witness generation hashes millions of Merkle nodes per proof,
so the permutation is vectorized over arbitrary leading batch dims and the
round loop is a single lax.scan body (one compiled round regardless of
f+p). Parameters come from the same seedbox generator, so outputs are
bit-identical to the host oracle.

State tensors: (..., t, K) uint32 Montgomery limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.jfield import FieldCtx
from ..native.poseidon import PoseidonParams


class PoseidonCtx:
    """Device tables + kernels for one PoseidonParams instance."""

    def __init__(self, fctx: FieldCtx, params: PoseidonParams):
        self.fctx = fctx
        self.params = params
        t, f, p = params.t, params.f, params.p
        self.t = t
        rounds = f + p
        self.c_tbl = jnp.asarray(
            fctx.encode([c for row in params.c for c in row])
        ).reshape(rounds, t, fctx.k)
        self.m_tbl = jnp.asarray(
            fctx.encode([m for row in params.m for m in row])
        ).reshape(t, t, fctx.k)
        half_f = f >> 1
        mask = np.zeros((rounds, t), dtype=bool)
        for i in range(rounds):
            if i < half_f or i >= half_f + p:
                mask[i, :] = True  # full round: sigma on every lane
            else:
                mask[i, 0] = True  # partial round: sigma on lane 0 only
        self.sigma_mask = jnp.asarray(mask)

    def _sigma(self, x):
        f = self.fctx
        x2 = f.mont_sqr(x)
        return f.mont_mul(f.mont_sqr(x2), x)

    def _mds(self, state):
        """state (..., t, K) -> M @ state."""
        f = self.fctx
        prods = f.mont_mul(self.m_tbl, state[..., None, :, :])  # (..., t, t, K)
        acc = prods[..., 0, :]
        for j in range(1, self.t):
            acc = f.add(acc, prods[..., j, :])
        return acc

    def perm(self, state):
        """Poseidon permutation, batched over leading dims of (..., t, K)."""
        f = self.fctx

        def round_body(s, xs):
            c, mask = xs
            s = f.add(s, c)
            s = f.select(mask, self._sigma(s), s)
            return self._mds(s), None

        state, _ = jax.lax.scan(
            round_body, state, (self.c_tbl, self.sigma_mask)
        )
        return state

    def hash(self, inputs):
        """inputs (..., n, K), 0 < n < t -> (..., K): pad with zeros, perm,
        take lane 0 (reference native/poseidon.rs:88-95)."""
        n = inputs.shape[-2]
        assert 0 < n < self.t
        pad = [(0, 0)] * (inputs.ndim - 2) + [(0, self.t - n), (0, 0)]
        return self.perm(jnp.pad(inputs, pad))[..., 0, :]

    def merkle_proof_root(self, leaf, siblings, path_bits):
        """Batched Merkle root from proofs (t must be 3: 2-ary tree).

        leaf: (..., K); siblings: (..., D, K); path_bits: (..., D) bool
        (True = current node is the RIGHT child, reference
        native/poseidon.rs:135-141). Returns (..., K).
        """
        assert self.t == 3, "merkle hashing uses 2-to-1 poseidon (t=3)"
        sib_m = jnp.moveaxis(siblings, -2, 0)  # (D, ..., K)
        bits_m = jnp.moveaxis(path_bits, -1, 0)  # (D, ...)

        def level(root, xs):
            s, b = xs
            first = self.fctx.select(b, s, root)
            second = self.fctx.select(b, root, s)
            pair = jnp.stack([first, second], axis=-2)
            return self.hash(pair), None

        root, _ = jax.lax.scan(level, leaf, (sib_m, bits_m))
        return root

    def merkle_tree_root(self, leaves):
        """(..., 2^D, K) -> (..., K): full-tree root, one batched hash
        level per depth (reference native/poseidon.rs:99-110)."""
        assert self.t == 3
        n = leaves.shape[-2]
        assert n & (n - 1) == 0 and n > 0
        state = leaves
        while state.shape[-2] > 1:
            h = state.shape[-2] // 2
            pairs = state.reshape(state.shape[:-2] + (h, 2, state.shape[-1]))
            state = self.hash(
                pairs.reshape((-1, 2, state.shape[-1]))
            ).reshape(state.shape[:-2] + (h, state.shape[-1]))
        return state[..., 0, :]

    @functools.cached_property
    def jit_perm(self):
        return jax.jit(self.perm)

    @functools.cached_property
    def jit_hash(self):
        return jax.jit(self.hash)

    @functools.cached_property
    def jit_merkle_proof_root(self):
        return jax.jit(self.merkle_proof_root)
