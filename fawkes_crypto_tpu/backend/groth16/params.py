"""Groth16 parameter containers (the analog of Parameters/Proof/VK in
/root/reference/fawkes-crypto/src/backend/bellman_groth16/{mod,prover,verifier}.rs).

Points are affine: G1 = (int, int) | None, G2 = (Fq2, Fq2) | None.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

import numpy as np

from ...backend.groth16.qap import R1CS


class G1Rows:
    """Bulk G1 query stored as affine Montgomery rows (N, 2K) uint32 —
    the device-native ProvingKey representation produced by the
    fixed-base CRS generator (ops/fixed_base.py). This IS the wave-MSM
    table format, so the DeviceProver uploads it without re-encoding;
    at rollup scale the host point lists the reference materializes
    (bellman Parameters, mod.rs:139-177) never exist."""

    g2 = False

    def __init__(self, rows: np.ndarray, fld):
        self.rows = rows
        self.fld = fld  # host Fq (coordinates field)

    def __len__(self) -> int:
        return self.rows.shape[0]

    def to_points(self) -> list:
        """Decode to host affine points (None = identity). O(N) bignum —
        only for small/host paths and tests."""
        from ...ff.jfield import FieldCtx

        fctx = FieldCtx.get(self.fld)
        k = self.rows.shape[1] // 2
        xs = fctx.decode(np.ascontiguousarray(self.rows[:, :k]))
        ys = fctx.decode(np.ascontiguousarray(self.rows[:, k:]))
        zero = ~self.rows.any(axis=1)
        return [None if zero[i] else (xs[i], ys[i])
                for i in range(len(self))]

    def __iter__(self):
        return iter(self.to_points())


class G2Rows(G1Rows):
    """Bulk G2 query as affine Montgomery rows (N, 4K) uint32:
    [X.c0 | X.c1 | Y.c0 | Y.c1]."""

    g2 = True

    def __init__(self, rows: np.ndarray, fld, quad_cls=None):
        super().__init__(rows, fld)
        self.quad_cls = quad_cls

    def to_points(self) -> list:
        from ...ff.jfield import FieldCtx

        fctx = FieldCtx.get(self.fld)
        k = self.rows.shape[1] // 4
        comps = [fctx.decode(np.ascontiguousarray(
            self.rows[:, j * k:(j + 1) * k])) for j in range(4)]
        zero = ~self.rows.any(axis=1)
        Fq2 = self.quad_cls
        if Fq2 is None:
            from ...native.bn_pairing import Fq2
        return [None if zero[i]
                else (Fq2(comps[0][i], comps[1][i]),
                      Fq2(comps[2][i], comps[3][i]))
                for i in range(len(self))]


@dataclass
class VK:
    alpha: Any  # G1
    beta: Any  # G2
    gamma: Any  # G2
    delta: Any  # G2
    ic: List[Any]  # G1 per public input (incl. the ONE wire)
    # pairing engine the key lives on; carried through (de)serialization so
    # verify() is self-configuring and a curve mismatch errors loudly
    # instead of silently returning False (reference Parameters<E> carries
    # the engine in its type, backend/bellman_groth16/engines.rs:4-22)
    engine: str = "bn256"


@dataclass
class ProvingKey:
    alpha_g1: Any
    beta_g1: Any
    beta_g2: Any
    delta_g1: Any
    delta_g2: Any
    a_g1: List[Any]  # u_i(tau) G1, all wires
    b_g1: List[Any]  # v_i(tau) G1, all wires
    b_g2: List[Any]  # v_i(tau) G2, all wires
    l_g1: List[Any]  # (beta u + alpha v + w)/delta G1, aux wires
    h_g1: List[Any]  # tau^i Z(tau)/delta G1, i < domain-1 (natural order)


@dataclass
class Parameters:
    vk: VK
    pk: ProvingKey
    r1cs: R1CS
    const_tracker: List[bool]
    witness_ops: dict
    n_public: int  # num_input - 1 (excluding ONE)
    # recorded inputize() linear combinations, one per public input: the
    # compiled witness program derives z_in from these (witness.py)
    inputize_lcs: List[list] = field(default_factory=list)
    # pairing engine the CRS lives on (the analog of Parameters<E>'s type
    # parameter, backend/bellman_groth16/engines.rs:4-22)
    engine: str = "bn256"
    # batch-replicated circuits (replicate.py): (TxTemplate, n_txs).
    # When set, witness generation threads the template program per copy
    # instead of consulting witness_ops (which is empty).
    batch: Optional[tuple] = None

    @property
    def E(self):
        from ...engines.engine import Engine

        return Engine.get(self.engine)


@dataclass
class Proof:
    a: Any  # G1
    b: Any  # G2
    c: Any  # G1
