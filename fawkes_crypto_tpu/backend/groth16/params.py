"""Groth16 parameter containers (the analog of Parameters/Proof/VK in
/root/reference/fawkes-crypto/src/backend/bellman_groth16/{mod,prover,verifier}.rs).

Points are affine: G1 = (int, int) | None, G2 = (Fq2, Fq2) | None.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

from ...backend.groth16.qap import R1CS


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

    @property
    def E(self):
        from ...engines.engine import Engine

        return Engine.get(self.engine)


@dataclass
class Proof:
    a: Any  # G1
    b: Any  # G2
    c: Any  # G1
