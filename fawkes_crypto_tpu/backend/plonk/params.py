"""KZG universal parameters (powers of tau) for the PLONK backend.

The analog of the reference's ParamsKZG wrapper
(/root/reference/fawkes-crypto/src/backend/plonk/mod.rs:204-224:
`Parameters::setup(k)` samples an SRS from OsRng). Seeded option for
deterministic tests, like the Groth16 setup.
"""

from __future__ import annotations

import os
from typing import List, Optional

from ...engines.bn256 import Fr
from ...native.bn_pairing import G1_GEN, G2_GEN, g_mul
from ...seedbox import SeedboxChaCha20


class Parameters:
    """SRS: [tau^i]_1 for i < size, plus [1]_2 and [tau]_2."""

    def __init__(self, g1_pows: List, g2_one, g2_tau, k: int):
        self.g1_pows = g1_pows
        self.g2_one = g2_one
        self.g2_tau = g2_tau
        self.k = k

    @property
    def n(self) -> int:
        return 1 << self.k

    @staticmethod
    def setup(k: int, seed: Optional[bytes] = None) -> "Parameters":
        """SRS supporting domains up to 2^k (plus blinding slack)."""
        if seed is None:
            seed = os.urandom(32)
        sb = SeedboxChaCha20(b"plonk_setup" + seed)
        tau = 0
        while tau == 0:
            tau = sb.gen_num(Fr).x

        size = (1 << k) + 8  # max poly degree n+5 plus slack
        from ...native import cext

        if cext.available():
            g1 = lambda s: cext.g1_mul(G1_GEN, s % Fr.p)  # noqa: E731
            g2 = lambda s: cext.g2_mul(G2_GEN, s % Fr.p)  # noqa: E731
        else:
            g1 = lambda s: g_mul(G1_GEN, s % Fr.p)  # noqa: E731
            g2 = lambda s: g_mul(G2_GEN, s % Fr.p)  # noqa: E731

        pows = []
        acc = 1
        for _ in range(size):
            pows.append(g1(acc))
            acc = acc * tau % Fr.p
        return Parameters(pows, G2_GEN, g2(tau), k)
