"""Keccak-256 Fiat-Shamir transcript for the PLONK prover/verifier.

The reference uses snark-verifier's EvmTranscript (keccak over EVM-style
encodings, backend/plonk/prover.rs:43-104); this transcript is the
in-repo analog built on the seedbox Keccak permutation — absorb points
and scalars, squeeze Fr challenges by hashing the running state.
"""

from __future__ import annotations

from ...engines.bn256 import Fr
from ...seedbox import keccak256


class Transcript:
    def __init__(self, label: bytes = b"fawkes_plonk"):
        self.state = keccak256(label)

    def _absorb(self, data: bytes):
        self.state = keccak256(self.state + data)

    def absorb_scalar(self, x: int):
        self._absorb(int(x % Fr.p).to_bytes(32, "little"))

    def absorb_point(self, pt):
        if pt is None:
            self._absorb(b"\x00" * 64)
        else:
            self._absorb(int(pt[0]).to_bytes(32, "little")
                         + int(pt[1]).to_bytes(32, "little"))

    def challenge(self, label: bytes) -> int:
        self.state = keccak256(self.state + label)
        # two squeezes for negligible mod-p bias
        lo = int.from_bytes(self.state, "little")
        hi = int.from_bytes(keccak256(self.state + b"\x01"), "little")
        return (lo + (hi << 256)) % Fr.p
