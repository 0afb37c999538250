"""PLONK proving backend (KZG over BN254) for the 3-wire custom gate CS.

The reference delegates to halo2 + snark-verifier
(/root/reference/fawkes-crypto/src/backend/plonk/{mod,setup,prover,
verifier}.rs); here the whole protocol is built in-repo — vanilla PLONK
(Gabizon-Williamson-Ciobotaru) with the single custom gate
q_a*a + q_b*b + q_c*c + q_ab*a*b + q_const = 0 (plonk_config.rs:41-55),
copy constraints via the 3-column permutation argument, KZG commitments
over the existing BN254 pairing (native/bn_pairing.py, native_ext/).
"""

from .params import Parameters
from .setup import setup
from .prover import Proof, prove
from .verifier import verify

__all__ = ["Parameters", "setup", "prove", "verify", "Proof"]
