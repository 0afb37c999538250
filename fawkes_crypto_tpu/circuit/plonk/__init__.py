"""PLONK circuit layer: affine-form signals over a 3-wire custom gate.

Mirror of /root/reference/fawkes-crypto/src/circuit/plonk/{cs,num,bool}.rs.
The shared gadget library (circuit/{bitify,mux,poseidon,ecc,
eddsaposeidon}.py) compiles against this CS through the signal-class
dispatch hooks in circuit/num.py and circuit/bool.py — the Python analog
of the reference's cfg-gated module swap (circuit/mod.rs:1-11).
"""

from .cs import BuildCS, Gate
from .num import CNum
from .bool import CBool

# Signal-class dispatch: the shared gadget sources call the r1cs
# CNum/CBool constructors, which delegate here when the CS carries these
# attributes (circuit/num.py from_const/alloc).
BuildCS._signal_num_cls = CNum
BuildCS._signal_bool_cls = CBool

__all__ = ["BuildCS", "Gate", "CNum", "CBool"]
