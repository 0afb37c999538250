"""3-bit (8-way) constant multiplexer, Pedersen-hash-style windowing.

Mirror of /root/reference/fawkes-crypto/src/circuit/mux.rs:8-32.
"""

from __future__ import annotations

from typing import List

from ..ff.hostfield import Num
from .bool import CBool
from .num import CNum


def c_mux3(s: List[CBool], c: List[List[Num]]) -> List[CNum]:
    assert len(s) == 3, "should be 3 bits"
    for row in c:
        assert len(row) == 8, "should be 8 constants"

    s10 = s[0].to_num() * s[1].to_num()
    res = []
    for row in c:
        a210 = s10 * (row[7] - row[6] - row[5] + row[4] - row[3] + row[2] + row[1] - row[0])
        a21 = s[1].to_num() * (row[6] - row[4] - row[2] + row[0])
        a20 = s[0].to_num() * (row[5] - row[4] - row[1] + row[0])
        a2 = row[4] - row[0]
        a10 = s10 * (row[3] - row[2] - row[1] + row[0])
        a1 = s[1].to_num() * (row[2] - row[0])
        a0 = s[0].to_num() * (row[1] - row[0])
        a = row[0]
        res.append((a210 + a21 + a20 + a2) * s[2].to_num() + a10 + a1 + a0 + a)
    return res
