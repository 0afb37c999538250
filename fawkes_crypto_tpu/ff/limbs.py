"""Host <-> device limb conversions.

Device format: radix-2^16 limbs stored little-endian in uint32, trailing axis
of size K (K=16 for 256-bit fields, K=24 for 384-bit). 16-bit limbs are the
TPU-native choice: the VPU has no 64-bit multiplier, but 16x16->32 products
are exact in uint32 lanes (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def n_limbs_for(word_count: int) -> int:
    return word_count * 4  # 4 x 16-bit limbs per 64-bit word


def int_to_limbs(x: int, k: int) -> np.ndarray:
    out = np.empty(k, dtype=np.uint32)
    for i in range(k):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    assert x >> (LIMB_BITS * k) == 0, "value too wide for limb count"
    return out


def limbs_to_int(a) -> int:
    a = np.asarray(a)
    x = 0
    for i in range(a.shape[-1]):
        x |= int(a[..., i]) << (LIMB_BITS * i)
    return x


def ints_to_limbs(xs, k: int) -> np.ndarray:
    """Vector of ints -> (N, K) uint32. Bulk path via int.to_bytes (C
    speed) — the per-limb Python loop was a scaling bottleneck at
    rollup sizes (millions of coefficients per R1CS matrix)."""
    assert LIMB_BITS == 16
    nb = k * 2
    buf = b"".join(int(x).to_bytes(nb, "little") for x in xs)
    return (np.frombuffer(buf, dtype="<u2")
            .reshape(len(xs), k).astype(np.uint32))


def limbs_to_ints(a) -> list:
    """(N, K) uint32 16-bit limbs -> list of ints (int.from_bytes bulk)."""
    assert LIMB_BITS == 16
    a = np.ascontiguousarray(np.asarray(a, dtype=np.uint32).astype("<u2"))
    n, k = a.shape
    nb = k * 2
    buf = a.tobytes()
    return [int.from_bytes(buf[j * nb:(j + 1) * nb], "little")
            for j in range(n)]
