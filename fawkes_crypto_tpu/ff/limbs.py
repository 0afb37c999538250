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
    """Vector of ints -> (N, K) uint32."""
    out = np.empty((len(xs), k), dtype=np.uint32)
    for j, x in enumerate(xs):
        for i in range(k):
            out[j, i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_ints(a) -> list:
    a = np.asarray(a, dtype=np.uint64)
    n, k = a.shape
    return [
        sum(int(a[j, i]) << (LIMB_BITS * i) for i in range(k)) for j in range(n)
    ]
