"""Deterministic seeded parameter generation, byte-identical to the reference
seedbox crate (/root/reference/seedbox/src/lib.rs:9-54): Keccak-256(salt) seeds
a ChaCha20 stream (DJB variant, 64-bit counter / 64-bit nonce, both starting
at zero, matching rand_chacha's ChaCha20Rng); field elements are sampled by
filling 64-bit limbs, masking the top limb by REPR_SHAVE_BITS, and
rejection-interpreting the limbs *directly as Montgomery form*
(/root/reference/ff-uint/src/num/mod.rs:286-303).

Pure Python: parameters are generated once per process and cached; this is
not a hot path, so no TPU involvement.
"""

from __future__ import annotations

import struct

from .ff.hostfield import Num, PrimeField

PERSONALIZATION = b"__fawkes"
SEED_EDWARDS_G = b"edwards_g"


# --------------------------------------------------------------------------
# Keccak-256 (original pre-SHA3 padding 0x01, as used by sha3::Keccak256)
# --------------------------------------------------------------------------

_KECCAK_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_KECCAK_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_M64 = (1 << 64) - 1


def _rotl64(x, n):
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _M64


def _keccak_f1600(a):
    for rnd in range(24):
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl64(a[x][y], _KECCAK_ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                a[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        a[0][0] ^= _KECCAK_RC[rnd]
    return a


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    # pad: 0x01 ... 0x80 (original Keccak padding, not SHA3's 0x06)
    padlen = rate - (len(data) % rate)
    padded = bytearray(data) + bytearray(padlen)
    padded[len(data)] ^= 0x01
    padded[-1] ^= 0x80
    a = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            (lane,) = struct.unpack_from("<Q", block, i * 8)
            a[i % 5][i // 5] ^= lane
        _keccak_f1600(a)
    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        out += struct.pack("<Q", a[i % 5][i // 5])
    return bytes(out)


# --------------------------------------------------------------------------
# ChaCha20 keystream (DJB variant: 64-bit block counter in words 12-13,
# 64-bit nonce in words 14-15; rand_chacha::ChaCha20Rng semantics with
# stream id = 0)
# --------------------------------------------------------------------------

_M32 = 0xFFFFFFFF


def _quarter(st, a, b, c, d):
    st[a] = (st[a] + st[b]) & _M32
    st[d] = _rotl32(st[d] ^ st[a], 16)
    st[c] = (st[c] + st[d]) & _M32
    st[b] = _rotl32(st[b] ^ st[c], 12)
    st[a] = (st[a] + st[b]) & _M32
    st[d] = _rotl32(st[d] ^ st[a], 8)
    st[c] = (st[c] + st[d]) & _M32
    st[b] = _rotl32(st[b] ^ st[c], 7)


def _rotl32(x, n):
    return ((x << n) | (x >> (32 - n))) & _M32


def _chacha20_block(key_words, counter: int) -> list:
    st = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574] + list(key_words)
    st += [counter & _M32, (counter >> 32) & _M32, 0, 0]
    w = list(st)
    for _ in range(10):
        _quarter(w, 0, 4, 8, 12)
        _quarter(w, 1, 5, 9, 13)
        _quarter(w, 2, 6, 10, 14)
        _quarter(w, 3, 7, 11, 15)
        _quarter(w, 0, 5, 10, 15)
        _quarter(w, 1, 6, 11, 12)
        _quarter(w, 2, 7, 8, 13)
        _quarter(w, 3, 4, 9, 14)
    return [(w[i] + st[i]) & _M32 for i in range(16)]


class ChaCha20Words:
    """Sequential u32-word keystream (rand_core BlockRng word order)."""

    def __init__(self, key: bytes):
        assert len(key) == 32
        self.key_words = struct.unpack("<8I", key)
        self.counter = 0
        self.buf: list = []
        self.idx = 0

    def _refill(self):
        self.buf = _chacha20_block(self.key_words, self.counter)
        self.counter += 1
        self.idx = 0

    def next_u32(self) -> int:
        if self.idx >= len(self.buf):
            self._refill()
        v = self.buf[self.idx]
        self.idx += 1
        return v

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)

    def fill_bytes(self, n: int) -> bytes:
        # rand_core consumes whole u32 words per fill_bytes call
        out = bytearray()
        while len(out) < n:
            out += struct.pack("<I", self.next_u32())
        return bytes(out[:n])


class SeedboxChaCha20:
    """new_with_salt(salt) == ChaCha20Rng::from_seed(keccak256(salt))."""

    def __init__(self, salt: bytes):
        self.rng = ChaCha20Words(keccak256(salt))

    def fill_limbs(self, count: int) -> list:
        return [self.rng.next_u64() for _ in range(count)]

    def fill_bytes(self, n: int) -> bytes:
        return self.rng.fill_bytes(n)

    def gen_num(self, fld: PrimeField) -> Num:
        """Sample Num<Fp>: raw limbs are the Montgomery representation;
        rejection-sample until < modulus (ff-uint/src/num/mod.rs:286-303)."""
        shave_mask = 0xFFFFFFFFFFFFFFFF >> fld.shave_bits
        n_words = fld.word_count
        while True:
            limbs = self.fill_limbs(n_words)
            limbs[-1] &= shave_mask
            v = 0
            for i, w in enumerate(limbs):
                v |= w << (64 * i)
            if v < fld.p:
                return Num(fld, fld.from_mont(v))


def num_from_seed(fld: PrimeField, seed: bytes) -> Num:
    """FromSeed::from_seed (reference seedbox/src/lib.rs:47-54)."""
    return SeedboxChaCha20(seed).gen_num(fld)
