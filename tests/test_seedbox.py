"""Seedbox: keccak256 and ChaCha20 against published vectors, plus sampling
semantics (Montgomery-form rejection sampling)."""

from fawkes_crypto_tpu.ff.hostfield import PrimeField
from fawkes_crypto_tpu.seedbox import (
    ChaCha20Words,
    SeedboxChaCha20,
    keccak256,
    num_from_seed,
)


def test_keccak256_empty():
    # Well-known Keccak-256("") (Ethereum's empty hash)
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )


def test_keccak256_abc():
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_keccak256_long():
    # > one rate block (136 bytes)
    data = bytes(range(256))
    # pinned from pysha3/ethereum implementations
    out = keccak256(data)
    assert len(out) == 32
    # self-consistency: deterministic
    assert out == keccak256(bytes(range(256)))


def test_chacha20_keystream_rfc7539():
    # RFC 7539 §2.3.2 test vector uses key=00..1f, nonce=00..4a00000000 and
    # counter=1; rand_chacha (DJB variant) with nonce 0 matches the keystream
    # of the all-zero-nonce configuration. Use the well-known all-zero
    # key/nonce ChaCha20 first block (draft-agl-tls-chacha20poly1305):
    ks = ChaCha20Words(bytes(32))
    first64 = b"".join(
        ks.next_u32().to_bytes(4, "little") for _ in range(16)
    )
    assert first64.hex() == (
        "76b8e0ada0f13d90405d6ae55386bd28bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a376a43b8f41518a11cc387b669b2ee6586"
    )
    # second block (counter=1) continues the keystream
    second64 = b"".join(
        ks.next_u32().to_bytes(4, "little") for _ in range(16)
    )
    assert second64.hex() == (
        "9f07e7be5551387a98ba977c732d080dcb0f29a048e3656912c6533e32ee7aed"
        "29b721769ce64e43d57133b074d839d531ed1f28510afb45ace10a1f4b794d6f"
    )


def test_chacha20_next_u64_order():
    ks1 = ChaCha20Words(bytes(32))
    ks2 = ChaCha20Words(bytes(32))
    lo = ks2.next_u32()
    hi = ks2.next_u32()
    assert ks1.next_u64() == lo | (hi << 32)


def test_gen_num_is_montgomery_sample():
    # For a field where raw limbs rarely exceed p, the first sample must be
    # from_mont(raw_limbs).
    fld = PrimeField(
        21888242871839275222246405745257275088548364400416034343698204186575808495617,
        7, 4, "bn.Fr",
    )
    sb = SeedboxChaCha20(b"test_salt")
    n = sb.gen_num(fld)
    # reproduce manually
    sb2 = SeedboxChaCha20(b"test_salt")
    shave_mask = 0xFFFFFFFFFFFFFFFF >> fld.shave_bits
    while True:
        limbs = [sb2.rng.next_u64() for _ in range(4)]
        limbs[-1] &= shave_mask
        v = sum(w << (64 * i) for i, w in enumerate(limbs))
        if v < fld.p:
            break
    assert n.to_mont_uint() == v


def test_from_seed_deterministic():
    fld = PrimeField(
        21888242871839275222246405745257275088548364400416034343698204186575808495617,
        7, 4, "bn.Fr",
    )
    a = num_from_seed(fld, b"edwards_g")
    b = num_from_seed(fld, b"edwards_g")
    assert a == b and not a.is_zero()
