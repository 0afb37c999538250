"""ctypes bindings for the C++ BN254 host backend (native_ext/bn254.cpp).

Compiles the shared library on first use (g++, cached next to the source)
and exposes host-side group/pairing operations in the same affine-int
format as native/bn_pairing.py. Every function degrades gracefully: if the
toolchain or compile fails, `lib()` returns None and callers fall back to
the pure-Python oracle. This mirrors the role of the external bellman_ce
native engine in the reference (SURVEY.md §2.4) for host-side work:
CRS exponentiations (setup.rs:20) and pairing verification
(verifier.rs:79-80).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native_ext", "bn254.cpp")
_SO = os.path.join(_REPO_ROOT, "native_ext", "libbn254.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return True
        r = subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO + ".tmp", _SRC],
            capture_output=True, timeout=300,
        )
        if r.returncode != 0:
            return False
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        try:
            l = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            l.bn254_g1_mul.argtypes = [u8p, u8p, u8p]
            l.bn254_g2_mul.argtypes = [u8p, u8p, u8p]
            l.bn254_g1_add.argtypes = [u8p, u8p, u8p]
            l.bn254_g1_msm.argtypes = [ctypes.c_size_t, u8p, u8p, u8p]
            l.bn254_g2_msm.argtypes = [ctypes.c_size_t, u8p, u8p, u8p]
            l.bn254_pairing_is_one.argtypes = [ctypes.c_size_t, u8p, u8p]
            l.bn254_pairing_is_one.restype = ctypes.c_int
            _lib = l
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return lib() is not None


# ---- byte conversions (host affine int format <-> ABI buffers) ------------

def _buf(b: bytes):
    return ctypes.cast(ctypes.create_string_buffer(b, len(b)),
                       ctypes.POINTER(ctypes.c_uint8))


def _out(n: int):
    return (ctypes.c_uint8 * n)()


def _g1_bytes(p) -> bytes:
    if p is None:
        return b"\x00" * 64
    return int(p[0]).to_bytes(32, "little") + int(p[1]).to_bytes(32, "little")


def _g1_parse(raw) -> Optional[Tuple[int, int]]:
    b = bytes(raw)
    x = int.from_bytes(b[:32], "little")
    y = int.from_bytes(b[32:], "little")
    return None if x == 0 and y == 0 else (x, y)


def _g2_bytes(q) -> bytes:
    if q is None:
        return b"\x00" * 128
    x, y = q
    return (int(x.c0).to_bytes(32, "little") + int(x.c1).to_bytes(32, "little")
            + int(y.c0).to_bytes(32, "little") + int(y.c1).to_bytes(32, "little"))


def _g2_parse(raw):
    from .bn_pairing import Fq2

    b = bytes(raw)
    vals = [int.from_bytes(b[i * 32:(i + 1) * 32], "little") for i in range(4)]
    if all(v == 0 for v in vals):
        return None
    return (Fq2(vals[0], vals[1]), Fq2(vals[2], vals[3]))


def _scalar_bytes(s: int) -> bytes:
    return int(s).to_bytes(32, "little")


# ---- public ops -------------------------------------------------------------

def g1_mul(p, s: int):
    l = lib()
    out = _out(64)
    l.bn254_g1_mul(_buf(_g1_bytes(p)), _buf(_scalar_bytes(s)), out)
    return _g1_parse(out)


def g2_mul(q, s: int):
    l = lib()
    out = _out(128)
    l.bn254_g2_mul(_buf(_g2_bytes(q)), _buf(_scalar_bytes(s)), out)
    return _g2_parse(out)


def g1_add_pts(p, q):
    l = lib()
    out = _out(64)
    l.bn254_g1_add(_buf(_g1_bytes(p)), _buf(_g1_bytes(q)), out)
    return _g1_parse(out)


def g1_msm(points: List, scalars: List[int]):
    l = lib()
    n = len(points)
    if n == 0:
        return None
    pts = b"".join(_g1_bytes(p) for p in points)
    sc = b"".join(_scalar_bytes(s) for s in scalars)
    out = _out(64)
    l.bn254_g1_msm(n, _buf(pts), _buf(sc), out)
    return _g1_parse(out)


def g2_msm(points: List, scalars: List[int]):
    l = lib()
    n = len(points)
    if n == 0:
        return None
    pts = b"".join(_g2_bytes(q) for q in points)
    sc = b"".join(_scalar_bytes(s) for s in scalars)
    out = _out(128)
    l.bn254_g2_msm(n, _buf(pts), _buf(sc), out)
    return _g2_parse(out)


def pairing_is_one(pairs) -> bool:
    """pairs: iterable of (G1 affine ints, G2 affine Fq2 pair)."""
    l = lib()
    items = list(pairs)
    g1s = b"".join(_g1_bytes(p) for p, _ in items)
    g2s = b"".join(_g2_bytes(q) for _, q in items)
    return bool(l.bn254_pairing_is_one(len(items), _buf(g1s), _buf(g2s)))
