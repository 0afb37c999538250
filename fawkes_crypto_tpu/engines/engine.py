"""Pairing-engine abstraction: the TPU analog of the reference's
`Engine` trait that binds a bellman pairing engine to its Fq/Fr fields
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/engines.rs:4-22).

An `Engine` bundles everything the engine-generic Groth16 backend needs:
the base/scalar prime fields, the host group/pairing module (bn_pairing or
bls_pairing: G1_GEN/G2_GEN/g_add/g_mul/g_neg/multi_pairing/on-curve and
subgroup checks share one API), wire-format widths, and whether the C++
fast path (native_ext/bn254.cpp) applies.

Engines are singletons resolved by name (`Engine.get("bn256")`), which is
how a Parameters npz records its curve.
"""

from __future__ import annotations

import functools
import importlib
from dataclasses import dataclass, field

from ..ff.hostfield import PrimeField


@dataclass(frozen=True)
class Engine:
    name: str
    fq: PrimeField
    fr: PrimeField
    fs: PrimeField
    pairing_module: str  # import path of the host group/pairing module
    fq_bytes: int        # serialized base-field width (32 bn256 / 48 bls)
    scalar_bits: int     # MSM digit width: bits of Fr modulus
    g1_needs_subgroup_check: bool  # BLS G1 cofactor != 1

    @functools.cached_property
    def g(self):
        """The host group/pairing module (lazy import)."""
        return importlib.import_module(self.pairing_module,
                                       package=__package__)

    @property
    def cext_ok(self) -> bool:
        """C++ fast path is BN254-only (native_ext/bn254.cpp)."""
        if self.name != "bn256":
            return False
        from ..native import cext

        return cext.available()

    _registry = {}

    @classmethod
    def get(cls, name: str) -> "Engine":
        try:
            return cls._registry[name]
        except KeyError:
            raise KeyError(
                f"unknown engine {name!r}; known: {sorted(cls._registry)}"
            ) from None

    def __post_init__(self):
        Engine._registry[self.name] = self


def _bn256() -> Engine:
    from . import bn256

    return Engine(
        name="bn256", fq=bn256.Fq, fr=bn256.Fr, fs=bn256.Fs,
        pairing_module="fawkes_crypto_tpu.native.bn_pairing",
        fq_bytes=32, scalar_bits=254, g1_needs_subgroup_check=False,
    )


def _bls12_381() -> Engine:
    from . import bls12_381

    return Engine(
        name="bls12_381", fq=bls12_381.Fq, fr=bls12_381.Fr,
        fs=bls12_381.Fs,
        pairing_module="fawkes_crypto_tpu.native.bls_pairing",
        fq_bytes=48, scalar_bits=255, g1_needs_subgroup_check=True,
    )


Bn256 = _bn256()
Bls12_381 = _bls12_381()
