"""Named-hint registry: serializable witness hints.

The reference's Parameters blob is self-sufficient — everything needed to
re-prove ships in the artifact (/root/reference/fawkes-crypto/src/backend/
bellman_groth16/mod.rs:139-177). Round-1 recorded hint ops held Python
closures (old circuit/ecc.py), so a reloaded Parameters lost the compiled
witness path. Hints are now (name, meta) pairs resolved against this
registry: `meta` is a small JSON-safe dict (e.g. {"curve": "jubjub_bn256"})
and the registered function reconstructs any heavy context from it.

Registering a hint: the function signature is fn(meta, vals) -> tuple of
Num outputs, where vals are the Num values of the op's input LCs.
"""

from __future__ import annotations

from typing import Callable, Dict

_HINTS: Dict[str, Callable] = {}


def register_hint(name: str):
    def deco(fn):
        assert name not in _HINTS, f"duplicate hint {name}"
        _HINTS[name] = fn
        return fn

    return deco


def resolve_hint(name: str):
    try:
        return _HINTS[name]
    except KeyError:
        raise KeyError(
            f"witness hint '{name}' is not registered; import the module "
            "that defines it before proving with loaded Parameters"
        ) from None


def _jubjub(meta):
    """Resolve JubJubParams from the curve name in hint metadata."""
    curve = meta["curve"]
    if curve == "jubjub_bn256":
        from ..engines.bn256 import jubjub_bn256

        return jubjub_bn256()
    if curve == "jubjub_bls12_381":
        from ..engines.bls12_381 import jubjub_bls12_381

        return jubjub_bls12_381()
    raise KeyError(f"unknown jubjub curve {curve!r}")


# ---- built-in hints (the witness sides of circuit/ecc.py gadgets) ----------

@register_hint("jubjub_mul_inv8")
def _hint_mul_inv8(meta, vals):
    """(x, y) -> the point (x, y) / 8 — preimage witness for
    assert_in_subgroup (reference circuit/ecc.rs:57-67)."""
    from ..ff.hostfield import Num
    from ..native.ecc import EdwardsPoint

    params = _jubjub(meta)
    inv8 = Num(params.fs, 8).checked_inv()
    p = EdwardsPoint(vals[0], vals[1]).mul(inv8, params)
    return (p.x, p.y)


@register_hint("jubjub_decompress_inv8")
def _hint_decompress_inv8(meta, vals):
    """x -> subgroup_decompress(x) / 8 (reference circuit/ecc.rs:69-80;
    falls back to the generator when x doesn't decompress, matching the
    witness-side convention)."""
    from ..ff.hostfield import Num
    from ..native.ecc import EdwardsPoint

    params = _jubjub(meta)
    inv8 = Num(params.fs, 8).checked_inv()
    p = (EdwardsPoint.subgroup_decompress(vals[0], params)
         or params.edwards_g).mul(inv8, params)
    return (p.x, p.y)


@register_hint("montgomery_get_y")
def _hint_montgomery_get_y(meta, vals):
    """(g, t) -> y with y^2 in {g, g*u} and parity tied to t — the sqrt
    witness of from_scalar's two-candidate construction (circuit/
    ecc.rs:194-244)."""
    params = _jubjub(meta)
    u = params.montgomery_u
    gv, tv = vals
    gs = gv.sqrt()
    y = gs if gs is not None else (gv * u).sqrt()
    return (y if (y * tv).is_even() else -y,)
