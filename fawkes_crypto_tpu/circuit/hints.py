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


_POSEIDON_CACHE: Dict[tuple, object] = {}


def _poseidon_params_cached(fld, t, f, p, salt):
    key = (fld.p, t, f, p, salt)
    params = _POSEIDON_CACHE.get(key)
    if params is None:
        from ..native.poseidon import PoseidonParams

        params = PoseidonParams.new_with_salt(fld, t, f, p, salt)
        _POSEIDON_CACHE[key] = params
    return params


@register_hint("poseidon_perm")
def _hint_poseidon_perm(meta, vals):
    """Macro witness op for one poseidon permutation (circuit/poseidon.py
    _perm hint_block): returns the (a^2, a^4, a^5) intermediates of every
    NON-const sigma application, in the gadget's allocation order. Lane
    const-ness (meta["in_const"]) replays the trace-time const-folding so
    the output list aligns 1:1 with the recorded wires."""
    from ..ff.hostfield import Num

    fld = vals[0].fld
    params = _poseidon_params_cached(
        fld, meta["t"], meta["f"], meta["p"], meta.get("salt", ""))
    lanes = list(vals)
    const = list(meta["in_const"])
    outs = []
    half_f = params.f >> 1
    t = params.t
    for r in range(params.f + params.p):
        lanes = [s + c for s, c in zip(lanes, params.c[r])]
        full = r < half_f or r >= half_f + params.p
        for i in range(t) if full else (0,):
            a = lanes[i]
            a2 = a * a
            a4 = a2 * a2
            a5 = a4 * a
            if not const[i]:
                outs.extend((a2, a4, a5))
            lanes[i] = a5
        allc = all(const)
        lanes = [
            sum((params.m[i][j] * lanes[j] for j in range(t)),
                Num(fld, 0))
            for i in range(t)
        ]
        const = [allc] * t
    return tuple(outs)


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
