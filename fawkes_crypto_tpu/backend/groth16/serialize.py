"""Wire formats + on-disk persistence for Groth16 artifacts.

Mirrors the reference's artifact layer:
- Proof/VK byte format follows the reference's borsh encoding — G1 as two
  32-byte canonical LE field elements, G2 as (c1?, see below) pairs, the
  identity as all-zero coordinates
  (/root/reference/fawkes-crypto/src/backend/bellman_groth16/group.rs:13-123,
  prover.rs:38-60, verifier.rs:45-73; Num borsh = canonical LE limbs,
  ff-uint_derive/src/lib.rs:687-702).
- Fq2 components serialize in (c0, c1) order, matching the reference's
  G2Point((x.c0,x.c1),(y.c0,y.c1)) tuple layout (group.rs:23-27).
- Parameters persist as a single .npz (COO R1CS + affine point tables +
  const tracker), the analog of Parameters::write/read
  (mod.rs:150-177) with the brotli gate blob replaced by numpy's
  compressed container (SURVEY.md §2.2 "dense/COO tensor serialization").
"""

from __future__ import annotations

import io
from typing import List, Optional, Tuple

import numpy as np

from .params import VK, Parameters, Proof, ProvingKey
from .qap import R1CS


def _default_engine():
    from ...engines.engine import Bn256

    return Bn256


class InvalidPoint(ValueError):
    """Deserialized bytes do not encode a valid curve point.

    Mirrors bellman's checked reads (reference
    backend/bellman_groth16/mod.rs:159-176: `read(.., checked=true,
    disallow_points_at_infinity)`) — invalid-curve or out-of-range inputs
    must be rejected before they reach the pairing."""


# ---- scalar/point primitives -------------------------------------------------

def _fq_to_bytes(x: int, nb: int = 32) -> bytes:
    return int(x).to_bytes(nb, "little")


def _fq_from(buf: memoryview, off: int, nb: int = 32) -> Tuple[int, int]:
    return int.from_bytes(bytes(buf[off:off + nb]), "little"), off + nb


def g1_to_bytes(p, E=None) -> bytes:
    E = E or _default_engine()
    nb = E.fq_bytes
    if p is None:
        return b"\x00" * (2 * nb)
    return _fq_to_bytes(p[0], nb) + _fq_to_bytes(p[1], nb)


def g1_from_bytes(buf: memoryview, off: int = 0, check: bool = True,
                  check_subgroup: bool = True, E=None):
    E = E or _default_engine()
    nb = E.fq_bytes
    x, off = _fq_from(buf, off, nb)
    y, off = _fq_from(buf, off, nb)
    if x == 0 and y == 0:
        return None, off
    if check:
        G = E.g
        if x >= G.P or y >= G.P:
            raise InvalidPoint("G1 coordinate out of field range")
        if not G.g1_is_on_curve((x, y)):
            raise InvalidPoint("G1 point not on curve")
        if (check_subgroup and E.g1_needs_subgroup_check
                and not G.g1_is_in_subgroup((x, y))):
            raise InvalidPoint("G1 point not in the r-order subgroup")
    return (x, y), off


def g2_to_bytes(p, E=None) -> bytes:
    E = E or _default_engine()
    nb = E.fq_bytes
    if p is None:
        return b"\x00" * (4 * nb)
    x, y = p
    return (_fq_to_bytes(x.c0, nb) + _fq_to_bytes(x.c1, nb)
            + _fq_to_bytes(y.c0, nb) + _fq_to_bytes(y.c1, nb))


def g2_from_bytes(buf: memoryview, off: int = 0, check: bool = True,
                  check_subgroup: bool = True, E=None):
    E = E or _default_engine()
    G = E.g
    nb = E.fq_bytes
    x0, off = _fq_from(buf, off, nb)
    x1, off = _fq_from(buf, off, nb)
    y0, off = _fq_from(buf, off, nb)
    y1, off = _fq_from(buf, off, nb)
    if x0 == x1 == y0 == y1 == 0:
        return None, off
    if check:
        if max(x0, x1, y0, y1) >= G.P:
            raise InvalidPoint("G2 coordinate out of field range")
        pt = (G.Fq2(x0, x1), G.Fq2(y0, y1))
        if not G.g2_is_on_curve(pt):
            raise InvalidPoint("G2 point not on curve")
        if check_subgroup and not G.g2_is_in_subgroup(pt):
            raise InvalidPoint("G2 point not in the r-order subgroup")
        return pt, off
    return (G.Fq2(x0, x1), G.Fq2(y0, y1)), off


# ---- Proof / VK ----------------------------------------------------------------

def proof_to_bytes(proof: Proof, E=None) -> bytes:
    return (g1_to_bytes(proof.a, E) + g2_to_bytes(proof.b, E)
            + g1_to_bytes(proof.c, E))


def proof_from_bytes(data: bytes, E=None) -> Proof:
    buf = memoryview(data)
    a, off = g1_from_bytes(buf, 0, E=E)
    b, off = g2_from_bytes(buf, off, E=E)
    c, off = g1_from_bytes(buf, off, E=E)
    if off != len(data):
        raise InvalidPoint("trailing bytes in proof")
    return Proof(a=a, b=b, c=c)


def vk_to_bytes(vk: VK, E=None) -> bytes:
    out = io.BytesIO()
    out.write(g1_to_bytes(vk.alpha, E))
    out.write(g2_to_bytes(vk.beta, E))
    out.write(g2_to_bytes(vk.gamma, E))
    out.write(g2_to_bytes(vk.delta, E))
    out.write(len(vk.ic).to_bytes(4, "little"))  # borsh Vec<u32 len>
    for pt in vk.ic:
        out.write(g1_to_bytes(pt, E))
    return out.getvalue()


def vk_from_bytes(data: bytes, E=None) -> VK:
    buf = memoryview(data)
    alpha, off = g1_from_bytes(buf, 0, E=E)
    beta, off = g2_from_bytes(buf, off, E=E)
    gamma, off = g2_from_bytes(buf, off, E=E)
    delta, off = g2_from_bytes(buf, off, E=E)
    n = int.from_bytes(bytes(buf[off:off + 4]), "little")
    off += 4
    nb2 = 2 * (E or _default_engine()).fq_bytes
    if len(data) - off != n * nb2:
        raise InvalidPoint("vk ic payload length mismatch")
    ic = []
    for _ in range(n):
        pt, off = g1_from_bytes(buf, off, E=E)
        ic.append(pt)
    if off != len(data):
        raise InvalidPoint("trailing bytes in vk")
    return VK(alpha=alpha, beta=beta, gamma=gamma, delta=delta, ic=ic,
              engine=(E or _default_engine()).name)


# ---- witness program <-> bytes -------------------------------------------------
#
# The compiled witness program (WitnessOps + inputize LCs) persists inside
# the Parameters npz, making the artifact self-sufficient like the
# reference's (gate blob + const tracker, mod.rs:139-177): write -> read ->
# prove re-uses the fast compiled-witness path with no circuit callables.
# Hints serialize as (registry name, JSON meta) — see circuit/hints.py.
#
# Format (little-endian): u32 n_ops, u32 n_inputize; per op a u8 kind tag
# then kind-specific payload; LC = u32 nterms + nterms x (32B coeff,
# u64 wire index); indices are the raw Input(i)/AUX_BASE+i encoding of
# circuit/lc.py.

_OP_KINDS = {"mul": 0, "div": 1, "inv_or": 2, "bit": 3, "hint": 4}
_OP_NAMES = {v: k for k, v in _OP_KINDS.items()}


def _lc_to_bytes(lc) -> bytes:
    terms = list(lc)
    out = [len(terms).to_bytes(4, "little")]
    for coeff, idx in terms:
        out.append(int(coeff).to_bytes(32, "little"))
        out.append(int(idx).to_bytes(8, "little"))
    return b"".join(out)


def _lc_from(buf: memoryview, off: int):
    n = int.from_bytes(bytes(buf[off:off + 4]), "little")
    off += 4
    terms = []
    for _ in range(n):
        coeff = int.from_bytes(bytes(buf[off:off + 32]), "little")
        idx = int.from_bytes(bytes(buf[off + 32:off + 40]), "little")
        off += 40
        terms.append((coeff, idx))
    return terms, off


def witness_program_to_bytes(witness_ops: dict, inputize_lcs: list) -> bytes:
    import json

    out = io.BytesIO()
    out.write(len(witness_ops).to_bytes(4, "little"))
    out.write(len(inputize_lcs).to_bytes(4, "little"))
    for op in witness_ops.values():
        kind = _OP_KINDS[op.kind]
        out.write(bytes([kind]))
        outs = op.out if isinstance(op.out, tuple) else (op.out,)
        out.write(len(outs).to_bytes(4, "little"))
        for o in outs:
            out.write(int(o).to_bytes(8, "little"))
        if op.kind in ("mul", "div"):
            out.write(_lc_to_bytes(op.a))
            out.write(_lc_to_bytes(op.b))
            extra = (op.aux or 0) if op.kind == "mul" else 0
            out.write(int(extra).to_bytes(32, "little"))
        elif op.kind == "inv_or":
            out.write(_lc_to_bytes(op.a))
            out.write(int(op.aux).to_bytes(32, "little"))
        elif op.kind == "bit":
            out.write(_lc_to_bytes(op.a))
            out.write(int(op.aux).to_bytes(4, "little"))
        else:  # hint
            name, meta = op.aux
            if callable(meta):
                raise TypeError(
                    f"hint '{name}' metadata is a callable; record hints "
                    "as (name, json-safe meta) via circuit/hints.py"
                )
            out.write(len(op.a).to_bytes(4, "little"))
            for lc in op.a:
                if lc is None:
                    out.write(b"\x00")
                else:
                    out.write(b"\x01")
                    out.write(_lc_to_bytes(lc))
            nb = name.encode()
            mb = json.dumps(meta, sort_keys=True).encode()
            out.write(len(nb).to_bytes(2, "little"))
            out.write(nb)
            out.write(len(mb).to_bytes(2, "little"))
            out.write(mb)
    for lc in inputize_lcs:
        out.write(_lc_to_bytes(lc))
    return out.getvalue()


def witness_program_from_bytes(data: bytes):
    import json

    from ...circuit.cs import WitnessOp

    buf = memoryview(data)
    n_ops = int.from_bytes(bytes(buf[0:4]), "little")
    n_inp = int.from_bytes(bytes(buf[4:8]), "little")
    off = 8
    witness_ops = {}
    for _ in range(n_ops):
        kind = _OP_NAMES[buf[off]]
        off += 1
        n_out = int.from_bytes(bytes(buf[off:off + 4]), "little")
        off += 4
        outs = []
        for _ in range(n_out):
            outs.append(int.from_bytes(bytes(buf[off:off + 8]), "little"))
            off += 8
        if kind in ("mul", "div"):
            a, off = _lc_from(buf, off)
            b, off = _lc_from(buf, off)
            extra = int.from_bytes(bytes(buf[off:off + 32]), "little")
            off += 32
            op = WitnessOp(kind, outs[0], a=a, b=b,
                           aux=extra if kind == "mul" else None)
        elif kind == "inv_or":
            a, off = _lc_from(buf, off)
            aux = int.from_bytes(bytes(buf[off:off + 32]), "little")
            off += 32
            op = WitnessOp(kind, outs[0], a=a, aux=aux)
        elif kind == "bit":
            a, off = _lc_from(buf, off)
            aux = int.from_bytes(bytes(buf[off:off + 4]), "little")
            off += 4
            op = WitnessOp(kind, outs[0], a=a, aux=aux)
        else:  # hint
            n_lcs = int.from_bytes(bytes(buf[off:off + 4]), "little")
            off += 4
            lcs = []
            for _ in range(n_lcs):
                present = buf[off]
                off += 1
                if present:
                    lc, off = _lc_from(buf, off)
                    lcs.append(lc)
                else:
                    lcs.append(None)
            nl = int.from_bytes(bytes(buf[off:off + 2]), "little")
            off += 2
            name = bytes(buf[off:off + nl]).decode()
            off += nl
            ml = int.from_bytes(bytes(buf[off:off + 2]), "little")
            off += 2
            meta = json.loads(bytes(buf[off:off + ml]).decode())
            off += ml
            op = WitnessOp(kind, tuple(outs), a=lcs, aux=(name, meta))
        key = op.out
        witness_ops[key] = op
    inputize_lcs = []
    for _ in range(n_inp):
        lc, off = _lc_from(buf, off)
        inputize_lcs.append(lc)
    assert off == len(data), "trailing bytes in witness program"
    return witness_ops, inputize_lcs


# ---- Parameters <-> npz ---------------------------------------------------------

def _g1s_to_array(pts: List, E=None) -> np.ndarray:
    E = E or _default_engine()
    out = np.zeros((len(pts), 2 * E.fq_bytes), dtype=np.uint8)
    for i, p in enumerate(pts):
        out[i] = np.frombuffer(g1_to_bytes(p, E), dtype=np.uint8)
    return out


def _g1s_from_array(arr: np.ndarray, check: bool = False, E=None) -> List:
    # Bulk proving-key reads validate on-curve only: a scalar-mul subgroup
    # check per point is prohibitively slow in host Python at CRS sizes
    # (same checked/unchecked split as the G2 tables and bellman's
    # Parameters::read, mod.rs:159). Proof/VK reads keep the full check.
    return [g1_from_bytes(memoryview(row.tobytes()), check=check,
                          check_subgroup=False, E=E)[0]
            for row in arr]


def _g2s_to_array(pts: List, E=None) -> np.ndarray:
    E = E or _default_engine()
    out = np.zeros((len(pts), 4 * E.fq_bytes), dtype=np.uint8)
    for i, p in enumerate(pts):
        out[i] = np.frombuffer(g2_to_bytes(p, E), dtype=np.uint8)
    return out


def _g2s_from_array(arr: np.ndarray, check: bool = False, E=None) -> List:
    # Subgroup checks on bulk proving-key tables are prohibitively slow in
    # host Python; `check` gates on-curve validation only (bellman's
    # Parameters::read has the same checked/unchecked split, mod.rs:159).
    return [g2_from_bytes(memoryview(row.tobytes()), check=check,
                          check_subgroup=False, E=E)[0]
            for row in arr]


def _vals_to_array(vals: List[int]) -> np.ndarray:
    out = np.zeros((len(vals), 32), dtype=np.uint8)
    for i, v in enumerate(vals):
        out[i] = np.frombuffer(_fq_to_bytes(v, 32), dtype=np.uint8)
    return out


def _vals_from_array(arr: np.ndarray) -> List[int]:
    return [int.from_bytes(row.tobytes(), "little") for row in arr]


def _template_to_arrays(tmpl, n_txs: int) -> dict:
    """Batch tx template (replicate.py TxTemplate) -> npz entries. The
    replicated R1CS is NOT stored — read_parameters re-stamps it from the
    template (the artifact stays tx-count-sized, not batch-sized; the
    reference has no analog — bellman persists the fully materialized
    system, mod.rs:150-177)."""
    out = {
        "batch_meta": np.asarray([tmpl.G, tmpl.T, n_txs], dtype=np.int64),
        "batch_root_out": np.frombuffer(
            _lc_to_bytes(tmpl.root_out), dtype=np.uint8),
        "batch_witness_program": np.frombuffer(
            witness_program_to_bytes(tmpl.witness_ops, []),
            dtype=np.uint8),
        "batch_const_tracker": np.asarray(
            tmpl.const_tracker, dtype=np.bool_),
    }
    for name, (rows, cols, vals) in zip("abc", tmpl.mats):
        out[f"batch_{name}_rows"] = rows
        out[f"batch_{name}_cols"] = cols
        out[f"batch_{name}_vals"] = _vals_to_array(vals)
    return out


def _template_from_arrays(z, E):
    from ...circuit.rollup import RollupParams
    from .replicate import TxTemplate

    G, T, n_txs = (int(v) for v in z["batch_meta"])
    mats = []
    for name in "abc":
        mats.append((z[f"batch_{name}_rows"], z[f"batch_{name}_cols"],
                     _vals_from_array(z[f"batch_{name}_vals"])))
    root_out, off = _lc_from(memoryview(z["batch_root_out"].tobytes()), 0)
    witness_ops, _ = witness_program_from_bytes(
        z["batch_witness_program"].tobytes())
    if E.name == "bls12_381":
        from ...engines.bls12_381 import jubjub_bls12_381 as jj
    else:
        from ...engines.bn256 import jubjub_bn256 as jj
    tmpl = TxTemplate(
        fld=E.fr, G=G, T=T, mats=tuple(mats), root_out=root_out,
        witness_ops=witness_ops,
        const_tracker=[bool(b) for b in z["batch_const_tracker"]],
        rollup_params=RollupParams.new(E.fr, jj()),
    )
    return tmpl, n_txs


def _query_entries(prefix: str, q, E, g2: bool = False) -> dict:
    """One bulk PK query -> npz entries: device-generated G1Rows/G2Rows
    persist as their raw (N, 2K|4K) uint32 Montgomery row tables (zero
    conversion — this IS the wave-MSM upload format, params.py), host
    point lists as canonical byte rows."""
    from .params import G1Rows

    if isinstance(q, G1Rows):
        return {prefix + "_rows": q.rows}
    return {prefix: (_g2s_to_array if g2 else _g1s_to_array)(q, E)}


def write_parameters(path: str, params: Parameters,
                     compress: Optional[bool] = None) -> None:
    r = params.r1cs
    E = params.E
    from .params import G1Rows

    arrays = dict(
        engine=np.frombuffer(params.engine.encode(), dtype=np.uint8),
        meta=np.asarray(
            [r.num_input, r.num_aux, r.num_constraints, r.domain,
             params.n_public],
            dtype=np.int64,
        ),
        const_tracker=np.asarray(params.const_tracker, dtype=np.bool_),
        vk=np.frombuffer(vk_to_bytes(params.vk, E), dtype=np.uint8),
        pk_alpha_g1=_g1s_to_array([params.pk.alpha_g1], E),
        pk_beta_g1=_g1s_to_array([params.pk.beta_g1], E),
        pk_beta_g2=_g2s_to_array([params.pk.beta_g2], E),
        pk_delta_g1=_g1s_to_array([params.pk.delta_g1], E),
        pk_delta_g2=_g2s_to_array([params.pk.delta_g2], E),
        witness_program=np.frombuffer(
            witness_program_to_bytes(params.witness_ops,
                                     params.inputize_lcs),
            dtype=np.uint8,
        ),
    )
    arrays.update(_query_entries("pk_a_g1", params.pk.a_g1, E))
    arrays.update(_query_entries("pk_b_g1", params.pk.b_g1, E))
    arrays.update(_query_entries("pk_b_g2", params.pk.b_g2, E, g2=True))
    arrays.update(_query_entries("pk_l_g1", params.pk.l_g1, E))
    arrays.update(_query_entries("pk_h_g1", params.pk.h_g1, E))
    if params.batch is not None:
        arrays.update(_template_to_arrays(*params.batch))
    else:
        arrays.update(
            a_rows=r.a_rows, a_cols=r.a_cols,
            a_vals=_vals_to_array(r.a_vals),
            b_rows=r.b_rows, b_cols=r.b_cols,
            b_vals=_vals_to_array(r.b_vals),
            c_rows=r.c_rows, c_cols=r.c_cols,
            c_vals=_vals_to_array(r.c_vals),
        )
    if compress is None:
        # raw Montgomery row tables are incompressible; don't burn
        # minutes of zlib on a multi-GB CRS
        compress = not any(
            isinstance(q, G1Rows)
            for q in (params.pk.a_g1, params.pk.b_g1, params.pk.b_g2,
                      params.pk.l_g1, params.pk.h_g1))
    (np.savez_compressed if compress else np.savez)(path, **arrays)


def read_parameters(path: str, checked: bool = False) -> Parameters:
    """Load Parameters from npz. checked=True validates every proving-key
    point on-curve (bellman's checked read); off by default for speed —
    Proof/VK reads are always validated."""
    z = np.load(path, allow_pickle=False)
    engine = (z["engine"].tobytes().decode() if "engine" in z else "bn256")
    from ...engines.engine import Engine

    E = Engine.get(engine)
    num_input, num_aux, num_constraints, domain, n_public = (
        int(v) for v in z["meta"]
    )
    batch = None
    if "batch_meta" in z:
        from .replicate import replicate_r1cs

        tmpl, n_txs = _template_from_arrays(z, E)
        batch = (tmpl, n_txs)
        r1cs = replicate_r1cs(tmpl, n_txs, E.fr.p)
        assert (r1cs.num_input, r1cs.num_aux, r1cs.num_constraints,
                r1cs.domain) == (num_input, num_aux, num_constraints,
                                 domain), "re-stamped batch R1CS mismatch"
    else:
        r1cs = R1CS(
            num_input=num_input, num_aux=num_aux,
            num_constraints=num_constraints, domain=domain,
            a_rows=z["a_rows"], a_cols=z["a_cols"],
            a_vals=_vals_from_array(z["a_vals"]),
            b_rows=z["b_rows"], b_cols=z["b_cols"],
            b_vals=_vals_from_array(z["b_vals"]),
            c_rows=z["c_rows"], c_cols=z["c_cols"],
            c_vals=_vals_from_array(z["c_vals"]),
        )

    def query(prefix: str, g2: bool = False):
        """Bulk query: raw device row tables round-trip as-is."""
        if prefix + "_rows" in z:
            from .params import G1Rows, G2Rows

            rows = z[prefix + "_rows"]
            if g2:
                return G2Rows(rows, E.fq,
                              quad_cls=getattr(E.g, "Fq2", None))
            return G1Rows(rows, E.fq)
        return (_g2s_from_array if g2 else _g1s_from_array)(
            z[prefix], checked, E)

    vk = vk_from_bytes(z["vk"].tobytes(), E)
    pk = ProvingKey(
        alpha_g1=_g1s_from_array(z["pk_alpha_g1"], checked, E)[0],
        beta_g1=_g1s_from_array(z["pk_beta_g1"], checked, E)[0],
        beta_g2=_g2s_from_array(z["pk_beta_g2"], checked, E)[0],
        delta_g1=_g1s_from_array(z["pk_delta_g1"], checked, E)[0],
        delta_g2=_g2s_from_array(z["pk_delta_g2"], checked, E)[0],
        a_g1=query("pk_a_g1"),
        b_g1=query("pk_b_g1"),
        b_g2=query("pk_b_g2", g2=True),
        l_g1=query("pk_l_g1"),
        h_g1=query("pk_h_g1"),
    )
    witness_ops, inputize_lcs = {}, []
    if "witness_program" in z:
        witness_ops, inputize_lcs = witness_program_from_bytes(
            z["witness_program"].tobytes()
        )
    return Parameters(
        vk=vk, pk=pk, r1cs=r1cs,
        const_tracker=[bool(b) for b in z["const_tracker"]],
        witness_ops=witness_ops, n_public=n_public,
        inputize_lcs=inputize_lcs, engine=engine,
        batch=batch,
    )
