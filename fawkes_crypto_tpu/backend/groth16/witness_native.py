"""ctypes binding + program compiler for the native witness evaluator
(native_ext/witness.cpp).

The reference replays its circuit in compiled Rust per proof
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/prover.rs:69-74);
witness.py's WitnessProgram is our semantic equivalent but interprets the
op list with Python ints (~0.5 s per rollup tx). This module lowers the
same op list once into flat arrays (coeffs in Montgomery form, wire
indices resolved to dense slots) and evaluates it in C++ —
~100x faster — with bit-equality against the Python evaluator asserted in
tests/test_witness_native.py. Jubjub hints (circuit/hints.py) run natively
in C++; unknown hints call back into Python.

Batch mode (the rollup template, replicate.py) additionally returns the
aux matrix as canonical little-endian bytes that reinterpret directly as
the device's 16-bit limb layout (ff/limbs.py) — witness bytes flow to the
TPU without ever materializing Python ints.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ...circuit.lc import AUX_BASE

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
_SRC = os.path.join(_REPO_ROOT, "native_ext", "witness.cpp")
_SO = os.path.join(_REPO_ROOT, "native_ext", "libfawkes_witness.so")

_lock = threading.Lock()
_lib = None
_tried = False

_u64p = ctypes.POINTER(ctypes.c_uint64)
_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)

HINT_CB = ctypes.CFUNCTYPE(None, ctypes.c_int64, _u64p, ctypes.c_int32,
                           _u64p, ctypes.c_int32)

_NATIVE_HINTS = {
    "jubjub_mul_inv8": 1,
    "jubjub_decompress_inv8": 2,
    "montgomery_get_y": 3,
}
_CALLBACK_BASE = 100


class _WField(ctypes.Structure):
    _fields_ = [
        ("mod", ctypes.c_uint64 * 4),
        ("inv", ctypes.c_uint64),
        ("r1", ctypes.c_uint64 * 4),
        ("r2", ctypes.c_uint64 * 4),
        ("t_odd", ctypes.c_uint64 * 4),
        ("t_half", ctypes.c_uint64 * 4),
        ("s", ctypes.c_uint32),
        ("sqrt_z", ctypes.c_uint64 * 4),
    ]


class _WJubjub(ctypes.Structure):
    _fields_ = [
        ("d", ctypes.c_uint64 * 4),
        ("u", ctypes.c_uint64 * 4),
        ("fs_mod", ctypes.c_uint64 * 4),
        ("inv8", ctypes.c_uint64 * 4),
        ("gx", ctypes.c_uint64 * 4),
        ("gy", ctypes.c_uint64 * 4),
    ]


class _WProgram(ctypes.Structure):
    _fields_ = [
        ("n_ops", ctypes.c_int64),
        ("kind", _i32p),
        ("out", _i64p),
        ("a_off", _i64p),
        ("a_len", _i32p),
        ("b_off", _i64p),
        ("b_len", _i32p),
        ("aux", _u64p),
        ("term_coeff", _u64p),
        ("term_idx", _i64p),
        ("term_is_one", _u8p),
        ("hlc_off", _i64p),
        ("hlc_len", _i32p),
        ("hout_idx", _i64p),
        ("n_vals", ctypes.c_int64),
        ("n_in", ctypes.c_int64),
        ("n_aux", ctypes.c_int64),
        ("ext_slots", _i64p),
        ("n_ext", ctypes.c_int64),
        ("hint_data", _u64p),
    ]


def _build() -> bool:
    try:
        if (os.path.exists(_SO)
                and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
            return True
        r = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-o",
             _SO + ".tmp", _SRC],
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
            l.fawkes_wit_eval.argtypes = [
                ctypes.POINTER(_WField), ctypes.POINTER(_WProgram),
                ctypes.POINTER(_WJubjub), _u64p, _u64p, ctypes.c_int32,
                _u64p, HINT_CB]
            l.fawkes_wit_eval.restype = ctypes.c_int
            l.fawkes_wit_eval_batch.argtypes = [
                ctypes.POINTER(_WField), ctypes.POINTER(_WProgram),
                ctypes.POINTER(_WJubjub), ctypes.c_int64, _u64p, _u64p,
                ctypes.c_int64, ctypes.c_int32, _u64p, _u64p, _u64p,
                ctypes.c_int32, HINT_CB]
            l.fawkes_wit_eval_batch.restype = ctypes.c_int
            _lib = l
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    if os.environ.get("FAWKES_NATIVE_WITNESS", "1") in ("0", ""):
        return False
    return lib() is not None


# ---- helpers ---------------------------------------------------------------

def _fe_words(x: int) -> Tuple[int, int, int, int]:
    return (x & 0xFFFFFFFFFFFFFFFF, (x >> 64) & 0xFFFFFFFFFFFFFFFF,
            (x >> 128) & 0xFFFFFFFFFFFFFFFF, (x >> 192) & 0xFFFFFFFFFFFFFFFF)


def _ints_to_u64(vals: Sequence[int]) -> np.ndarray:
    """Canonical ints -> (n, 4) uint64 LE words."""
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u8").reshape(-1, 4)


def _u64_to_ints(arr: np.ndarray) -> List[int]:
    b = arr.astype("<u8", copy=False).tobytes()
    return [int.from_bytes(b[i * 32:(i + 1) * 32], "little")
            for i in range(len(b) // 32)]


def _field_struct(fld) -> _WField:
    fp = _WField()
    fp.mod[:] = _fe_words(fld.p)
    fp.inv = fld.inv64
    fp.r1[:] = _fe_words(fld.R)
    fp.r2[:] = _fe_words(fld.R2)
    fp.t_odd[:] = _fe_words(fld.t_odd)
    fp.t_half[:] = _fe_words((fld.t_odd + 1) // 2)
    fp.s = fld.s
    z = 2
    while fld.legendre(z) != -1:
        z += 1
    fp.sqrt_z[:] = _fe_words(z)
    return fp


def _jubjub_struct(params) -> _WJubjub:
    fr = params.fr
    jj = _WJubjub()
    jj.d[:] = _fe_words(fr.to_mont(params.edwards_d.x))
    jj.u[:] = _fe_words(fr.to_mont(params.montgomery_u.x))
    jj.fs_mod[:] = _fe_words(params.fs.p)
    jj.inv8[:] = _fe_words(pow(8, -1, params.fs.p))
    jj.gx[:] = _fe_words(fr.to_mont(params.edwards_g.x.x))
    jj.gy[:] = _fe_words(fr.to_mont(params.edwards_g.y.x))
    return jj


def _np_ptr(arr: np.ndarray, ptr_type):
    return arr.ctypes.data_as(ptr_type)


class NativeProgram:
    """One compiled witness program; wraps WitnessProgram's op list.

    n_extra: number of pseudo-input wires after ONE that LC terms may
    reference (1 for the batch tx template's running root)."""

    def __init__(self, wp, n_extra: int = 0,
                 root_lc: Optional[list] = None):
        self.wp = wp
        self.fld = wp.fr
        self.n_in = 1 + n_extra
        self.n_aux = wp.num_aux
        self.n_vals = self.n_in + self.n_aux
        self.callback_hints: List[Tuple[str, tuple]] = []
        self._jubjub = None
        self._reads_extra = False
        self._compile(root_lc or [])
        self.field = _field_struct(self.fld)
        self.jubjub = self._jubjub if self._jubjub is not None else _WJubjub()
        self._cb = self._make_cb()

    # -- compilation ---------------------------------------------------------
    def _slot(self, idx: int) -> int:
        if idx >= AUX_BASE:
            return self.n_in + (idx - AUX_BASE)
        assert 0 <= idx < self.n_in, f"input wire {idx} out of range"
        if idx >= 1:
            self._reads_extra = True
        return idx

    def _compile(self, root_lc):
        p = self.fld.p
        R = self.fld.R
        kinds, outs = [], []
        a_offs, a_lens, b_offs, b_lens = [], [], [], []
        auxs: List[int] = []  # mont/canonical payload ints, 1 per op
        t_coeffs: List[int] = []
        t_idxs: List[int] = []
        hlc_offs, hlc_lens = [], []
        hout_idxs: List[int] = []

        # -- LC-level CSE pre-pass ------------------------------------------
        # The recorded op list flattens every input to a full LC, so a wide
        # poseidon-lane LC is re-evaluated by sigma's three muls and a bit
        # decomposition re-evaluates its source LC once per bit (~40
        # terms/op on the rollup template). Any LC (>= 2 terms) referenced
        # more than once is materialized ONCE into a scratch slot by an
        # OP_LIN and ops reference the slot — the same value-propagation
        # cost profile as the reference's DSL replay (prover.rs:69-74).
        def lc_key(lc):
            return tuple((c % p, ix) for c, ix in lc)

        use_count: dict = {}

        def count(lc):
            k = lc_key(lc)
            use_count[k] = use_count.get(k, 0) + 1

        for _, op in self.wp.ops:
            if op.kind == "hint":
                for lc in op.a:
                    count(lc)
            else:
                count(op.a)
                if op.kind in ("mul", "div"):
                    count(op.b)

        n_wires = self.n_in + self.n_aux
        scratch_of: dict = {}  # lc key -> scratch slot
        self._blob_offsets: dict = {}
        self._blob_parts: List[np.ndarray] = []
        self._blob_len = 0

        def push_terms(pairs) -> Tuple[int, int]:
            """pairs: (canonical coeff, value slot)."""
            off = len(t_idxs)
            for coeff, slot in pairs:
                t_coeffs.append(coeff * R % p)
                t_idxs.append(slot)
            return off, len(t_idxs) - off

        # chain registry for incremental CSE: gadget accumulators (ecmul
        # running coordinates, bit recompositions) evolve as affine
        # combinations of one or two recent wide LCs plus a few fresh
        # wires. Greedy exact peeling: subtract alpha * candidate from
        # the remainder whenever it strictly shrinks it; whatever is left
        # is the residual. The emitted OP_LIN is exact by construction —
        # peeling only changes how many terms it takes to express.
        CHAIN_MIN = 8
        chains: dict = {}  # lowest wire -> list of (terms, map, slot)

        def _try_combo(rem, combo):
            """combo: [(coeff_map, slot, alpha)]. Returns shrunk remainder
            or None if not profitable. Exact subtraction — never wrong,
            only possibly unhelpful."""
            trial = dict(rem)
            for cmap, _, alpha in combo:
                for ix, c in cmap.items():
                    v = (trial.get(ix, 0) - alpha * c) % p
                    if v:
                        trial[ix] = v
                    else:
                        trial.pop(ix, None)
            if len(trial) + len(combo) + 2 < len(rem):
                return trial
            return None

        def materialize(k) -> int:
            slot = scratch_of.get(k)
            if slot is not None:
                return slot
            parts = []
            rem = {ix: c for c, ix in k}
            if len(k) >= CHAIN_MIN:
                cands = chains.get(k[0][1], [])[-4:]
                hit = None
                # pairs first (ladder steps combine two live accumulators)
                for a_i in range(len(cands) - 1, -1, -1):
                    if hit:
                        break
                    k1, m1, s1 = cands[a_i]
                    w0, w1 = k1[0][1], k1[1][1]
                    if w0 not in rem or w1 not in rem:
                        continue
                    for b_i in range(len(cands) - 1, -1, -1):
                        if b_i == a_i:
                            continue
                        k2, m2, s2 = cands[b_i]
                        det = (m1[w0] * m2.get(w1, 0)
                               - m1[w1] * m2.get(w0, 0)) % p
                        if det == 0:
                            continue
                        dinv = pow(det, -1, p)
                        al = ((rem[w0] * m2.get(w1, 0)
                               - rem[w1] * m2.get(w0, 0)) * dinv) % p
                        be = ((m1[w0] * rem[w1]
                               - m1[w1] * rem[w0]) * dinv) % p
                        trial = _try_combo(
                            rem, [(m1, s1, al), (m2, s2, be)])
                        if trial is not None:
                            hit = (trial, [(al, s1), (be, s2)])
                            break
                if hit is None:
                    # single proportional candidate (pure-growth chains)
                    for k1, m1, s1 in reversed(cands):
                        w0 = k1[0][1]
                        if w0 not in rem:
                            continue
                        al = rem[w0] * pow(m1[w0], -1, p) % p
                        trial = _try_combo(rem, [(m1, s1, al)])
                        if trial is not None:
                            hit = (trial, [(al, s1)])
                            break
                if hit is not None:
                    rem, parts = hit[0], hit[1]
            slot = n_wires + len(scratch_of)
            scratch_of[k] = slot
            pairs = parts + [(rem[ix], self._slot(ix))
                             for ix in sorted(rem)]
            o, l = push_terms(pairs)
            kinds.append(5)  # OP_LIN
            outs.append(slot)
            a_offs.append(o)
            a_lens.append(l)
            b_offs.append(0)
            b_lens.append(0)
            auxs.append(0)
            if len(k) >= CHAIN_MIN:
                bucket = chains.setdefault(k[0][1], [])
                bucket.append((k, {ix: c for c, ix in k}, slot))
                if len(bucket) > 6:
                    bucket.pop(0)
            return slot

        def push_lc(lc) -> Tuple[int, int]:
            k = lc_key(lc)
            wide = len(k) >= CHAIN_MIN
            if (len(k) >= 2 and use_count.get(k, 0) >= 2) or wide:
                return push_terms([(1, materialize(k))])
            return push_terms((c, self._slot(ix)) for c, ix in lc)

        KIND = {"mul": 0, "div": 1, "inv_or": 2, "bit": 3, "hint": 4}
        for first, op in self.wp.ops:
            if op.kind == "hint":
                name, meta = op.aux
                hid = self._hint_id(name, meta)
                ao = len(hlc_offs)
                for lc in op.a:
                    o, l = push_lc(lc)
                    hlc_offs.append(o)
                    hlc_lens.append(l)
                a_off, a_len = ao, len(op.a)
                bo = len(hout_idxs)
                for out_idx in op.out:
                    hout_idxs.append(self.n_in + (out_idx - AUX_BASE))
                b_off, b_len = bo, len(op.out)
                aux_val = hid
                if (hid & 0xFFFFFFFFFFFFFFFF) != 4:  # poseidon is unbounded
                    assert len(op.a) <= 16 and len(op.out) <= 16, \
                        "hint arity exceeds the native evaluator's buffers"
            else:
                a_off, a_len = push_lc(op.a)
                if op.kind in ("mul", "div"):
                    b_off, b_len = push_lc(op.b)
                else:
                    b_off, b_len = 0, 0
                if op.kind == "mul":
                    aux_val = (op.aux or 0) * R % p
                elif op.kind == "inv_or":
                    aux_val = (op.aux % p) * R % p
                elif op.kind == "bit":
                    aux_val = op.aux
                else:
                    aux_val = 0
            kinds.append(KIND[op.kind])
            outs.append(self.n_in + first)
            a_offs.append(a_off)
            a_lens.append(a_len)
            b_offs.append(b_off)
            b_lens.append(b_len)
            auxs.append(aux_val)
        self.n_scratch = len(scratch_of)
        self.n_vals = n_wires + self.n_scratch

        # Copies are value-independent iff no OP reads a pseudo-input wire
        # (snapshot before the root LC below — the chain itself reading the
        # previous root is sequentialized separately in eval_batch).
        self._ops_read_extra = self._reads_extra

        # root-out LC appended at the tail of the term arrays (batch mode);
        # eval_batch resolves slot 0 (ONE) and slot 1 (prev root) specially
        self.root_off = len(t_idxs)
        for coeff, idx in root_lc:
            t_coeffs.append(coeff * R % p)
            t_idxs.append(self._slot(idx))
        self.root_len = len(t_idxs) - self.root_off

        self._kind = np.asarray(kinds, dtype=np.int32)
        self._out = np.asarray(outs, dtype=np.int64)
        self._a_off = np.asarray(a_offs, dtype=np.int64)
        self._a_len = np.asarray(a_lens, dtype=np.int32)
        self._b_off = np.asarray(b_offs, dtype=np.int64)
        self._b_len = np.asarray(b_lens, dtype=np.int32)
        self._aux = _ints_to_u64(auxs).reshape(-1) if auxs else \
            np.zeros(0, dtype="<u8")
        self._term_coeff = (_ints_to_u64(t_coeffs).reshape(-1)
                            if t_coeffs else np.zeros(0, dtype="<u8"))
        self._term_idx = np.asarray(t_idxs, dtype=np.int64)
        self._term_is_one = np.asarray(
            [1 if c == R else 0 for c in t_coeffs], dtype=np.uint8)
        self._hlc_off = np.asarray(hlc_offs, dtype=np.int64)
        self._hlc_len = np.asarray(hlc_lens, dtype=np.int32)
        self._hout_idx = np.asarray(hout_idxs, dtype=np.int64)
        self._ext_slots = np.asarray(
            [self.n_in + i for i in self.wp.external], dtype=np.int64)

        pr = _WProgram()
        pr.n_ops = len(kinds)
        pr.kind = _np_ptr(self._kind, _i32p)
        pr.out = _np_ptr(self._out, _i64p)
        pr.a_off = _np_ptr(self._a_off, _i64p)
        pr.a_len = _np_ptr(self._a_len, _i32p)
        pr.b_off = _np_ptr(self._b_off, _i64p)
        pr.b_len = _np_ptr(self._b_len, _i32p)
        pr.aux = _np_ptr(self._aux, _u64p)
        pr.term_coeff = _np_ptr(self._term_coeff, _u64p)
        pr.term_idx = _np_ptr(self._term_idx, _i64p)
        pr.term_is_one = _np_ptr(self._term_is_one, _u8p)
        pr.hlc_off = _np_ptr(self._hlc_off, _i64p)
        pr.hlc_len = _np_ptr(self._hlc_len, _i32p)
        pr.hout_idx = _np_ptr(self._hout_idx, _i64p)
        pr.n_vals = self.n_vals
        pr.n_in = self.n_in
        pr.n_aux = self.n_aux
        pr.ext_slots = _np_ptr(self._ext_slots, _i64p)
        pr.n_ext = len(self._ext_slots)
        self._hint_data = (np.concatenate(self._blob_parts)
                           if self._blob_parts
                           else np.zeros(1, dtype="<u8"))
        pr.hint_data = _np_ptr(self._hint_data, _u64p)
        self.program = pr

    def _poseidon_blob_off(self, meta) -> Optional[int]:
        """Build (or reuse) the poseidon params blob for the native
        H_POSEIDON hint: [t, f, p, const_mask, c mont, m mont]."""
        from ...native.poseidon import PoseidonParams

        t, f, p = meta["t"], meta["f"], meta["p"]
        salt = meta.get("salt", "")
        if t > 8:
            return None
        mask = 0
        for i, b in enumerate(meta["in_const"]):
            if b:
                mask |= 1 << i
        key = (t, f, p, salt, mask)
        off = self._blob_offsets.get(key)
        if off is None:
            params = PoseidonParams.new_with_salt(self.fld, t, f, p, salt)
            tm = self.fld.to_mont
            elems = [tm(v.x) for row in params.c for v in row]
            elems += [tm(v.x) for row in params.m for v in row]
            blob = np.concatenate([
                np.asarray([t, f, p, mask], dtype="<u8"),
                _ints_to_u64(elems).reshape(-1),
            ])
            off = self._blob_len
            self._blob_offsets[key] = off
            self._blob_parts.append(blob)
            self._blob_len += len(blob)
        return off

    def _hint_id(self, name: str, meta) -> int:
        if name == "poseidon_perm" and isinstance(meta, dict):
            off = self._poseidon_blob_off(meta)
            if off is not None:
                return 4 | (off << 64)
        if name in _NATIVE_HINTS and isinstance(meta, dict) \
                and "curve" in meta:
            from ...circuit.hints import _jubjub

            params = _jubjub(meta)
            if params.fr.p == self.fld.p:
                jj = _jubjub_struct(params)
                if self._jubjub is None:
                    self._jubjub = jj
                if bytes(self._jubjub) == bytes(jj):
                    return _NATIVE_HINTS[name]
        self.callback_hints.append((name, meta))
        return _CALLBACK_BASE + len(self.callback_hints) - 1

    def _make_cb(self):
        fld = self.fld
        hints = self.callback_hints

        def cb(hint_id, ins, n_ins, outs, n_outs):
            from ...circuit.hints import resolve_hint
            from ...ff.hostfield import Num

            name, meta = hints[hint_id]
            vals = []
            for i in range(n_ins):
                x = 0
                for w in range(4):
                    x |= ins[i * 4 + w] << (64 * w)
                vals.append(Num(fld, x))
            res = resolve_hint(name)(meta, vals)
            if not isinstance(res, (tuple, list)):
                res = (res,)
            for i, v in enumerate(res[:n_outs]):
                x = (v.x if isinstance(v, Num) else int(v)) % fld.p
                for w in range(4):
                    outs[i * 4 + w] = (x >> (64 * w)) & 0xFFFFFFFFFFFFFFFF

        return HINT_CB(cb)

    @property
    def parallel_safe(self) -> bool:
        """Copies are value-independent iff no op reads a pseudo-input."""
        return not self._ops_read_extra

    # -- evaluation ----------------------------------------------------------
    def eval_raw(self, ext_vals: Sequence[int],
                 extra_inputs: Sequence[int] = ()) -> np.ndarray:
        """-> (n_vals, 4) uint64 canonical slots [inputs..., aux...]."""
        l = lib()
        assert l is not None
        assert len(ext_vals) == len(self._ext_slots)
        ext = np.ascontiguousarray(_ints_to_u64(list(ext_vals))) \
            if len(ext_vals) else np.zeros((0, 4), dtype="<u8")
        extra = np.ascontiguousarray(_ints_to_u64(list(extra_inputs))) \
            if len(extra_inputs) else np.zeros((0, 4), dtype="<u8")
        assert 1 + len(extra_inputs) <= self.n_in
        out = np.zeros((self.n_vals, 4), dtype="<u8")
        rc = l.fawkes_wit_eval(
            ctypes.byref(self.field), ctypes.byref(self.program),
            ctypes.byref(self.jubjub), _np_ptr(ext, _u64p),
            _np_ptr(extra, _u64p), len(extra_inputs),
            _np_ptr(out, _u64p), self._cb)
        assert rc == 0
        return out

    def eval_aux(self, ext_vals: Sequence[int],
                 extra_inputs: Sequence[int] = ()) -> List[int]:
        """Aux wire values as canonical ints (WitnessProgram contract)."""
        out = self.eval_raw(ext_vals, extra_inputs)
        return _u64_to_ints(out[self.n_in:self.n_in + self.n_aux])

    def eval_batch_raw(self, ext_vals: np.ndarray, root_in: int,
                       parallel: Optional[bool] = None,
                       want_mont: bool = False):
        """ext_vals: (n_txs, n_ext, 4) uint64 canonical. Returns
        (aux (n_txs*n_aux, 4) uint64 canonical, roots (n_txs+1, 4)) and,
        with want_mont, additionally the MONTGOMERY-form aux — the h
        pipeline's native input, skipping any device to_mont pass."""
        l = lib()
        assert l is not None
        n_txs = ext_vals.shape[0]
        assert ext_vals.shape[1] == len(self._ext_slots)
        ext = np.ascontiguousarray(ext_vals, dtype="<u8")
        aux = np.zeros((n_txs * self.n_aux, 4), dtype="<u8")
        aux_mont = (np.zeros((n_txs * self.n_aux, 4), dtype="<u8")
                    if want_mont else None)
        roots = np.zeros((n_txs + 1, 4), dtype="<u8")
        ri = np.ascontiguousarray(_ints_to_u64([root_in]))
        if parallel is None:
            parallel = self.parallel_safe
        rc = l.fawkes_wit_eval_batch(
            ctypes.byref(self.field), ctypes.byref(self.program),
            ctypes.byref(self.jubjub), n_txs, _np_ptr(ext, _u64p),
            _np_ptr(ri, _u64p), self.root_off, self.root_len,
            _np_ptr(aux, _u64p),
            _np_ptr(aux_mont, _u64p) if want_mont else None,
            _np_ptr(roots, _u64p),
            1 if parallel else 0, self._cb)
        assert rc == 0
        if want_mont:
            return aux, roots, aux_mont
        return aux, roots


def limbs_from_u64(arr: np.ndarray, k: int = 16) -> np.ndarray:
    """(n, 4) uint64 canonical LE -> (n, k) uint32 16-bit limbs — the
    device encoding of ff/limbs.py, produced by pure reinterpretation."""
    u16 = arr.reshape(-1, 4).view("<u2")  # (n, 16)
    return u16[:, :k].astype(np.uint32)
