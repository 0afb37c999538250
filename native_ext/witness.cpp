// Native witness-program evaluator: the compiled-replay engine.
//
// Role: the reference re-executes its circuit DSL in compiled Rust for
// every proof (/root/reference/fawkes-crypto/src/backend/bellman_groth16/
// prover.rs:69-74 — WitnessCS replay). Our BuildCS records a typed op list
// instead (circuit/cs.py WitnessOp); this file evaluates that op list at
// native speed over a runtime-modulus 4x64 Montgomery field, so witness
// generation for the 1024-tx rollup drops from ~0.5 s/tx (Python ints) to
// ~ms/tx. Bit-equality with the Python evaluator
// (backend/groth16/witness.py WitnessProgram.evaluate) is asserted in
// tests/test_witness_native.py.
//
// Op semantics (must match witness.py exactly):
//   mul    out = <a,z> * <b,z> + aux
//   div    out = <a,z> / <b,z>, 0 if b == 0
//   inv_or out = <a,z>^-1 if nonzero else aux
//   bit    out = bit `aux` of canonical <a,z>
//   hint   outs = hint fn(values of input LCs); jubjub hints
//          (circuit/hints.py) are implemented natively below, unknown
//          hints call back into Python.
//
// The field is a runtime parameter (modulus/INV/R2 from ff/hostfield.py),
// so the same library serves BN254 Fr and BLS12-381 Fr (both < 2^256).
// All ABI values are 4x u64 little-endian; canonical at the boundary,
// Montgomery inside.
//
// Build: g++ -O3 -shared -fPIC -fopenmp -o libfawkes_witness.so witness.cpp

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using i64 = int64_t;
using i32 = int32_t;
using u8 = uint8_t;
using u32 = uint32_t;
using u128 = unsigned __int128;

struct WField {
  u64 mod[4];
  u64 inv;     // -mod^-1 mod 2^64
  u64 r1[4];   // R mod p   (Montgomery ONE)
  u64 r2[4];   // R^2 mod p
  u64 t_odd[4];  // (p-1) >> s
  u64 t_half[4]; // (t_odd+1)/2
  u32 s;         // 2-adicity
  u64 sqrt_z[4]; // smallest quadratic non-residue, canonical
};

struct Fe { u64 v[4]; };

static inline int cmp4(const u64 *a, const u64 *b) {
  for (int i = 3; i >= 0; --i) {
    if (a[i] < b[i]) return -1;
    if (a[i] > b[i]) return 1;
  }
  return 0;
}

static inline u64 add4(u64 *r, const u64 *a, const u64 *b) {
  u128 c = 0;
  for (int i = 0; i < 4; ++i) {
    c += (u128)a[i] + b[i];
    r[i] = (u64)c;
    c >>= 64;
  }
  return (u64)c;
}

static inline u64 sub4(u64 *r, const u64 *a, const u64 *b) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a[i] - b[i] - borrow;
    r[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  return (u64)borrow;
}

static inline bool is_zero4(const u64 *a) {
  return (a[0] | a[1] | a[2] | a[3]) == 0;
}

struct Ctx {
  const WField *f;
  Fe one;   // R
  Fe zero;

  inline Fe add(const Fe &a, const Fe &b) const {
    Fe r;
    u64 carry = add4(r.v, a.v, b.v);
    if (carry || cmp4(r.v, f->mod) >= 0) sub4(r.v, r.v, f->mod);
    return r;
  }
  inline Fe sub(const Fe &a, const Fe &b) const {
    Fe r;
    if (sub4(r.v, a.v, b.v)) add4(r.v, r.v, f->mod);
    return r;
  }
  inline Fe neg(const Fe &a) const {
    if (is_zero4(a.v)) return a;
    Fe r;
    sub4(r.v, f->mod, a.v);
    return r;
  }
  // CIOS Montgomery multiplication
  inline Fe mul(const Fe &a, const Fe &b) const {
    const u64 *m = f->mod;
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
      u128 c = 0;
      for (int j = 0; j < 4; ++j) {
        c += (u128)a.v[i] * b.v[j] + t[j];
        t[j] = (u64)c;
        c >>= 64;
      }
      c += t[4];
      t[4] = (u64)c;
      t[5] = (u64)(c >> 64);
      u64 k = t[0] * f->inv;
      c = (u128)k * m[0] + t[0];
      c >>= 64;
      for (int j = 1; j < 4; ++j) {
        c += (u128)k * m[j] + t[j];
        t[j - 1] = (u64)c;
        c >>= 64;
      }
      c += t[4];
      t[3] = (u64)c;
      t[4] = t[5] + (u64)(c >> 64);
      t[5] = 0;
    }
    Fe r;
    if (t[4] || cmp4(t, m) >= 0) sub4(r.v, t, m);
    else memcpy(r.v, t, 32);
    return r;
  }
  inline Fe sqr(const Fe &a) const { return mul(a, a); }
  inline Fe to_mont(const Fe &a) const {
    Fe r2;
    memcpy(r2.v, f->r2, 32);
    return mul(a, r2);
  }
  inline Fe from_mont(const Fe &a) const {
    Fe one_raw = {{1, 0, 0, 0}};
    return mul(a, one_raw);
  }
  // square-and-multiply, exponent canonical 4x64 (MSB-first)
  Fe pow(const Fe &base, const u64 *e) const {
    Fe r = one;
    bool started = false;
    for (int w = 3; w >= 0; --w) {
      for (int b = 63; b >= 0; --b) {
        if (started) r = sqr(r);
        if ((e[w] >> b) & 1) {
          if (started) r = mul(r, base);
          else { r = base; started = true; }
        }
      }
    }
    return r;  // e == 0 -> one
  }
  // binary extended Euclid: canonical a != 0 -> canonical a^-1 mod p
  Fe inv_canonical(const Fe &a) const {
    const u64 *p = f->mod;
    u64 u[4], v[4], x1[5], x2[5];
    memcpy(u, a.v, 32);
    memcpy(v, p, 32);
    memset(x1, 0, 40);
    memset(x2, 0, 40);
    x1[0] = 1;
    auto half = [&](u64 *x) {
      // x (5 words, < 2p) -> x/2, adding p first if odd
      if (x[0] & 1) {
        u128 c = 0;
        for (int i = 0; i < 4; ++i) {
          c += (u128)x[i] + p[i];
          x[i] = (u64)c;
          c >>= 64;
        }
        x[4] += (u64)c;
      }
      for (int i = 0; i < 4; ++i) x[i] = (x[i] >> 1) | (x[i + 1] << 63);
      x[4] >>= 1;
    };
    auto modsub = [&](u64 *x, const u64 *y) {
      // x = (x - y) mod p, both < p stored in 5 words (word 4 == 0)
      u128 borrow = 0;
      for (int i = 0; i < 4; ++i) {
        u128 d = (u128)x[i] - y[i] - borrow;
        x[i] = (u64)d;
        borrow = (d >> 64) & 1;
      }
      if (borrow) {
        u128 c = 0;
        for (int i = 0; i < 4; ++i) {
          c += (u128)x[i] + p[i];
          x[i] = (u64)c;
          c >>= 64;
        }
      }
      x[4] = 0;
    };
    auto is_one = [](const u64 *x) {
      return x[0] == 1 && (x[1] | x[2] | x[3]) == 0;
    };
    while (!is_one(u) && !is_one(v)) {
      while (!(u[0] & 1)) {
        for (int i = 0; i < 3; ++i) u[i] = (u[i] >> 1) | (u[i + 1] << 63);
        u[3] >>= 1;
        half(x1);
      }
      while (!(v[0] & 1)) {
        for (int i = 0; i < 3; ++i) v[i] = (v[i] >> 1) | (v[i + 1] << 63);
        v[3] >>= 1;
        half(x2);
      }
      if (cmp4(u, v) >= 0) {
        sub4(u, u, v);
        modsub(x1, x2);
      } else {
        sub4(v, v, u);
        modsub(x2, x1);
      }
    }
    Fe r;
    memcpy(r.v, is_one(u) ? x1 : x2, 32);
    // reduce (half() may leave it in [0, 2p) conceptually, but modsub
    // normalizes below p; still guard)
    if (cmp4(r.v, p) >= 0) sub4(r.v, r.v, p);
    return r;
  }
  // Montgomery-form inverse: 0 -> 0
  Fe inv(const Fe &a) const {
    if (is_zero4(a.v)) return zero;
    Fe c = from_mont(a);
    Fe i = inv_canonical(c);
    return to_mont(i);
  }
  // legendre: 1 QR, -1 NQR, 0 zero  (operand in Montgomery form)
  int legendre(const Fe &a) const {
    if (is_zero4(a.v)) return 0;
    // (p-1)/2 = t_odd * 2^(s-1): exponent = (p-1)/2 canonical
    u64 e[4];
    memcpy(e, f->mod, 32);
    // (p-1)/2: p odd
    e[0] -= 1;
    for (int i = 0; i < 3; ++i) e[i] = (e[i] >> 1) | (e[i + 1] << 63);
    e[3] >>= 1;
    Fe r = pow(a, e);
    return cmp4(r.v, one.v) == 0 ? 1 : -1;
  }
  // Tonelli-Shanks matching ff/hostfield.py sqrt() exactly (same z, same
  // loop), so hint outputs are bit-identical to the Python oracle.
  bool sqrt(const Fe &a, Fe *out) const {
    if (is_zero4(a.v)) { *out = zero; return true; }
    if (legendre(a) != 1) return false;
    if ((f->mod[0] & 3) == 3) {
      // (p+1)/4
      u64 e[4];
      u64 carry = 1;
      for (int i = 0; i < 4; ++i) {
        u128 c = (u128)f->mod[i] + (i == 0 ? carry : 0);
        e[i] = (u64)c;
        carry = (u64)(c >> 64);
      }
      // >> 2 (p+1 < 2^256 for our fields)
      for (int i = 0; i < 3; ++i) e[i] = (e[i] >> 2) | (e[i + 1] << 62);
      e[3] >>= 2;
      *out = pow(a, e);
      return true;
    }
    Fe zf = {{f->sqrt_z[0], f->sqrt_z[1], f->sqrt_z[2], f->sqrt_z[3]}};
    Fe c = pow(to_mont(zf), f->t_odd);
    Fe x = pow(a, f->t_half);
    Fe t = pow(a, f->t_odd);
    u32 m = f->s;
    while (cmp4(t.v, one.v) != 0) {
      Fe t2 = t;
      u32 i = 0;
      while (cmp4(t2.v, one.v) != 0) {
        t2 = sqr(t2);
        ++i;
      }
      Fe b = c;
      for (u32 k = 0; k + i + 1 < m; ++k) b = sqr(b);
      x = mul(x, b);
      Fe b2 = sqr(b);
      t = mul(t, b2);
      c = b2;
      m = i;
    }
    *out = x;
    return true;
  }
};

// ------------------------------------------------------------- jubjub -----

struct WJubjub {
  u64 d[4];       // edwards_d, Montgomery form
  u64 u[4];       // montgomery_u, Montgomery form
  u64 fs_mod[4];  // Fs modulus, canonical (subgroup order check scalar)
  u64 inv8[4];    // 8^-1 mod Fs, canonical scalar
  u64 gx[4], gy[4];  // generator, Montgomery form
};

struct ExPt { Fe x, y, t, z; };  // extended Edwards (Hisil et al.)

static inline ExPt ex_zero(const Ctx &c) {
  return {c.zero, c.one, c.zero, c.one};
}

static inline ExPt ex_double(const Ctx &c, const ExPt &p) {
  // dbl-2008-hwcd, a = -1 path matching native/ecc.py double()
  Fe a = c.sqr(p.x);
  Fe b = c.sqr(p.y);
  Fe zz = c.sqr(p.z);
  Fe cc = c.add(zz, zz);
  Fe d = c.neg(a);
  Fe xy = c.add(p.x, p.y);
  Fe e = c.sub(c.sub(c.sqr(xy), a), b);
  Fe g = c.add(d, b);
  Fe f = c.sub(g, cc);
  Fe h = c.sub(d, b);
  return {c.mul(e, f), c.mul(g, h), c.mul(e, h), c.mul(f, g)};
}

static inline ExPt ex_add(const Ctx &c, const Fe &ed, const ExPt &p,
                          const ExPt &q) {
  Fe a = c.mul(p.x, q.x);
  Fe b = c.mul(p.y, q.y);
  Fe cc = c.mul(ed, c.mul(p.t, q.t));
  Fe d = c.mul(p.z, q.z);
  Fe h = c.add(b, a);
  Fe e = c.sub(c.mul(c.add(p.x, p.y), c.add(q.x, q.y)), h);
  Fe f = c.sub(d, cc);
  Fe g = c.add(d, cc);
  return {c.mul(e, f), c.mul(g, h), c.mul(e, h), c.mul(f, g)};
}

static ExPt ex_mul(const Ctx &c, const Fe &ed, const ExPt &p, const u64 *e) {
  ExPt r = ex_zero(c);
  int top = -1;
  for (int w = 3; w >= 0 && top < 0; --w)
    if (e[w]) top = w * 64 + 63 - __builtin_clzll(e[w]);
  for (int i = top; i >= 0; --i) {
    r = ex_double(c, r);
    if ((e[i / 64] >> (i % 64)) & 1) r = ex_add(c, ed, r, p);
  }
  return r;
}

static inline void ex_affine(const Ctx &c, const ExPt &p, Fe *x, Fe *y) {
  Fe zi = c.inv(p.z);
  *x = c.mul(p.x, zi);
  *y = c.mul(p.y, zi);
}

// subgroup_decompress matching native/ecc.py:66-78: returns false -> caller
// substitutes the generator (hint convention, circuit/hints.py:80-82)
static bool jj_decompress(const Ctx &c, const WJubjub *jj, const Fe &x,
                          Fe *ox, Fe *oy) {
  Fe ed; memcpy(ed.v, jj->d, 32);
  Fe x2 = c.sqr(x);
  Fe numer = c.add(x2, c.one);
  Fe denom = c.sub(c.one, c.mul(ed, x2));
  Fe t;
  if (is_zero4(denom.v)) return false;
  Fe frac = c.mul(numer, c.inv(denom));
  if (!c.sqrt(frac, &t)) return false;
  Fe y = t;
  ExPt p = {x, y, c.mul(x, y), c.one};
  ExPt l = ex_mul(c, ed, p, jj->fs_mod);
  Fe lx, ly;
  ex_affine(c, l, &lx, &ly);
  if (!is_zero4(lx.v)) return false;
  *ox = x;
  *oy = (cmp4(ly.v, c.one.v) == 0) ? y : c.neg(y);
  return true;
}

// ------------------------------------------------------------ program -----

typedef void (*HintCb)(i64 hint_id, const u64 *ins, i32 n_ins, u64 *outs,
                       i32 n_outs);

enum HintId : i64 {
  H_JUBJUB_MUL_INV8 = 1,
  H_JUBJUB_DECOMPRESS_INV8 = 2,
  H_MONTGOMERY_GET_Y = 3,
  H_POSEIDON = 4,
  H_CALLBACK_BASE = 100,
};

enum OpKind : i32 { OP_MUL = 0, OP_DIV = 1, OP_INV_OR = 2, OP_BIT = 3,
                    OP_HINT = 4, OP_LIN = 5 };

struct WProgram {
  i64 n_ops;
  const i32 *kind;
  const i64 *out;       // global value slot of (first) output
  const i64 *a_off;     // LC a offset into terms; hints: into hlc table
  const i32 *a_len;
  const i64 *b_off;     // LC b; hints: offset into hout_idx
  const i32 *b_len;
  const u64 *aux;       // n_ops * 4
  // flattened LC terms
  const u64 *term_coeff;  // n_terms * 4, Montgomery
  const i64 *term_idx;    // global value slot
  const u8 *term_is_one;  // coeff == ONE fast path
  // hint LC table
  const i64 *hlc_off;
  const i32 *hlc_len;
  const i64 *hout_idx;
  i64 n_vals;   // n_in + n_aux + scratch (LC-CSE lin slots)
  i64 n_in;
  i64 n_aux;
  const i64 *ext_slots;  // where external inputs land
  i64 n_ext;
  // side-table for data-carrying native hints (poseidon params blobs);
  // per-op offset rides in aux word 1
  const u64 *hint_data;
};

// one poseidon permutation (hint_block macro, circuit/poseidon.py _perm):
// blob = [t, f, p, const_mask, c[(f+p)*t*4] mont, m[t*t*4] mont]; writes the
// (a^2, a^4, a^5) of every non-const sigma in gadget allocation order.
static i32 hint_poseidon(const Ctx &c, const u64 *blob, const Fe *ins,
                         Fe *outs) {
  i64 t = (i64)blob[0], f = (i64)blob[1], p = (i64)blob[2];
  u64 mask = blob[3];
  const u64 *ctab = blob + 4;
  const u64 *mtab = ctab + (f + p) * t * 4;
  Fe lane[8];
  bool cst[8];
  for (i64 i = 0; i < t; ++i) {
    lane[i] = ins[i];
    cst[i] = (mask >> i) & 1;
  }
  i64 half_f = f >> 1;
  i32 w = 0;
  for (i64 r = 0; r < f + p; ++r) {
    for (i64 i = 0; i < t; ++i) {
      Fe cc;
      memcpy(cc.v, ctab + (r * t + i) * 4, 32);
      lane[i] = c.add(lane[i], cc);
    }
    i64 hi = (r < half_f || r >= half_f + p) ? t : 1;
    for (i64 i = 0; i < hi; ++i) {
      Fe a = lane[i];
      Fe a2 = c.sqr(a);
      Fe a4 = c.sqr(a2);
      Fe a5 = c.mul(a4, a);
      if (!cst[i]) {
        outs[w++] = a2;
        outs[w++] = a4;
        outs[w++] = a5;
      }
      lane[i] = a5;
    }
    bool allc = true;
    for (i64 i = 0; i < t; ++i) allc = allc && cst[i];
    Fe nl[8];
    for (i64 i = 0; i < t; ++i) {
      Fe acc = c.zero;
      for (i64 j = 0; j < t; ++j) {
        Fe m;
        memcpy(m.v, mtab + (i * t + j) * 4, 32);
        acc = c.add(acc, c.mul(m, lane[j]));
      }
      nl[i] = acc;
    }
    for (i64 i = 0; i < t; ++i) {
      lane[i] = nl[i];
      cst[i] = allc;
    }
  }
  return w;
}

static inline Fe lc_eval(const Ctx &c, const WProgram *pr, i64 off, i32 len,
                         const Fe *vals) {
  Fe acc = c.zero;
  for (i32 t = 0; t < len; ++t) {
    i64 ix = pr->term_idx[off + t];
    const Fe &v = vals[ix];
    if (pr->term_is_one[off + t]) {
      acc = c.add(acc, v);
    } else {
      Fe co;
      memcpy(co.v, pr->term_coeff + (off + t) * 4, 32);
      acc = c.add(acc, c.mul(co, v));
    }
  }
  return acc;
}

static void run_hint(const Ctx &c, const WJubjub *jj, i64 id, const Fe *ins,
                     i32 n_ins, Fe *outs, i32 n_outs, HintCb cb) {
  if (id >= H_CALLBACK_BASE) {
    // canonical at the callback boundary
    u64 inbuf[16 * 4], outbuf[16 * 4];
    for (i32 i = 0; i < n_ins; ++i) {
      Fe cv = c.from_mont(ins[i]);
      memcpy(inbuf + i * 4, cv.v, 32);
    }
    cb(id - H_CALLBACK_BASE, inbuf, n_ins, outbuf, n_outs);
    for (i32 i = 0; i < n_outs; ++i) {
      Fe cv;
      memcpy(cv.v, outbuf + i * 4, 32);
      outs[i] = c.to_mont(cv);
    }
    return;
  }
  Fe ed; memcpy(ed.v, jj->d, 32);
  switch (id) {
    case H_JUBJUB_MUL_INV8: {
      ExPt p = {ins[0], ins[1], c.mul(ins[0], ins[1]), c.one};
      ExPt r = ex_mul(c, ed, p, jj->inv8);
      ex_affine(c, r, &outs[0], &outs[1]);
      break;
    }
    case H_JUBJUB_DECOMPRESS_INV8: {
      Fe px, py;
      if (!jj_decompress(c, jj, ins[0], &px, &py)) {
        memcpy(px.v, jj->gx, 32);
        memcpy(py.v, jj->gy, 32);
      }
      ExPt p = {px, py, c.mul(px, py), c.one};
      ExPt r = ex_mul(c, ed, p, jj->inv8);
      ex_affine(c, r, &outs[0], &outs[1]);
      break;
    }
    case H_MONTGOMERY_GET_Y: {
      // circuit/hints.py:85-95
      Fe u; memcpy(u.v, jj->u, 32);
      const Fe &gv = ins[0], &tv = ins[1];
      Fe y;
      if (!c.sqrt(gv, &y)) {
        bool ok = c.sqrt(c.mul(gv, u), &y);
        (void)ok;  // mirrors the Python hint: assumed well-formed
      }
      Fe prod = c.from_mont(c.mul(y, tv));
      outs[0] = (prod.v[0] & 1) ? c.neg(y) : y;
      break;
    }
  }
}

static void eval_one(const Ctx &c, const WProgram *pr, const WJubjub *jj,
                     Fe *vals, HintCb cb) {
  for (i64 i = 0; i < pr->n_ops; ++i) {
    i32 kind = pr->kind[i];
    i64 out = pr->out[i];
    switch (kind) {
      case OP_MUL: {
        Fe a = lc_eval(c, pr, pr->a_off[i], pr->a_len[i], vals);
        Fe b = lc_eval(c, pr, pr->b_off[i], pr->b_len[i], vals);
        Fe extra;
        memcpy(extra.v, pr->aux + i * 4, 32);
        vals[out] = c.add(c.mul(a, b), extra);
        break;
      }
      case OP_DIV: {
        Fe a = lc_eval(c, pr, pr->a_off[i], pr->a_len[i], vals);
        Fe b = lc_eval(c, pr, pr->b_off[i], pr->b_len[i], vals);
        vals[out] = is_zero4(b.v) ? c.zero : c.mul(a, c.inv(b));
        break;
      }
      case OP_INV_OR: {
        Fe a = lc_eval(c, pr, pr->a_off[i], pr->a_len[i], vals);
        if (is_zero4(a.v)) memcpy(vals[out].v, pr->aux + i * 4, 32);
        else vals[out] = c.inv(a);
        break;
      }
      case OP_BIT: {
        Fe a = lc_eval(c, pr, pr->a_off[i], pr->a_len[i], vals);
        Fe cv = c.from_mont(a);
        u64 bit_ix = pr->aux[i * 4];
        u64 bit = (cv.v[bit_ix / 64] >> (bit_ix % 64)) & 1;
        vals[out] = bit ? c.one : c.zero;
        break;
      }
      case OP_LIN: {
        // materialized common LC (compiler CSE, witness_native.py): the
        // scratch value is reused by every op that referenced this LC
        vals[out] = lc_eval(c, pr, pr->a_off[i], pr->a_len[i], vals);
        break;
      }
      case OP_HINT: {
        i64 id = (i64)pr->aux[i * 4];
        i32 n_ins = pr->a_len[i];
        i32 n_outs = pr->b_len[i];
        if (id == H_POSEIDON) {
          Fe ins[8];
          for (i32 k = 0; k < n_ins; ++k) {
            i64 l = pr->a_off[i] + k;
            ins[k] = lc_eval(c, pr, pr->hlc_off[l], pr->hlc_len[l], vals);
          }
          Fe outbuf[1024];  // >= 3*(f*t+p) for all in-repo params
          i32 w = hint_poseidon(
              c, pr->hint_data + (i64)pr->aux[i * 4 + 1], ins, outbuf);
          if (w != n_outs) return;  // compiler/evaluator mismatch guard
          for (i32 k = 0; k < n_outs; ++k)
            vals[pr->hout_idx[pr->b_off[i] + k]] = outbuf[k];
          break;
        }
        Fe ins[16], outs[16];
        for (i32 k = 0; k < n_ins; ++k) {
          i64 l = pr->a_off[i] + k;
          ins[k] = lc_eval(c, pr, pr->hlc_off[l], pr->hlc_len[l], vals);
        }
        run_hint(c, jj, id, ins, n_ins, outs, n_outs, cb);
        for (i32 k = 0; k < n_outs; ++k)
          vals[pr->hout_idx[pr->b_off[i] + k]] = outs[k];
        break;
      }
    }
  }
}

extern "C" {

// Single evaluation. ext_vals: n_ext canonical; extra_inputs land in input
// slots 1..n_extra. out_vals: all n_vals slots, canonical.
int fawkes_wit_eval(const WField *fp, const WProgram *pr, const WJubjub *jj,
                    const u64 *ext_vals, const u64 *extra_inputs,
                    i32 n_extra, u64 *out_vals, HintCb cb) {
  Ctx c;
  c.f = fp;
  memcpy(c.one.v, fp->r1, 32);
  memset(c.zero.v, 0, 32);
  Fe *vals = new Fe[pr->n_vals];
  memset(vals, 0, pr->n_vals * 32);
  vals[0] = c.one;  // wire 0 == constant ONE
  for (i32 i = 0; i < n_extra; ++i) {
    Fe v;
    memcpy(v.v, extra_inputs + i * 4, 32);
    vals[1 + i] = c.to_mont(v);
  }
  for (i64 i = 0; i < pr->n_ext; ++i) {
    Fe v;
    memcpy(v.v, ext_vals + i * 4, 32);
    vals[pr->ext_slots[i]] = c.to_mont(v);
  }
  eval_one(c, pr, jj, vals, cb);
  for (i64 i = 0; i < pr->n_vals; ++i) {
    Fe cv = c.from_mont(vals[i]);
    memcpy(out_vals + i * 4, cv.v, 32);
  }
  delete[] vals;
  return 0;
}

// Batched evaluation over structurally-identical copies (the rollup tx
// template, backend/groth16/replicate.py). Copy i's aux values are written
// to aux_out + i*n_aux*4 (canonical). The running root (pseudo-input wire
// 1, replicate.py ROOT_MARKER) chains: roots_out[0] = root_in and
// roots_out[i+1] = <root_lc, z_i>. When no op reads wire 1 the copies are
// value-independent (checked by the Python compiler, `parallel` set) and
// evaluation fans out over OpenMP threads.
int fawkes_wit_eval_batch(const WField *fp, const WProgram *pr,
                          const WJubjub *jj, i64 n_txs, const u64 *ext_vals,
                          const u64 *root_in, i64 root_off, i32 root_len,
                          u64 *aux_out, u64 *aux_mont_out, u64 *roots_out,
                          i32 parallel, HintCb cb) {
  Ctx c;
  c.f = fp;
  memcpy(c.one.v, fp->r1, 32);
  memset(c.zero.v, 0, 32);
  i64 n_aux = pr->n_aux;

  auto run_tx = [&](i64 tx, const Fe *root_mont) {
    Fe *vals = new Fe[pr->n_vals];
    memset(vals, 0, pr->n_vals * 32);
    vals[0] = c.one;
    if (root_mont) vals[1] = *root_mont;
    const u64 *ev = ext_vals + tx * pr->n_ext * 4;
    for (i64 i = 0; i < pr->n_ext; ++i) {
      Fe v;
      memcpy(v.v, ev + i * 4, 32);
      vals[pr->ext_slots[i]] = c.to_mont(v);
    }
    eval_one(c, pr, jj, vals, cb);
    u64 *ao = aux_out + tx * n_aux * 4;
    u64 *am = aux_mont_out ? aux_mont_out + tx * n_aux * 4 : nullptr;
    for (i64 i = 0; i < n_aux; ++i) {
      if (am) memcpy(am + i * 4, vals[pr->n_in + i].v, 32);
      Fe cv = c.from_mont(vals[pr->n_in + i]);
      memcpy(ao + i * 4, cv.v, 32);
    }
    delete[] vals;
  };

  // root_{i+1} = <root_lc, z_i> over tx i's canonical aux; the LC may
  // reference wire 0 (ONE), wire 1 (prev root, Montgomery in) or aux slots
  auto root_step = [&](i64 tx, const Fe &root_m) -> Fe {
    Fe acc = c.zero;
    const u64 *ao = aux_out + tx * n_aux * 4;
    for (i32 t = 0; t < root_len; ++t) {
      i64 ix = pr->term_idx[root_off + t];
      Fe co;
      memcpy(co.v, pr->term_coeff + (root_off + t) * 4, 32);
      Fe v;
      if (ix == 0) v = c.one;
      else if (ix == 1) v = root_m;
      else {
        Fe cv;
        memcpy(cv.v, ao + (ix - pr->n_in) * 4, 32);
        v = c.to_mont(cv);
      }
      acc = c.add(acc, c.mul(co, v));
    }
    return acc;
  };

  memcpy(roots_out, root_in, 32);
  Fe root0;
  memcpy(root0.v, root_in, 32);
  Fe root = c.to_mont(root0);

  if (parallel) {
#pragma omp parallel for schedule(dynamic, 1)
    for (i64 tx = 0; tx < n_txs; ++tx) run_tx(tx, nullptr);
    for (i64 tx = 0; tx < n_txs; ++tx) {
      root = root_step(tx, root);
      Fe cv = c.from_mont(root);
      memcpy(roots_out + (tx + 1) * 4, cv.v, 32);
    }
  } else {
    // sequential: the root threads through (root-dependent templates)
    for (i64 tx = 0; tx < n_txs; ++tx) {
      run_tx(tx, &root);
      root = root_step(tx, root);
      Fe cv = c.from_mont(root);
      memcpy(roots_out + (tx + 1) * 4, cv.v, 32);
    }
  }
  return 0;
}

}  // extern "C"
