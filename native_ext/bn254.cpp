// BN254 (alt_bn128) host-native backend: Montgomery Fq, Fq2/Fq6/Fq12 tower,
// G1/G2 group ops, Pippenger MSM, optimal-ate pairing product check.
//
// This is the C++ fast path for the host side of the framework — the role
// bellman_ce's pairing/group code plays for the reference at
// /root/reference/fawkes-crypto/src/backend/bellman_groth16/verifier.rs:79-80
// (verification) and setup.rs:20 (CRS exponentiations). Algorithms mirror
// the pure-Python oracle in fawkes_crypto_tpu/native/bn_pairing.py, which is
// the tested spec; this file is its performance twin (same tower, same
// Miller loop schedule, same final exponentiation).
//
// ABI: all byte buffers are canonical little-endian 32-byte field elements.
// G1 point = x||y (64 B), G2 point = x.c0||x.c1||y.c0||y.c1 (128 B);
// all-zero coordinates encode the point at infinity (matches
// backend/groth16/serialize.py).
//
// Build: g++ -O2 -shared -fPIC -o libbn254.so bn254.cpp

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

// ---------------------------------------------------------------- Fq ------

struct Fp { u64 v[4]; };

static const Fp MOD = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                        0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 INV = 0x87d20782e4866389ULL;
static const Fp R1 = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                       0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};
static const Fp R2 = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                       0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};
static const Fp FP_ZERO = {{0, 0, 0, 0}};

// scalar field order (for scalar reduction in mul/MSM)
static const u64 R_ORDER[4] = {0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL};

static inline bool fp_is_zero(const Fp &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool fp_eq(const Fp &a, const Fp &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

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

static inline Fp fp_add(const Fp &a, const Fp &b) {
  Fp r;
  u64 carry = add4(r.v, a.v, b.v);
  if (carry || cmp4(r.v, MOD.v) >= 0) sub4(r.v, r.v, MOD.v);
  return r;
}

static inline Fp fp_sub(const Fp &a, const Fp &b) {
  Fp r;
  if (sub4(r.v, a.v, b.v)) add4(r.v, r.v, MOD.v);
  return r;
}

static inline Fp fp_neg(const Fp &a) { return fp_is_zero(a) ? a : fp_sub(FP_ZERO, a); }

static inline Fp fp_mul(const Fp &a, const Fp &b) {
  // CIOS Montgomery multiplication, 4x64 limbs
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 c = 0;
    for (int j = 0; j < 4; ++j) {
      c += (u128)t[j] + (u128)a.v[i] * b.v[j];
      t[j] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[4] = (u64)c;
    t[5] = (u64)(c >> 64);
    u64 m = t[0] * INV;
    c = (u128)t[0] + (u128)m * MOD.v[0];
    c >>= 64;
    for (int j = 1; j < 4; ++j) {
      c += (u128)t[j] + (u128)m * MOD.v[j];
      t[j - 1] = (u64)c;
      c >>= 64;
    }
    c += t[4];
    t[3] = (u64)c;
    t[4] = t[5] + (u64)(c >> 64);
    t[5] = 0;
  }
  Fp r = {{t[0], t[1], t[2], t[3]}};
  if (t[4] || cmp4(r.v, MOD.v) >= 0) sub4(r.v, r.v, MOD.v);
  return r;
}

static inline Fp fp_sqr(const Fp &a) { return fp_mul(a, a); }

static Fp fp_pow(const Fp &a, const u64 *e, int limbs) {
  Fp r = R1, b = a;
  for (int i = 0; i < limbs; ++i)
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[i] >> bit) & 1) r = fp_mul(r, b);
      b = fp_sqr(b);
    }
  return r;
}

static Fp fp_inv(const Fp &a) {
  // a^(p-2)
  u64 e[4];
  u64 two[4] = {2, 0, 0, 0};
  sub4(e, MOD.v, two);
  return fp_pow(a, e, 4);
}

static Fp fp_from_bytes(const uint8_t *b) {
  Fp x;
  for (int i = 0; i < 4; ++i) {
    u64 w = 0;
    for (int j = 7; j >= 0; --j) w = (w << 8) | b[i * 8 + j];
    x.v[i] = w;
  }
  return fp_mul(x, R2);  // to Montgomery
}

static void fp_to_bytes(const Fp &a, uint8_t *out) {
  // from Montgomery: multiply by 1
  Fp one = {{1, 0, 0, 0}};
  Fp c = fp_mul(a, one);
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 8; ++j) out[i * 8 + j] = (uint8_t)(c.v[i] >> (8 * j));
}

// ---------------------------------------------------------------- Fq2 -----

struct Fp2 { Fp a, b; };  // a + b*u, u^2 = -1

static const Fp2 FP2_ZERO = {FP_ZERO, FP_ZERO};
static const Fp2 FP2_ONE = {R1, FP_ZERO};

static inline bool fp2_is_zero(const Fp2 &x) { return fp_is_zero(x.a) && fp_is_zero(x.b); }
static inline bool fp2_eq(const Fp2 &x, const Fp2 &y) { return fp_eq(x.a, y.a) && fp_eq(x.b, y.b); }
static inline Fp2 fp2_add(const Fp2 &x, const Fp2 &y) { return {fp_add(x.a, y.a), fp_add(x.b, y.b)}; }
static inline Fp2 fp2_sub(const Fp2 &x, const Fp2 &y) { return {fp_sub(x.a, y.a), fp_sub(x.b, y.b)}; }
static inline Fp2 fp2_neg(const Fp2 &x) { return {fp_neg(x.a), fp_neg(x.b)}; }
static inline Fp2 fp2_conj(const Fp2 &x) { return {x.a, fp_neg(x.b)}; }

static inline Fp2 fp2_mul(const Fp2 &x, const Fp2 &y) {
  Fp t0 = fp_mul(x.a, y.a);
  Fp t1 = fp_mul(x.b, y.b);
  Fp t2 = fp_mul(fp_add(x.a, x.b), fp_add(y.a, y.b));
  return {fp_sub(t0, t1), fp_sub(fp_sub(t2, t0), t1)};
}

static inline Fp2 fp2_sqr(const Fp2 &x) {
  Fp p0 = fp_mul(fp_add(x.a, x.b), fp_sub(x.a, x.b));
  Fp p1 = fp_mul(x.a, x.b);
  return {p0, fp_add(p1, p1)};
}

static inline Fp2 fp2_mul_fp(const Fp2 &x, const Fp &s) { return {fp_mul(x.a, s), fp_mul(x.b, s)}; }

static inline Fp2 fp2_mul_xi(const Fp2 &x) {
  // * (9 + u)
  Fp nine_a = fp_add(fp_add(fp_add(x.a, x.a), fp_add(x.a, x.a)),
                     fp_add(fp_add(x.a, x.a), fp_add(fp_add(x.a, x.a), x.a)));
  Fp nine_b = fp_add(fp_add(fp_add(x.b, x.b), fp_add(x.b, x.b)),
                     fp_add(fp_add(x.b, x.b), fp_add(fp_add(x.b, x.b), x.b)));
  return {fp_sub(nine_a, x.b), fp_add(x.a, nine_b)};
}

static Fp2 fp2_inv(const Fp2 &x) {
  Fp d = fp_inv(fp_add(fp_sqr(x.a), fp_sqr(x.b)));
  return {fp_mul(x.a, d), fp_neg(fp_mul(x.b, d))};
}

// ---------------------------------------------------------------- Fq6 -----

struct Fp6 { Fp2 c0, c1, c2; };  // c0 + c1 v + c2 v^2, v^3 = 9+u

static const Fp6 FP6_ZERO = {FP2_ZERO, FP2_ZERO, FP2_ZERO};
static const Fp6 FP6_ONE = {FP2_ONE, FP2_ZERO, FP2_ZERO};

static inline Fp6 fp6_add(const Fp6 &x, const Fp6 &y) { return {fp2_add(x.c0, y.c0), fp2_add(x.c1, y.c1), fp2_add(x.c2, y.c2)}; }
static inline Fp6 fp6_sub(const Fp6 &x, const Fp6 &y) { return {fp2_sub(x.c0, y.c0), fp2_sub(x.c1, y.c1), fp2_sub(x.c2, y.c2)}; }
static inline Fp6 fp6_neg(const Fp6 &x) { return {fp2_neg(x.c0), fp2_neg(x.c1), fp2_neg(x.c2)}; }
static inline bool fp6_eq(const Fp6 &x, const Fp6 &y) { return fp2_eq(x.c0, y.c0) && fp2_eq(x.c1, y.c1) && fp2_eq(x.c2, y.c2); }

static Fp6 fp6_mul(const Fp6 &x, const Fp6 &y) {
  Fp2 t0 = fp2_mul(x.c0, y.c0), t1 = fp2_mul(x.c1, y.c1), t2 = fp2_mul(x.c2, y.c2);
  Fp2 c0 = fp2_add(fp2_mul_xi(fp2_sub(fp2_sub(fp2_mul(fp2_add(x.c1, x.c2), fp2_add(y.c1, y.c2)), t1), t2)), t0);
  Fp2 c1 = fp2_add(fp2_sub(fp2_sub(fp2_mul(fp2_add(x.c0, x.c1), fp2_add(y.c0, y.c1)), t0), t1), fp2_mul_xi(t2));
  Fp2 c2 = fp2_add(fp2_sub(fp2_sub(fp2_mul(fp2_add(x.c0, x.c2), fp2_add(y.c0, y.c2)), t0), t2), t1);
  return {c0, c1, c2};
}

static inline Fp6 fp6_mul_v(const Fp6 &x) { return {fp2_mul_xi(x.c2), x.c0, x.c1}; }

static Fp6 fp6_inv(const Fp6 &x) {
  Fp2 t0 = fp2_sub(fp2_sqr(x.c0), fp2_mul_xi(fp2_mul(x.c1, x.c2)));
  Fp2 t1 = fp2_sub(fp2_mul_xi(fp2_sqr(x.c2)), fp2_mul(x.c0, x.c1));
  Fp2 t2 = fp2_sub(fp2_sqr(x.c1), fp2_mul(x.c0, x.c2));
  Fp2 d = fp2_inv(fp2_add(fp2_mul(x.c0, t0),
                          fp2_add(fp2_mul_xi(fp2_mul(x.c2, t1)),
                                  fp2_mul_xi(fp2_mul(x.c1, t2)))));
  return {fp2_mul(t0, d), fp2_mul(t1, d), fp2_mul(t2, d)};
}

// ---------------------------------------------------------------- Fq12 ----

struct Fp12 { Fp6 c0, c1; };  // c0 + c1 w, w^2 = v

static const Fp12 FP12_ONE = {FP6_ONE, FP6_ZERO};

static inline bool fp12_eq(const Fp12 &x, const Fp12 &y) { return fp6_eq(x.c0, y.c0) && fp6_eq(x.c1, y.c1); }
static inline Fp12 fp12_add(const Fp12 &x, const Fp12 &y) { return {fp6_add(x.c0, y.c0), fp6_add(x.c1, y.c1)}; }
static inline Fp12 fp12_sub(const Fp12 &x, const Fp12 &y) { return {fp6_sub(x.c0, y.c0), fp6_sub(x.c1, y.c1)}; }
static inline Fp12 fp12_neg(const Fp12 &x) { return {fp6_neg(x.c0), fp6_neg(x.c1)}; }

static Fp12 fp12_mul(const Fp12 &x, const Fp12 &y) {
  Fp6 t0 = fp6_mul(x.c0, y.c0), t1 = fp6_mul(x.c1, y.c1);
  Fp6 c0 = fp6_add(t0, fp6_mul_v(t1));
  Fp6 c1 = fp6_sub(fp6_sub(fp6_mul(fp6_add(x.c0, x.c1), fp6_add(y.c0, y.c1)), t0), t1);
  return {c0, c1};
}

static Fp12 fp12_sqr(const Fp12 &x) {
  Fp6 t = fp6_mul(x.c0, x.c1);
  Fp6 c0 = fp6_sub(fp6_sub(fp6_mul(fp6_add(x.c0, x.c1), fp6_add(x.c0, fp6_mul_v(x.c1))), t), fp6_mul_v(t));
  return {c0, fp6_add(t, t)};
}

static Fp12 fp12_inv(const Fp12 &x) {
  Fp6 d = fp6_inv(fp6_sub(fp6_mul(x.c0, x.c0), fp6_mul_v(fp6_mul(x.c1, x.c1))));
  return {fp6_mul(x.c0, d), fp6_neg(fp6_mul(x.c1, d))};
}

static inline Fp12 fp12_conj(const Fp12 &x) { return {x.c0, fp6_neg(x.c1)}; }

// Frobenius constants: FROB[k-1][i] = xi^(i*(p^k-1)/6) in Fq2, Montgomery
static const Fp2 FROB[3][6] = {
{{{{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}, {{{0xaf9ba69633144907ULL, 0xca6b1d7387afb78aULL, 0x11bded5ef08a2087ULL, 0x02f34d751a1f3a7cULL}}, {{0xa222ae234c492d72ULL, 0xd00f02a4565de15bULL, 0xdc2ff3a253dfc926ULL, 0x10a75716b3899551ULL}}}, {{{0xb5773b104563ab30ULL, 0x347f91c8a9aa6454ULL, 0x7a007127242e0991ULL, 0x1956bcd8118214ecULL}}, {{0x6e849f1ea0aa4757ULL, 0xaa1c7b6d89f89141ULL, 0xb6e713cdfae0ca3aULL, 0x26694fbb4e82ebc3ULL}}}, {{{0xe4bbdd0c2936b629ULL, 0xbb30f162e133bacbULL, 0x31a9d1b6f9645366ULL, 0x253570bea500f8ddULL}}, {{0xa1d77ce45ffe77c7ULL, 0x07affd117826d1dbULL, 0x6d16bd27bb7edc6bULL, 0x2c87200285defeccULL}}}, {{{0x7361d77f843abe92ULL, 0xa5bb2bd3273411fbULL, 0x9c941f314b3e2399ULL, 0x15df9cddbb9fd3ecULL}}, {{0x5dddfd154bd8c949ULL, 0x62cb29a5a4445b60ULL, 0x37bc870a0c7dd2b9ULL, 0x24830a9d3171f0fdULL}}}, {{{0xc970692f41690fe7ULL, 0xe240342127694b0bULL, 0x32bee66b83c459e8ULL, 0x12aabced0ab08841ULL}}, {{0x0d485d2340aebfa9ULL, 0x05193418ab2fcc57ULL, 0xd3b0a40b8a4910f5ULL, 0x2f21ebb535d2925aULL}}}},
{{{{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}, {{{0xca8d800500fa1bf2ULL, 0xf0c5d61468b39769ULL, 0x0e201271ad0d4418ULL, 0x04290f65bad856e6ULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}, {{{0x3350c88e13e80b9cULL, 0x7dce557cdb5e56b9ULL, 0x6001b4b8b615564aULL, 0x2682e617020217e0ULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}, {{{0x68c3488912edefaaULL, 0x8d087f6872aabf4fULL, 0x51e1a24709081231ULL, 0x2259d6b14729c0faULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}, {{{0x71930c11d782e155ULL, 0xa6bb947cffbe3323ULL, 0xaa303344d4741444ULL, 0x2c3b3f0d26594943ULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}, {{{0x08cfc388c494f1abULL, 0x19b315148d1373d4ULL, 0x584e90fdcb6c0213ULL, 0x09e1685bdf2f8849ULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}},
{{{{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL, 0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}}, {{0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL, 0x0000000000000000ULL}}}, {{{0x365316184e46d97dULL, 0x0af7129ed4c96d9fULL, 0x659da72fca1009b5ULL, 0x08116d8983a20d23ULL}}, {{0xb1df4af7c39c1939ULL, 0x3d9f02878a73bf7fULL, 0x9b2220928caf0ae0ULL, 0x26684515eff054a6ULL}}}, {{{0xc9af22f716ad6badULL, 0xb311782a4aa662b2ULL, 0x19eeaf64e248c7f4ULL, 0x20273e77e3439f82ULL}}, {{0xacc02860f7ce93acULL, 0x3933d5817ba76b4cULL, 0x69e6188b446c8467ULL, 0x0a46036d4417cc55ULL}}}, {{{0x5764af0aaf46471eULL, 0xdc50792e873e0fc1ULL, 0x86a673ff881d04f6ULL, 0x0b2eddb43c30a74cULL}}, {{0x9a490f32787e8580ULL, 0x8fd16d7ff04af8b1ULL, 0x4b39888ec6027bf2ULL, 0x03dd2e705b52a15dULL}}}, {{{0x448a93a57b6762dfULL, 0xbfd62df528fdeadfULL, 0xd858f5d00e9bd47aULL, 0x06b03d4d3476ec58ULL}}, {{0x2b19daf4bcc936d1ULL, 0xa1a54e7a56f4299fULL, 0xb533eee05adeaef1ULL, 0x170c812b84dda0b2ULL}}}, {{{0xe0bc4b2275cf559fULL, 0xc238b945c154e60fULL, 0x803982a5929a7d5eULL, 0x15ce052df7e4a37eULL}}, {{0x2d28efbdbf3799a7ULL, 0x9b097e3c1ad60773ULL, 0x982d4113af4a535bULL, 0x24e18991e3056063ULL}}}},
};

static Fp12 fp12_frobenius(const Fp12 &x, int power) {
  const Fp2 *c = FROB[power - 1];
  Fp2 a0 = x.c0.c0, a1 = x.c0.c1, a2 = x.c0.c2;
  Fp2 b0 = x.c1.c0, b1 = x.c1.c1, b2 = x.c1.c2;
  if (power % 2 == 1) {
    a0 = fp2_conj(a0); a1 = fp2_conj(a1); a2 = fp2_conj(a2);
    b0 = fp2_conj(b0); b1 = fp2_conj(b1); b2 = fp2_conj(b2);
  }
  return {{a0, fp2_mul(a1, c[2]), fp2_mul(a2, c[4])},
          {fp2_mul(b0, c[1]), fp2_mul(b1, c[3]), fp2_mul(b2, c[5])}};
}

static Fp12 fp12_pow(const Fp12 &x, const u64 *e, int limbs) {
  Fp12 r = FP12_ONE, b = x;
  for (int i = 0; i < limbs; ++i)
    for (int bit = 0; bit < 64; ++bit) {
      if ((e[i] >> bit) & 1) r = fp12_mul(r, b);
      b = fp12_sqr(b);
    }
  return r;
}

// -------------------------------------------------------- curve groups ----

struct G1 { Fp x, y, z; };   // Jacobian, Montgomery coords; z==0 -> infinity
struct G2 { Fp2 x, y, z; };

static inline bool g1_is_inf(const G1 &p) { return fp_is_zero(p.z); }
static inline bool g2_is_inf(const G2 &p) { return fp2_is_zero(p.z); }

static G1 g1_dbl(const G1 &p) {
  if (g1_is_inf(p)) return p;
  Fp a = fp_sqr(p.x), b = fp_sqr(p.y), c = fp_sqr(b);
  Fp d = fp_sub(fp_sub(fp_sqr(fp_add(p.x, b)), a), c);
  d = fp_add(d, d);
  Fp e = fp_add(fp_add(a, a), a);
  Fp f = fp_sqr(e);
  Fp x3 = fp_sub(f, fp_add(d, d));
  Fp c8 = fp_add(c, c); c8 = fp_add(c8, c8); c8 = fp_add(c8, c8);
  Fp y3 = fp_sub(fp_mul(e, fp_sub(d, x3)), c8);
  Fp z3 = fp_mul(p.y, p.z); z3 = fp_add(z3, z3);
  return {x3, y3, z3};
}

static G1 g1_add(const G1 &p, const G1 &q) {
  if (g1_is_inf(p)) return q;
  if (g1_is_inf(q)) return p;
  Fp z1z1 = fp_sqr(p.z), z2z2 = fp_sqr(q.z);
  Fp u1 = fp_mul(p.x, z2z2), u2 = fp_mul(q.x, z1z1);
  Fp s1 = fp_mul(fp_mul(p.y, q.z), z2z2), s2 = fp_mul(fp_mul(q.y, p.z), z1z1);
  Fp h = fp_sub(u2, u1), r = fp_sub(s2, s1);
  if (fp_is_zero(h)) {
    if (fp_is_zero(r)) return g1_dbl(p);
    return {R1, R1, FP_ZERO};
  }
  Fp i = fp_add(h, h); i = fp_sqr(i);
  Fp j = fp_mul(h, i);
  Fp rr = fp_add(r, r);
  Fp v = fp_mul(u1, i);
  Fp x3 = fp_sub(fp_sub(fp_sqr(rr), j), fp_add(v, v));
  Fp s1j = fp_mul(s1, j);
  Fp y3 = fp_sub(fp_mul(rr, fp_sub(v, x3)), fp_add(s1j, s1j));
  Fp z3 = fp_mul(fp_sub(fp_sub(fp_sqr(fp_add(p.z, q.z)), z1z1), z2z2), h);
  return {x3, y3, z3};
}

static G2 g2_dbl(const G2 &p) {
  if (g2_is_inf(p)) return p;
  Fp2 a = fp2_sqr(p.x), b = fp2_sqr(p.y), c = fp2_sqr(b);
  Fp2 d = fp2_sub(fp2_sub(fp2_sqr(fp2_add(p.x, b)), a), c);
  d = fp2_add(d, d);
  Fp2 e = fp2_add(fp2_add(a, a), a);
  Fp2 f = fp2_sqr(e);
  Fp2 x3 = fp2_sub(f, fp2_add(d, d));
  Fp2 c8 = fp2_add(c, c); c8 = fp2_add(c8, c8); c8 = fp2_add(c8, c8);
  Fp2 y3 = fp2_sub(fp2_mul(e, fp2_sub(d, x3)), c8);
  Fp2 z3 = fp2_mul(p.y, p.z); z3 = fp2_add(z3, z3);
  return {x3, y3, z3};
}

static G2 g2_add(const G2 &p, const G2 &q) {
  if (g2_is_inf(p)) return q;
  if (g2_is_inf(q)) return p;
  Fp2 z1z1 = fp2_sqr(p.z), z2z2 = fp2_sqr(q.z);
  Fp2 u1 = fp2_mul(p.x, z2z2), u2 = fp2_mul(q.x, z1z1);
  Fp2 s1 = fp2_mul(fp2_mul(p.y, q.z), z2z2), s2 = fp2_mul(fp2_mul(q.y, p.z), z1z1);
  Fp2 h = fp2_sub(u2, u1), r = fp2_sub(s2, s1);
  if (fp2_is_zero(h)) {
    if (fp2_is_zero(r)) return g2_dbl(p);
    return {FP2_ONE, FP2_ONE, FP2_ZERO};
  }
  Fp2 i = fp2_add(h, h); i = fp2_sqr(i);
  Fp2 j = fp2_mul(h, i);
  Fp2 rr = fp2_add(r, r);
  Fp2 v = fp2_mul(u1, i);
  Fp2 x3 = fp2_sub(fp2_sub(fp2_sqr(rr), j), fp2_add(v, v));
  Fp2 s1j = fp2_mul(s1, j);
  Fp2 y3 = fp2_sub(fp2_mul(rr, fp2_sub(v, x3)), fp2_add(s1j, s1j));
  Fp2 z3 = fp2_mul(fp2_sub(fp2_sub(fp2_sqr(fp2_add(p.z, q.z)), z1z1), z2z2), h);
  return {x3, y3, z3};
}

// scalar reduction mod r (schoolbook: conditional subtract after compare)
static void scalar_mod_r(u64 *s) {
  // s is 4 limbs; r has top bit pattern such that s < 2^256 < 2r is not
  // guaranteed; subtract while >= r (at most a few iterations)
  while (cmp4(s, R_ORDER) >= 0) sub4(s, s, R_ORDER);
}

static G1 g1_scalar_mul(const G1 &p, const u64 *s4) {
  u64 s[4] = {s4[0], s4[1], s4[2], s4[3]};
  scalar_mod_r(s);
  G1 r = {R1, R1, FP_ZERO};
  G1 q = p;
  for (int i = 0; i < 256; ++i) {
    if ((s[i / 64] >> (i % 64)) & 1) r = g1_add(r, q);
    q = g1_dbl(q);
  }
  return r;
}

static G2 g2_scalar_mul(const G2 &p, const u64 *s4) {
  u64 s[4] = {s4[0], s4[1], s4[2], s4[3]};
  scalar_mod_r(s);
  G2 r = {FP2_ONE, FP2_ONE, FP2_ZERO};
  G2 q = p;
  for (int i = 0; i < 256; ++i) {
    if ((s[i / 64] >> (i % 64)) & 1) r = g2_add(r, q);
    q = g2_dbl(q);
  }
  return r;
}

// ------------------------------------------------------------- pairing ----

// Miller loop over E(Fq2) with the twist embedding handled sparsely:
// mirrors native/bn_pairing.py (Fq12-affine evaluation), but keeps the
// running point in Fq2 affine coordinates and builds the sparse line
// elements directly, which is equivalent and far cheaper.

struct AffG2 { Fp2 x, y; bool inf; };

// line through (affine Fq2) points a, b evaluated at G1 point (px, py):
// in the Fq12 embedding used by bn_pairing.py, x_T = x*w^2, y_T = y*w^3.
// For a line y - (m*x + c): f = py - m*px*w^2 - c*w^3 ... expanded into
// the sparse Fq12 element with components (c0.c0, c1.c1, c1.c2)? To stay
// bit-faithful to the oracle we simply build the same Fq12 values.
static Fp12 fq12_from_g1x(const Fp &v) {
  Fp12 r = {{{v, FP_ZERO}, FP2_ZERO, FP2_ZERO}, FP6_ZERO};
  return r;
}

static Fp12 fq12_xw2(const Fp2 &x) {
  Fp12 r = {{FP2_ZERO, x, FP2_ZERO}, FP6_ZERO};
  return r;
}

static Fp12 fq12_yw3(const Fp2 &y) {
  Fp12 r = {FP6_ZERO, {FP2_ZERO, y, FP2_ZERO}};
  return r;
}

struct PtFq12 { Fp12 x, y; };

static Fp12 linefunc(const PtFq12 &p1, const PtFq12 &p2, const PtFq12 &t) {
  if (!fp12_eq(p1.x, p2.x)) {
    Fp12 m = fp12_mul(fp12_sub(p2.y, p1.y), fp12_inv(fp12_sub(p2.x, p1.x)));
    return fp12_sub(fp12_mul(m, fp12_sub(t.x, p1.x)), fp12_sub(t.y, p1.y));
  }
  if (fp12_eq(p1.y, p2.y)) {
    Fp12 x2 = fp12_sqr(p1.x);
    Fp12 x23 = fp12_add(fp12_add(x2, x2), x2);
    Fp12 m = fp12_mul(x23, fp12_inv(fp12_add(p1.y, p1.y)));
    return fp12_sub(fp12_mul(m, fp12_sub(t.x, p1.x)), fp12_sub(t.y, p1.y));
  }
  return fp12_sub(t.x, p1.x);
}

static PtFq12 ptfq12_add(const PtFq12 &p1, const PtFq12 &p2) {
  Fp12 m;
  if (fp12_eq(p1.x, p2.x) && fp12_eq(p1.y, p2.y)) {
    Fp12 x2 = fp12_sqr(p1.x);
    Fp12 x23 = fp12_add(fp12_add(x2, x2), x2);
    m = fp12_mul(x23, fp12_inv(fp12_add(p1.y, p1.y)));
  } else {
    m = fp12_mul(fp12_sub(p2.y, p1.y), fp12_inv(fp12_sub(p2.x, p1.x)));
  }
  Fp12 x3 = fp12_sub(fp12_sub(fp12_sqr(m), p1.x), p2.x);
  Fp12 y3 = fp12_sub(fp12_mul(m, fp12_sub(p1.x, x3)), p1.y);
  return {x3, y3};
}

// ate loop count 6x+2 = 0x19d797039be763ba8 (65 bits)
static const u64 ATE_LO = 0x9d797039be763ba8ULL;
static const u64 ATE_HI = 0x1ULL;

static inline int ate_bit(int i) {
  return i < 64 ? (int)((ATE_LO >> i) & 1) : (int)((ATE_HI >> (i - 64)) & 1);
}

static Fp12 miller_loop(const AffG2 &q, const Fp &px, const Fp &py,
                        bool p_inf) {
  if (q.inf || p_inf) return FP12_ONE;
  PtFq12 qt = {fq12_xw2(q.x), fq12_yw3(q.y)};
  PtFq12 pt = {fq12_from_g1x(px), fq12_from_g1x(py)};
  PtFq12 r = qt;
  Fp12 f = FP12_ONE;
  for (int i = 63; i >= 0; --i) {  // bit_length(ate)=65 -> start at 65-2
    f = fp12_mul(fp12_sqr(f), linefunc(r, r, pt));
    r = ptfq12_add(r, r);
    if (ate_bit(i)) {
      f = fp12_mul(f, linefunc(r, qt, pt));
      r = ptfq12_add(r, qt);
    }
  }
  PtFq12 q1 = {fp12_frobenius(qt.x, 1), fp12_frobenius(qt.y, 1)};
  PtFq12 q2 = {fp12_frobenius(qt.x, 2), fp12_frobenius(qt.y, 2)};
  PtFq12 nq2 = {q2.x, fp12_neg(q2.y)};
  f = fp12_mul(f, linefunc(r, q1, pt));
  r = ptfq12_add(r, q1);
  f = fp12_mul(f, linefunc(r, nq2, pt));
  return f;
}

// (p^4 - p^2 + 1) / r, 12 limbs LE
static const u64 HARD_EXP[12] = {
    0xe81bb482ccdf42b1ULL, 0x5abf5cc4f49c36d4ULL, 0xf1154e7e1da014fdULL,
    0xdcc7b44c87cdbacfULL, 0xaaa441e3954bcf8aULL, 0x6b887d56d5095f23ULL,
    0x79581e16f3fd90c6ULL, 0x3b1b1355d189227dULL, 0x4e529a5861876f6bULL,
    0x6c0eb522d5b12278ULL, 0x331ec15183177fafULL, 0x01baaa710b0759adULL};

static Fp12 final_exponentiation(const Fp12 &f) {
  Fp12 g = fp12_mul(fp12_conj(f), fp12_inv(f));
  g = fp12_mul(fp12_frobenius(g, 2), g);
  return fp12_pow(g, HARD_EXP, 12);
}

// ------------------------------------------------------------ byte ABI ----

static bool g1_from_bytes(const uint8_t *b, G1 *out) {
  bool zero = true;
  for (int i = 0; i < 64; ++i) zero &= (b[i] == 0);
  if (zero) { *out = {R1, R1, FP_ZERO}; return true; }
  out->x = fp_from_bytes(b);
  out->y = fp_from_bytes(b + 32);
  out->z = R1;
  return true;
}

static void g1_to_bytes(const G1 &p, uint8_t *out) {
  if (g1_is_inf(p)) { memset(out, 0, 64); return; }
  Fp zi = fp_inv(p.z);
  Fp zi2 = fp_sqr(zi);
  fp_to_bytes(fp_mul(p.x, zi2), out);
  fp_to_bytes(fp_mul(p.y, fp_mul(zi2, zi)), out + 32);
}

static bool g2_from_bytes(const uint8_t *b, G2 *out) {
  bool zero = true;
  for (int i = 0; i < 128; ++i) zero &= (b[i] == 0);
  if (zero) { *out = {FP2_ONE, FP2_ONE, FP2_ZERO}; return true; }
  out->x = {fp_from_bytes(b), fp_from_bytes(b + 32)};
  out->y = {fp_from_bytes(b + 64), fp_from_bytes(b + 96)};
  out->z = FP2_ONE;
  return true;
}

static void g2_to_bytes(const G2 &p, uint8_t *out) {
  if (g2_is_inf(p)) { memset(out, 0, 128); return; }
  Fp2 zi = fp2_inv(p.z);
  Fp2 zi2 = fp2_sqr(zi);
  Fp2 x = fp2_mul(p.x, zi2);
  Fp2 y = fp2_mul(p.y, fp2_mul(zi2, zi));
  fp_to_bytes(x.a, out); fp_to_bytes(x.b, out + 32);
  fp_to_bytes(y.a, out + 64); fp_to_bytes(y.b, out + 96);
}

static void scalar_from_bytes(const uint8_t *b, u64 *s) {
  for (int i = 0; i < 4; ++i) {
    u64 w = 0;
    for (int j = 7; j >= 0; --j) w = (w << 8) | b[i * 8 + j];
    s[i] = w;
  }
}

extern "C" {

void bn254_g1_mul(const uint8_t *pt, const uint8_t *scalar, uint8_t *out) {
  G1 p; g1_from_bytes(pt, &p);
  u64 s[4]; scalar_from_bytes(scalar, s);
  g1_to_bytes(g1_scalar_mul(p, s), out);
}

void bn254_g2_mul(const uint8_t *pt, const uint8_t *scalar, uint8_t *out) {
  G2 p; g2_from_bytes(pt, &p);
  u64 s[4]; scalar_from_bytes(scalar, s);
  g2_to_bytes(g2_scalar_mul(p, s), out);
}

void bn254_g1_add(const uint8_t *a, const uint8_t *b, uint8_t *out) {
  G1 p, q; g1_from_bytes(a, &p); g1_from_bytes(b, &q);
  g1_to_bytes(g1_add(p, q), out);
}

// Pippenger MSM, window 8 bits
void bn254_g1_msm(size_t n, const uint8_t *pts, const uint8_t *scalars,
                  uint8_t *out) {
  const int C = 8, W = 32, B = 1 << C;
  std::vector<G1> points(n);
  std::vector<u64> sc(4 * n);
  for (size_t i = 0; i < n; ++i) {
    g1_from_bytes(pts + 64 * i, &points[i]);
    scalar_from_bytes(scalars + 32 * i, &sc[4 * i]);
    scalar_mod_r(&sc[4 * i]);
  }
  G1 total = {R1, R1, FP_ZERO};
  std::vector<G1> buckets(B);
  for (int w = W - 1; w >= 0; --w) {
    for (int k = 0; k < C; ++k) total = g1_dbl(total);
    for (int b = 0; b < B; ++b) buckets[b] = {R1, R1, FP_ZERO};
    for (size_t i = 0; i < n; ++i) {
      int off = w * C;
      int limb = off / 64, sh = off % 64;
      u64 d = sc[4 * i + limb] >> sh;
      if (sh + C > 64 && limb + 1 < 4) d |= sc[4 * i + limb + 1] << (64 - sh);
      d &= (u64)(B - 1);
      if (d) buckets[d] = g1_add(buckets[d], points[i]);
    }
    // running-sum bucket reduction
    G1 run = {R1, R1, FP_ZERO}, acc = {R1, R1, FP_ZERO};
    for (int b = B - 1; b >= 1; --b) {
      run = g1_add(run, buckets[b]);
      acc = g1_add(acc, run);
    }
    total = g1_add(total, acc);
  }
  g1_to_bytes(total, out);
}

void bn254_g2_msm(size_t n, const uint8_t *pts, const uint8_t *scalars,
                  uint8_t *out) {
  const int C = 8, W = 32, B = 1 << C;
  std::vector<G2> points(n);
  std::vector<u64> sc(4 * n);
  for (size_t i = 0; i < n; ++i) {
    g2_from_bytes(pts + 128 * i, &points[i]);
    scalar_from_bytes(scalars + 32 * i, &sc[4 * i]);
    scalar_mod_r(&sc[4 * i]);
  }
  G2 total = {FP2_ONE, FP2_ONE, FP2_ZERO};
  std::vector<G2> buckets(B);
  for (int w = W - 1; w >= 0; --w) {
    for (int k = 0; k < C; ++k) total = g2_dbl(total);
    for (int b = 0; b < B; ++b) buckets[b] = {FP2_ONE, FP2_ONE, FP2_ZERO};
    for (size_t i = 0; i < n; ++i) {
      int off = w * C;
      int limb = off / 64, sh = off % 64;
      u64 d = sc[4 * i + limb] >> sh;
      if (sh + C > 64 && limb + 1 < 4) d |= sc[4 * i + limb + 1] << (64 - sh);
      d &= (u64)(B - 1);
      if (d) buckets[d] = g2_add(buckets[d], points[i]);
    }
    G2 run = {FP2_ONE, FP2_ONE, FP2_ZERO}, acc = {FP2_ONE, FP2_ONE, FP2_ZERO};
    for (int b = B - 1; b >= 1; --b) {
      run = g2_add(run, buckets[b]);
      acc = g2_add(acc, run);
    }
    total = g2_add(total, acc);
  }
  g2_to_bytes(total, out);
}

// Product of pairings == 1 check: e(P1,Q1) * ... * e(Pn,Qn) == 1
int bn254_pairing_is_one(size_t n, const uint8_t *g1s, const uint8_t *g2s) {
  Fp12 f = FP12_ONE;
  for (size_t i = 0; i < n; ++i) {
    G1 p; g1_from_bytes(g1s + 64 * i, &p);
    G2 q; g2_from_bytes(g2s + 128 * i, &q);
    if (g1_is_inf(p) || g2_is_inf(q)) continue;
    // to affine
    Fp zi = fp_inv(p.z);
    Fp zi2 = fp_sqr(zi);
    Fp px = fp_mul(p.x, zi2), py = fp_mul(p.y, fp_mul(zi2, zi));
    Fp2 wi = fp2_inv(q.z);
    Fp2 wi2 = fp2_sqr(wi);
    AffG2 qa = {fp2_mul(q.x, wi2), fp2_mul(q.y, fp2_mul(wi2, wi)), false};
    f = fp12_mul(f, miller_loop(qa, px, py, false));
  }
  Fp12 r = final_exponentiation(f);
  return fp12_eq(r, FP12_ONE) ? 1 : 0;
}

}  // extern "C"
