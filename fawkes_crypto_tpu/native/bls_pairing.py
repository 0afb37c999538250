"""BLS12-381 pairing: Fq2/Fq6/Fq12 tower, G1/G2 groups, x-ate Miller loop,
final exponentiation. Host-side (Python ints) — the engine-generic analog of
native/bn_pairing.py, giving the Groth16 backend its second curve
(/root/reference/fawkes-crypto/src/backend/bellman_groth16/engines.rs:18-22,
reference engines/bls12_381/mod.rs:8-97).

Tower (zkcrypto/bls12_381 conventions): Fq2 = Fq[u]/(u^2+1),
Fq6 = Fq2[v]/(v^3-(1+u)), Fq12 = Fq6[w]/(w^2-v). Curve y^2 = x^3 + 4,
twist y^2 = x^3 + 4(1+u) (M-twist). BLS parameter x = -0xd201000000010000;
the Miller loop runs over |x| and conjugates the result (valid because
f * conj(f) lies in Fq6*, which the easy part of the final exponentiation
kills). The final-exponentiation hard part uses the exact integer exponent
(p^4 - p^2 + 1)/r — slow-but-sure, same policy as bn_pairing.py.
"""

from __future__ import annotations

from ..engines.bls12_381 import Fq, Fr

P = Fq.p
R_ORDER = Fr.p

# BLS parameter: r = x^4 - x^2 + 1, p = (x-1)^2 r / 3 + x
BLS_X = 0xD201000000010000  # |x|; x itself is negative
assert (BLS_X**4 - BLS_X**2 + 1) == R_ORDER
assert ((BLS_X + 1) ** 2 * R_ORDER) // 3 - BLS_X == P


class Fq2:
    __slots__ = ("c0", "c1")
    NON_RESIDUE = (1, 1)  # xi = 1 + u

    def __init__(self, c0, c1):
        self.c0 = c0 % P
        self.c1 = c1 % P

    @staticmethod
    def zero():
        return Fq2(0, 0)

    @staticmethod
    def one():
        return Fq2(1, 0)

    def is_zero(self):
        return self.c0 == 0 and self.c1 == 0

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def __add__(self, o):
        return Fq2(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq2(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq2(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq2(self.c0 * o, self.c1 * o)
        t0 = self.c0 * o.c0
        t1 = self.c1 * o.c1
        t2 = (self.c0 + self.c1) * (o.c0 + o.c1)
        return Fq2(t0 - t1, t2 - t0 - t1)

    __rmul__ = __mul__

    def square(self):
        a, b = self.c0, self.c1
        return Fq2((a + b) * (a - b), 2 * a * b)

    def mul_xi(self):
        # * (1 + u)
        return Fq2(self.c0 - self.c1, self.c0 + self.c1)

    def conj(self):
        return Fq2(self.c0, -self.c1)

    def inv(self):
        d = pow(self.c0 * self.c0 + self.c1 * self.c1, -1, P)
        return Fq2(self.c0 * d, -self.c1 * d)

    def pow(self, e):
        r = Fq2.one()
        b = self
        while e:
            if e & 1:
                r = r * b
            b = b.square()
            e >>= 1
        return r

    def __repr__(self):
        return f"Fq2({self.c0}, {self.c1})"


XI = Fq2(1, 1)


class Fq6:
    __slots__ = ("c0", "c1", "c2")  # c0 + c1 v + c2 v^2, v^3 = xi

    def __init__(self, c0, c1, c2):
        self.c0 = c0
        self.c1 = c1
        self.c2 = c2

    @staticmethod
    def zero():
        return Fq6(Fq2.zero(), Fq2.zero(), Fq2.zero())

    @staticmethod
    def one():
        return Fq6(Fq2.one(), Fq2.zero(), Fq2.zero())

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero() and self.c2.is_zero()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1 and self.c2 == o.c2

    def __add__(self, o):
        return Fq6(self.c0 + o.c0, self.c1 + o.c1, self.c2 + o.c2)

    def __sub__(self, o):
        return Fq6(self.c0 - o.c0, self.c1 - o.c1, self.c2 - o.c2)

    def __neg__(self):
        return Fq6(-self.c0, -self.c1, -self.c2)

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq6(self.c0 * o, self.c1 * o, self.c2 * o)
        a0, a1, a2 = self.c0, self.c1, self.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        t0, t1, t2 = a0 * b0, a1 * b1, a2 * b2
        c0 = ((a1 + a2) * (b1 + b2) - t1 - t2).mul_xi() + t0
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + t2.mul_xi()
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fq6(c0, c1, c2)

    def mul_fq2(self, x: Fq2):
        return Fq6(self.c0 * x, self.c1 * x, self.c2 * x)

    def square(self):
        return self * self

    def mul_v(self):
        return Fq6(self.c2.mul_xi(), self.c0, self.c1)

    def inv(self):
        a0, a1, a2 = self.c0, self.c1, self.c2
        t0 = a0.square() - (a1 * a2).mul_xi()
        t1 = a2.square().mul_xi() - a0 * a1
        t2 = a1.square() - a0 * a2
        d = (a0 * t0 + (a2 * t1).mul_xi() + (a1 * t2).mul_xi()).inv()
        return Fq6(t0 * d, t1 * d, t2 * d)


class Fq12:
    __slots__ = ("c0", "c1")  # c0 + c1 w, w^2 = v

    def __init__(self, c0, c1):
        self.c0 = c0
        self.c1 = c1

    @staticmethod
    def one():
        return Fq12(Fq6.one(), Fq6.zero())

    def is_one(self):
        return self == Fq12.one()

    def __eq__(self, o):
        return self.c0 == o.c0 and self.c1 == o.c1

    def __add__(self, o):
        return Fq12(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq12(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq12(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq12(self.c0 * o, self.c1 * o)
        a0, a1 = self.c0, self.c1
        b0, b1 = o.c0, o.c1
        t0 = a0 * b0
        t1 = a1 * b1
        return Fq12(t0 + t1.mul_v(), (a0 + a1) * (b0 + b1) - t0 - t1)

    def square(self):
        a0, a1 = self.c0, self.c1
        t = a0 * a1
        c0 = (a0 + a1) * (a0 + a1.mul_v()) - t - t.mul_v()
        return Fq12(c0, t + t)

    def conj(self):
        return Fq12(self.c0, -self.c1)

    def inv(self):
        d = (self.c0 * self.c0 - (self.c1 * self.c1).mul_v()).inv()
        return Fq12(self.c0 * d, -(self.c1 * d))

    def pow(self, e):
        r = Fq12.one()
        b = self
        while e:
            if e & 1:
                r = r * b
            b = b.square()
            e >>= 1
        return r

    def frobenius(self, power=1):
        c = _FROB[power % 12]
        a0, a1, a2 = self.c0.c0, self.c0.c1, self.c0.c2
        b0, b1, b2 = self.c1.c0, self.c1.c1, self.c1.c2
        if power % 2 == 1:
            a0, a1, a2 = a0.conj(), a1.conj(), a2.conj()
            b0, b1, b2 = b0.conj(), b1.conj(), b2.conj()
        return Fq12(
            Fq6(a0, a1 * c[2], a2 * c[4]),
            Fq6(b0 * c[1], b1 * c[3], b2 * c[5]),
        )


def _frob_constants():
    """_FROB[k][i] = xi^(i*(p^k-1)/6) in Fq2 for i = 0..5."""
    out = {}
    for k in (1, 2, 3):
        e = (pow(P, k) - 1) // 6
        out[k] = [XI.pow(i * e) for i in range(6)]
    out[0] = [Fq2.one()] * 6
    return out


_FROB = _frob_constants()


# --------------------------------------------------------------------------
# Curve groups (affine, None == point at infinity)
# --------------------------------------------------------------------------

B_G1 = 4
B_G2 = Fq2(4, 4)  # 4 * (1 + u), M-twist

# Standard generators (draft-irtf-cfrg-pairing-friendly-curves / zkcrypto)
G1_GEN = (
    0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
    0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
)
G2_GEN = (
    Fq2(
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    ),
    Fq2(
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    ),
)


def _is_fq2(x):
    return isinstance(x, Fq2)


def g_add(p1, p2):
    """Generic affine add over Fq (ints mod P) or Fq2."""
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        y1n = (-y1) if _is_fq2(y1) else (-y1) % P
        if y2 == y1n:
            return None
        return g_double(p1)
    if _is_fq2(x1):
        l = (y2 - y1) * (x2 - x1).inv()
        x3 = l.square() - x1 - x2
        return (x3, l * (x1 - x3) - y1)
    l = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (l * l - x1 - x2) % P
    return (x3, (l * (x1 - x3) - y1) % P)


def g_double(p):
    if p is None:
        return None
    x, y = p
    if _is_fq2(x):
        if y.is_zero():
            return None
        l = x.square() * 3 * (y * 2).inv()
        x3 = l.square() - x * 2
        return (x3, l * (x - x3) - y)
    if y == 0:
        return None
    l = 3 * x * x * pow(2 * y, -1, P) % P
    x3 = (l * l - 2 * x) % P
    return (x3, (l * (x - x3) - y) % P)


def g_neg(p):
    if p is None:
        return None
    x, y = p
    return (x, -y) if _is_fq2(y) else (x, (-y) % P)


def g_mul(p, n: int):
    n %= R_ORDER
    r = None
    q = p
    while n:
        if n & 1:
            r = g_add(r, q)
        q = g_double(q)
        n >>= 1
    return r


def g1_is_on_curve(p):
    if p is None:
        return True
    x, y = p
    return (y * y - x * x * x - B_G1) % P == 0


def g2_is_on_curve(p):
    if p is None:
        return True
    x, y = p
    return y.square() == x.square() * x + B_G2


def g1_is_in_subgroup(p):
    """E(Fq) has cofactor h1 != 1 for BLS12-381, so (unlike BN254) G1
    membership needs an order check."""
    return g_mul(p, R_ORDER) is None if p is not None else True


def g2_is_in_subgroup(p):
    return g_mul(p, R_ORDER) is None if p is not None else True


# --------------------------------------------------------------------------
# Pairing
# --------------------------------------------------------------------------

def _twist(q):
    """psi: E'(Fq2) -> E(Fq12). M-twist: E' = E scaled by xi, so
    (x, y) -> (x / w^2, y / w^3) lands on E(Fq12); with w^2 = v and
    v^3 = xi this is (x * xi^-1 v^2, y * xi^-1 v w)."""
    if q is None:
        return None
    x, y = q
    xi_inv = XI.inv()
    xw = Fq12(Fq6(Fq2.zero(), Fq2.zero(), x * xi_inv), Fq6.zero())
    yw = Fq12(Fq6.zero(), Fq6(Fq2.zero(), y * xi_inv, Fq2.zero()))
    return (xw, yw)


def _embed_g1(p):
    x, y = p
    return (
        Fq12(Fq6(Fq2(x, 0), Fq2.zero(), Fq2.zero()), Fq6.zero()),
        Fq12(Fq6(Fq2(y, 0), Fq2.zero(), Fq2.zero()), Fq6.zero()),
    )


def _linefunc(p1, p2, t):
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if not (x1 == x2):
        m = (y2 - y1) * (x2 - x1).inv()
        return m * (xt - x1) - (yt - y1)
    if y1 == y2:
        m = x1.square() * 3 * (y1 + y1).inv()
        return m * (xt - x1) - (yt - y1)
    return xt - x1


def _fq12_add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and y1 == y2:
        m = x1.square() * 3 * (y1 + y1).inv()
    else:
        m = (y2 - y1) * (x2 - x1).inv()
    x3 = m.square() - x1 - x2
    return (x3, m * (x1 - x3) - y1)


def miller_loop(q, p):
    """x-ate Miller loop f_{|x|,Q}(P), conjugated for x < 0. q: Fq2
    affine G2 point, p: int affine G1 point. No final exponentiation."""
    if q is None or p is None:
        return Fq12.one()
    qt = _twist(q)
    pt = _embed_g1(p)
    r = qt
    f = Fq12.one()
    for i in range(BLS_X.bit_length() - 2, -1, -1):
        f = f.square() * _linefunc(r, r, pt)
        r = _fq12_add(r, r)
        if (BLS_X >> i) & 1:
            f = f * _linefunc(r, qt, pt)
            r = _fq12_add(r, qt)
    # x < 0: f_{-|x|} = 1 / f_{|x|} (up to vertical lines the final exp
    # kills); conj == inverse modulo Norm factors in Fq6*.
    return f.conj()


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((p^12-1)/r): easy part explicit, hard part by integer exponent."""
    g = f.conj() * f.inv()
    g = g.frobenius(2) * g
    e, rem = divmod(pow(P, 4) - pow(P, 2) + 1, R_ORDER)
    assert rem == 0
    return g.pow(e)


def pairing(q, p) -> Fq12:
    """e(P, Q) with P in G1, Q in G2."""
    return final_exponentiation(miller_loop(q, p))


def multi_pairing(pairs) -> Fq12:
    """prod e(P_i, Q_i): shared final exponentiation."""
    f = Fq12.one()
    for p, q in pairs:
        if p is None or q is None:
            continue
        f = f * miller_loop(q, p)
    return final_exponentiation(f)
