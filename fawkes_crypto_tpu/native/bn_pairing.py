"""BN254 (alt_bn128) pairing: Fq2/Fq6/Fq12 tower, G1/G2 groups, optimal-ate
Miller loop, final exponentiation. Host-side (Python ints) — verification is
one cheap pairing product per proof (SURVEY.md §2.4: "CPU-side pairing ...
one-time per proof"); the C++ fast path mirrors this module.

Replaces bellman's pairing used at
/root/reference/fawkes-crypto/src/backend/bellman_groth16/verifier.rs:79-80.
Bit-compatible with Ethereum's alt_bn128 precompiles: same p, r, towers
(Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3-(9+u)), Fq12 = Fq6[w]/(w^2-v)),
same G1/G2 generators. The final-exponentiation hard part is tested against
the direct (p^4-p^2+1)/r integer exponent oracle.
"""

from __future__ import annotations

from ..engines.bn256 import Fq, Fr

P = Fq.p
R_ORDER = Fr.p

# BN parameter: p = 36x^4 + 36x^3 + 24x^2 + 6x + 1
BN_X = 4965661367192848881
ATE_LOOP_COUNT = 6 * BN_X + 2  # 29793968203157093288


# --------------------------------------------------------------------------
# Tower fields. Elements are immutable tuples of ints; all ops mod P.
# --------------------------------------------------------------------------

class Fq2:
    __slots__ = ("c0", "c1")
    NON_RESIDUE = (9, 1)  # xi = 9 + u

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
        # (a0 + a1 u)(b0 + b1 u) = a0b0 - a1b1 + (a0b1 + a1b0) u
        t0 = self.c0 * o.c0
        t1 = self.c1 * o.c1
        t2 = (self.c0 + self.c1) * (o.c0 + o.c1)
        return Fq2(t0 - t1, t2 - t0 - t1)

    __rmul__ = __mul__

    def square(self):
        a, b = self.c0, self.c1
        return Fq2((a + b) * (a - b), 2 * a * b)

    def mul_xi(self):
        # * (9 + u)
        return Fq2(9 * self.c0 - self.c1, self.c0 + 9 * self.c1)

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


XI = Fq2(9, 1)


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
        # * v: (c0, c1, c2) -> (c2*xi, c0, c1)
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
        """Conjugation over Fq6 == raising to p^6 (unitary inverse)."""
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
        """x -> x^(p^power) via coefficientwise Fq2 Frobenius + constants."""
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
    """_FROB[k][i] = xi^(i*(p^k-1)/6) in Fq2 for i=0..5."""
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

B_G1 = 3
B_G2 = Fq2(3, 0) * Fq2(9, 1).inv()  # 3/(9+u)

G1_GEN = (1, 2)
G2_GEN = (
    Fq2(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    Fq2(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
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


def g2_is_in_subgroup(p):
    return g_mul(p, R_ORDER) is None if p is not None else True


# --------------------------------------------------------------------------
# Pairing
# --------------------------------------------------------------------------

def _twist(q):
    """psi: E'(Fq2) -> E(Fq12), (x,y) -> (x w^2, y w^3)."""
    if q is None:
        return None
    x, y = q
    xw2 = Fq12(Fq6(Fq2.zero(), x, Fq2.zero()), Fq6.zero())          # x * v = w^2
    yw3 = Fq12(Fq6.zero(), Fq6(Fq2.zero(), y, Fq2.zero()))          # y * v w = w^3
    return (xw2, yw3)


def _embed_g1(p):
    x, y = p
    return (
        Fq12(Fq6(Fq2(x, 0), Fq2.zero(), Fq2.zero()), Fq6.zero()),
        Fq12(Fq6(Fq2(y, 0), Fq2.zero(), Fq2.zero()), Fq6.zero()),
    )


def _fq12_frob_point(q, power=1):
    return (q[0].frobenius(power), q[1].frobenius(power))


def _linefunc(p1, p2, t):
    """Line through p1, p2 evaluated at t (all E(Fq12) affine)."""
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
    """Optimal ate Miller loop: q in G2 (Fq2 affine), p in G1 (int affine).
    Returns Fq12 (no final exponentiation)."""
    if q is None or p is None:
        return Fq12.one()
    qt = _twist(q)
    pt = _embed_g1(p)
    r = qt
    f = Fq12.one()
    for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = f.square() * _linefunc(r, r, pt)
        r = _fq12_add(r, r)
        if (ATE_LOOP_COUNT >> i) & 1:
            f = f * _linefunc(r, qt, pt)
            r = _fq12_add(r, qt)
    q1 = _fq12_frob_point(qt, 1)
    q2 = _fq12_frob_point(qt, 2)
    nq2 = (q2[0], _neg12(q2[1]))
    f = f * _linefunc(r, q1, pt)
    r = _fq12_add(r, q1)
    f = f * _linefunc(r, nq2, pt)
    return f


def _neg12(x: Fq12) -> Fq12:
    return Fq12(Fq6.zero() - x.c0, Fq6.zero() - x.c1)


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((p^12-1)/r), easy part explicit, hard part by integer exponent
    (slow but exact; the optimized chain can be validated against this)."""
    # easy: f^(p^6-1) = conj(f) * f^-1 ; then ^(p^2+1)
    g = f.conj() * f.inv()
    g = g.frobenius(2) * g
    # hard: ^((p^4 - p^2 + 1) / r)
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
