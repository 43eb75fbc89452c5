"""Host (exact, Python-int) elliptic curve arithmetic for G1 and G2.

Affine short-Weierstrass points; `None` is the identity. These serve as test
oracles and test-vector generators (reference uses halo2's curve types; this
framework derives everything from the curve parameters in utils/fields.py).
"""

from __future__ import annotations

from .fields import PairingCurve, fq2_inv_host, fq2_mul_host, inv_mod


# -- generic affine ops parameterised over a field implementation -----------


class _FieldOps:
    """Minimal field interface for affine point formulas."""

    def add(self, a, b):
        raise NotImplementedError

    def sub(self, a, b):
        raise NotImplementedError

    def mul(self, a, b):
        raise NotImplementedError

    def inv(self, a):
        raise NotImplementedError

    def neg(self, a):
        raise NotImplementedError

    def scalar(self, k: int):
        raise NotImplementedError


class FqOps(_FieldOps):
    def __init__(self, p: int):
        self.p = p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return (a * b) % self.p

    def inv(self, a):
        return inv_mod(a, self.p)

    def neg(self, a):
        return (-a) % self.p

    def scalar(self, k: int):
        return k % self.p


class Fq2Ops(_FieldOps):
    def __init__(self, p: int):
        self.p = p

    def add(self, a, b):
        return ((a[0] + b[0]) % self.p, (a[1] + b[1]) % self.p)

    def sub(self, a, b):
        return ((a[0] - b[0]) % self.p, (a[1] - b[1]) % self.p)

    def mul(self, a, b):
        return fq2_mul_host(a, b, self.p)

    def inv(self, a):
        return fq2_inv_host(a, self.p)

    def neg(self, a):
        return ((-a[0]) % self.p, (-a[1]) % self.p)

    def scalar(self, k: int):
        return (k % self.p, 0)


def point_add(f: _FieldOps, a, b):
    if a is None:
        return b
    if b is None:
        return a
    ax, ay = a
    bx, by = b
    if ax == bx:
        if f.add(ay, by) == f.scalar(0):
            return None
        return point_double(f, a)
    lam = f.mul(f.sub(by, ay), f.inv(f.sub(bx, ax)))
    cx = f.sub(f.sub(f.mul(lam, lam), ax), bx)
    cy = f.sub(f.mul(lam, f.sub(ax, cx)), ay)
    return (cx, cy)


def point_double(f: _FieldOps, a):
    if a is None:
        return None
    ax, ay = a
    if ay == f.scalar(0):
        return None
    three_x2 = f.mul(f.scalar(3), f.mul(ax, ax))
    lam = f.mul(three_x2, f.inv(f.mul(f.scalar(2), ay)))
    cx = f.sub(f.sub(f.mul(lam, lam), ax), ax)
    cy = f.sub(f.mul(lam, f.sub(ax, cx)), ay)
    return (cx, cy)


def point_neg(f: _FieldOps, a):
    if a is None:
        return None
    return (a[0], f.neg(a[1]))


def point_mul(f: _FieldOps, a, k: int):
    result = None
    addend = a
    while k > 0:
        if k & 1:
            result = point_add(f, result, addend)
        addend = point_double(f, addend)
        k >>= 1
    return result


def msm_host(f: _FieldOps, points, scalars):
    acc = None
    for p, s in zip(points, scalars):
        acc = point_add(f, acc, point_mul(f, p, s))
    return acc


# -- curve-bound convenience wrappers ---------------------------------------


class G1:
    """Host G1 helper bound to a PairingCurve."""

    def __init__(self, curve: PairingCurve):
        self.curve = curve
        self.f = FqOps(curve.p)
        self.generator = curve.g1

    def add(self, a, b):
        return point_add(self.f, a, b)

    def double(self, a):
        return point_double(self.f, a)

    def neg(self, a):
        return point_neg(self.f, a)

    def mul(self, a, k):
        return point_mul(self.f, a, k % self.curve.r)

    def msm(self, points, scalars):
        return msm_host(self.f, points, [s % self.curve.r for s in scalars])

    def random(self, rng):
        return self.mul(self.generator, rng.randrange(1, self.curve.r))

    def is_on_curve(self, a) -> bool:
        if a is None:
            return True
        x, y = a
        p = self.curve.p
        return (y * y - x * x * x - self.curve.b) % p == 0


class G2:
    """Host G2 helper bound to a PairingCurve (coordinates in Fq2)."""

    def __init__(self, curve: PairingCurve):
        self.curve = curve
        self.f = Fq2Ops(curve.p)
        self.generator = curve.g2

    def add(self, a, b):
        return point_add(self.f, a, b)

    def neg(self, a):
        return point_neg(self.f, a)

    def mul(self, a, k):
        return point_mul(self.f, a, k % self.curve.r)

    def random(self, rng):
        return self.mul(self.generator, rng.randrange(1, self.curve.r))

    def is_on_curve(self, a) -> bool:
        if a is None:
            return True
        x, y = a
        y2 = self.f.mul(y, y)
        x3 = self.f.mul(self.f.mul(x, x), x)
        return self.f.sub(self.f.sub(y2, x3), self.curve.b2) == (0, 0)
