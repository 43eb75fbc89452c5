"""Generic Fq2/Fq6/Fq12 tower arithmetic.

Written once against a small "integer ops" interface so the same algorithms
drive both the host oracle (plain ints, utils/host_ops.py) and the circuit
contexts (gate emission). Reference: src/circuit/fq12.rs (Fq2ChipOps /
Fq6ChipOps / Fq12ChipOps) and the curve-specific nonresidue/frobenius hooks in
src/circuit/bn256_pairing_chip.rs:29-97 and bls12_381_pairing_chip.rs:29-116.

Required host/circuit interface (duck-typed):
    pairing_curve : PairingCurve
    int_add(a, b), int_sub(a, b), int_mul(a, b), int_neg(a), int_square(a),
    int_unsafe_invert(a), assign_int_constant(c: int), assert_int_equal(a, b)

Tower elements are tuples: fq2 = (c0, c1), fq6 = (fq2, fq2, fq2),
fq12 = (fq6, fq6).
"""

from __future__ import annotations


class TowerOps:
    # ---------------- Fq2 ----------------

    def fq2_assign_zero(self):
        z = self.assign_int_constant(0)
        return (z, z)

    def fq2_assign_one(self):
        return (self.assign_int_constant(1), self.assign_int_constant(0))

    def fq2_assign_constant(self, c):
        return (self.assign_int_constant(c[0]), self.assign_int_constant(c[1]))

    def fq2_reduce(self, x):
        return (self.reduce(x[0]), self.reduce(x[1]))

    def fq2_assert_equal(self, x, y):
        self.assert_int_equal(x[0], y[0])
        self.assert_int_equal(x[1], y[1])

    def fq2_add(self, a, b):
        return (self.int_add(a[0], b[0]), self.int_add(a[1], b[1]))

    def fq2_sub(self, a, b):
        return (self.int_sub(a[0], b[0]), self.int_sub(a[1], b[1]))

    def fq2_double(self, a):
        return (self.int_add(a[0], a[0]), self.int_add(a[1], a[1]))

    def fq2_neg(self, a):
        return (self.int_neg(a[0]), self.int_neg(a[1]))

    def fq2_conjugate(self, a):
        return (a[0], self.int_neg(a[1]))

    def fq2_mul(self, a, b):
        # (a0 b0 - a1 b1, (a0+a1)(b0+b1) - a0 b0 - a1 b1)
        ab00 = self.int_mul(a[0], b[0])
        ab11 = self.int_mul(a[1], b[1])
        c0 = self.int_sub(ab00, ab11)
        a01 = self.int_add(a[0], a[1])
        b01 = self.int_add(b[0], b[1])
        c1 = self.int_mul(a01, b01)
        c1 = self.int_sub(c1, ab00)
        c1 = self.int_sub(c1, ab11)
        return (c0, c1)

    def fq2_square(self, a):
        return self.fq2_mul(a, a)

    def fq2_unsafe_invert(self, x):
        t0 = self.int_square(x[0])
        t1 = self.int_square(x[1])
        t0 = self.int_add(t0, t1)
        t = self.int_unsafe_invert(t0)
        c0 = self.int_mul(x[0], t)
        c1 = self.int_mul(x[1], t)
        return (c0, self.int_neg(c1))

    # Curve-specific: multiplication by the Fq6 nonresidue xi.
    def fq2_mul_by_nonresidue(self, a):
        name = self.pairing_curve.name
        if name == "bn254":
            # xi = 9 + u: c = 8a + a, then +/- the swapped component
            a2 = self.fq2_double(a)
            a4 = self.fq2_double(a2)
            a8 = self.fq2_double(a4)
            t = self.int_add(a8[0], a[0])
            c0 = self.int_sub(t, a[1])
            t = self.int_add(a8[1], a[0])
            c1 = self.int_add(t, a[1])
            return (c0, c1)
        elif name == "bls12_381":
            # xi = 1 + u
            return (self.int_sub(a[0], a[1]), self.int_add(a[0], a[1]))
        raise NotImplementedError(name)

    def fq2_frobenius_map(self, x, power: int):
        name = self.pairing_curve.name
        if name == "bls12_381":
            # p = 3 mod 4 -> frobenius is conjugation; reference uses int_neg
            return self.fq2_conjugate(x)
        c = self.pairing_curve.frob_fq2_c1[power % 2]
        v = self.assign_int_constant(c)
        return (x[0], self.int_mul(x[1], v))

    # ---------------- Fq6 ----------------

    def fq6_assign_zero(self):
        z = self.fq2_assign_zero()
        return (z, z, z)

    def fq6_assign_one(self):
        return (self.fq2_assign_one(), self.fq2_assign_zero(), self.fq2_assign_zero())

    def fq6_assign_constant(self, c):
        return tuple(self.fq2_assign_constant(ci) for ci in c)

    def fq6_reduce(self, x):
        return tuple(self.fq2_reduce(xi) for xi in x)

    def fq6_assert_equal(self, x, y):
        for xi, yi in zip(x, y):
            self.fq2_assert_equal(xi, yi)

    def fq6_add(self, a, b):
        return tuple(self.fq2_add(ai, bi) for ai, bi in zip(a, b))

    def fq6_sub(self, a, b):
        return tuple(self.fq2_sub(ai, bi) for ai, bi in zip(a, b))

    def fq6_double(self, a):
        return tuple(self.fq2_double(ai) for ai in a)

    def fq6_neg(self, a):
        return tuple(self.fq2_neg(ai) for ai in a)

    def fq6_mul(self, a, b):
        ab00 = self.fq2_mul(a[0], b[0])
        ab11 = self.fq2_mul(a[1], b[1])
        ab22 = self.fq2_mul(a[2], b[2])

        b12 = self.fq2_add(b[1], b[2])
        a12 = self.fq2_add(a[1], a[2])
        t = self.fq2_mul(a12, b12)
        t = self.fq2_sub(t, ab11)
        t = self.fq2_sub(t, ab22)
        t = self.fq2_mul_by_nonresidue(t)
        c0 = self.fq2_add(t, ab00)

        b01 = self.fq2_add(b[0], b[1])
        a01 = self.fq2_add(a[0], a[1])
        t = self.fq2_mul(a01, b01)
        t = self.fq2_sub(t, ab00)
        t = self.fq2_sub(t, ab11)
        nr22 = self.fq2_mul_by_nonresidue(ab22)
        c1 = self.fq2_add(t, nr22)

        b02 = self.fq2_add(b[0], b[2])
        a02 = self.fq2_add(a[0], a[2])
        t = self.fq2_mul(a02, b02)
        t = self.fq2_sub(t, ab00)
        t = self.fq2_add(t, ab11)
        c2 = self.fq2_sub(t, ab22)

        return (c0, c1, c2)

    def fq6_square(self, a):
        return self.fq6_mul(a, a)

    def fq6_mul_by_nonresidue(self, a):
        return (self.fq2_mul_by_nonresidue(a[2]), a[0], a[1])

    def fq6_mul_by_1(self, a, b1):
        ab11 = self.fq2_mul(a[1], b1)
        a12 = self.fq2_add(a[1], a[2])
        t = self.fq2_mul(a12, b1)
        t = self.fq2_sub(t, ab11)
        c0 = self.fq2_mul_by_nonresidue(t)

        a01 = self.fq2_add(a[0], a[1])
        t = self.fq2_mul(a01, b1)
        c1 = self.fq2_sub(t, ab11)

        return (c0, c1, ab11)

    def fq6_mul_by_01(self, a, b0, b1):
        ab00 = self.fq2_mul(a[0], b0)
        ab11 = self.fq2_mul(a[1], b1)

        a12 = self.fq2_add(a[1], a[2])
        t = self.fq2_mul(a12, b1)
        t = self.fq2_sub(t, ab11)
        t = self.fq2_mul_by_nonresidue(t)
        c0 = self.fq2_add(t, ab00)

        b01 = self.fq2_add(b0, b1)
        a01 = self.fq2_add(a[0], a[1])
        t = self.fq2_mul(a01, b01)
        t = self.fq2_sub(t, ab00)
        c1 = self.fq2_sub(t, ab11)

        a02 = self.fq2_add(a[0], a[2])
        t = self.fq2_mul(a02, b0)
        t = self.fq2_sub(t, ab00)
        c2 = self.fq2_add(t, ab11)

        return (c0, c1, c2)

    def fq6_unsafe_invert(self, x):
        c0 = self.fq2_mul_by_nonresidue(x[2])
        c0 = self.fq2_mul(c0, x[1])
        c0 = self.fq2_neg(c0)
        x0s = self.fq2_square(x[0])
        c0 = self.fq2_add(c0, x0s)

        c1 = self.fq2_square(x[2])
        c1 = self.fq2_mul_by_nonresidue(c1)
        x01 = self.fq2_mul(x[0], x[1])
        c1 = self.fq2_sub(c1, x01)

        c2 = self.fq2_square(x[1])
        x02 = self.fq2_mul(x[0], x[2])
        c2 = self.fq2_sub(c2, x02)

        c0x0 = self.fq2_mul(c0, x[0])
        c1x2 = self.fq2_mul(c1, x[2])
        c2x1 = self.fq2_mul(c2, x[1])
        t = self.fq2_add(c1x2, c2x1)
        t = self.fq2_mul_by_nonresidue(t)
        t = self.fq2_add(t, c0x0)

        t = self.fq2_unsafe_invert(t)

        return (self.fq2_mul(t, c0), self.fq2_mul(t, c1), self.fq2_mul(t, c2))

    def fq6_frobenius_map(self, x, power: int):
        c0 = self.fq2_frobenius_map(x[0], power)
        c1 = self.fq2_frobenius_map(x[1], power)
        c2 = self.fq2_frobenius_map(x[2], power)
        coeff_c1 = self.fq2_assign_constant(self.pairing_curve.frob_fq6_c1[power % 6])
        c1 = self.fq2_mul(c1, coeff_c1)
        coeff_c2 = self.fq2_assign_constant(self.pairing_curve.frob_fq6_c2[power % 6])
        c2 = self.fq2_mul(c2, coeff_c2)
        return (c0, c1, c2)

    # ---------------- Fq12 ----------------

    def fq12_assign_zero(self):
        z = self.fq6_assign_zero()
        return (z, z)

    def fq12_assign_one(self):
        return (self.fq6_assign_one(), self.fq6_assign_zero())

    def fq12_assign_constant(self, c):
        return (self.fq6_assign_constant(c[0]), self.fq6_assign_constant(c[1]))

    def fq12_reduce(self, x):
        return (self.fq6_reduce(x[0]), self.fq6_reduce(x[1]))

    def fq12_assert_eq(self, x, y):
        self.fq6_assert_equal(x[0], y[0])
        self.fq6_assert_equal(x[1], y[1])

    def fq12_assert_one(self, x):
        one = self.fq12_assign_one()
        self.fq12_assert_eq(x, one)

    def fq12_add(self, a, b):
        return (self.fq6_add(a[0], b[0]), self.fq6_add(a[1], b[1]))

    def fq12_sub(self, a, b):
        return (self.fq6_sub(a[0], b[0]), self.fq6_sub(a[1], b[1]))

    def fq12_double(self, a):
        return (self.fq6_double(a[0]), self.fq6_double(a[1]))

    def fq12_neg(self, a):
        return (self.fq6_neg(a[0]), self.fq6_neg(a[1]))

    def fq12_conjugate(self, x):
        return (x[0], self.fq6_neg(x[1]))

    def fq12_mul(self, a, b):
        ab00 = self.fq6_mul(a[0], b[0])
        ab11 = self.fq6_mul(a[1], b[1])
        a01 = self.fq6_add(a[0], a[1])
        b01 = self.fq6_add(b[0], b[1])
        c1 = self.fq6_mul(a01, b01)
        c1 = self.fq6_sub(c1, ab00)
        c1 = self.fq6_sub(c1, ab11)
        nr11 = self.fq6_mul_by_nonresidue(ab11)
        c0 = self.fq6_add(ab00, nr11)
        return (c0, c1)

    def fq12_square(self, a):
        return self.fq12_mul(a, a)

    def fq12_mul_by_014(self, x, c0, c1, c4):
        t0 = self.fq6_mul_by_01(x[0], c0, c1)
        t1 = self.fq6_mul_by_1(x[1], c4)
        o = self.fq2_add(c1, c4)
        x0 = self.fq6_mul_by_nonresidue(t1)
        x0 = self.fq6_add(x0, t0)
        x1 = self.fq6_add(x[0], x[1])
        x1 = self.fq6_mul_by_01(x1, c0, o)
        x1 = self.fq6_sub(x1, t0)
        x1 = self.fq6_sub(x1, t1)
        return (x0, x1)

    def fq12_mul_by_034(self, x, c0, c3, c4):
        t00 = self.fq2_mul(x[0][0], c0)
        t01 = self.fq2_mul(x[0][1], c0)
        t02 = self.fq2_mul(x[0][2], c0)
        t0 = (t00, t01, t02)

        t1 = self.fq6_mul_by_01(x[1], c3, c4)
        t2 = self.fq6_add(x[0], x[1])
        o = self.fq2_add(c0, c3)
        t2 = self.fq6_mul_by_01(t2, o, c4)
        t2 = self.fq6_sub(t2, t0)
        x1 = self.fq6_sub(t2, t1)
        t1 = self.fq6_mul_by_nonresidue(t1)
        x0 = self.fq6_add(t0, t1)
        return (x0, x1)

    def fp4_square(self, a0, a1):
        t0 = self.fq2_square(a0)
        t1 = self.fq2_square(a1)
        t2 = self.fq2_mul_by_nonresidue(t1)
        c0 = self.fq2_add(t2, t0)
        t2 = self.fq2_add(a0, a1)
        t2 = self.fq2_square(t2)
        t2 = self.fq2_sub(t2, t0)
        c1 = self.fq2_sub(t2, t1)
        return c0, c1

    def fq12_cyclotomic_square(self, x):
        t3, t4 = self.fp4_square(x[0][0], x[1][1])
        t2 = self.fq2_sub(t3, x[0][0])
        t2 = self.fq2_double(t2)
        c00 = self.fq2_add(t2, t3)

        t2 = self.fq2_add(t4, x[1][1])
        t2 = self.fq2_double(t2)
        c11 = self.fq2_add(t2, t4)

        t3, t4 = self.fp4_square(x[1][0], x[0][2])
        t5, t6 = self.fp4_square(x[0][1], x[1][2])

        t2 = self.fq2_sub(t3, x[0][1])
        t2 = self.fq2_double(t2)
        c01 = self.fq2_add(t2, t3)
        t2 = self.fq2_add(t4, x[1][2])
        t2 = self.fq2_double(t2)
        c12 = self.fq2_add(t2, t4)
        t3 = t6
        t3 = self.fq2_mul_by_nonresidue(t3)
        t2 = self.fq2_add(t3, x[1][0])
        t2 = self.fq2_double(t2)
        c10 = self.fq2_add(t2, t3)
        t2 = self.fq2_sub(t5, x[0][2])
        t2 = self.fq2_double(t2)
        c02 = self.fq2_add(t2, t5)

        return ((c00, c01, c02), (c10, c11, c12))

    def fq12_unsafe_invert(self, x):
        x0s = self.fq6_square(x[0])
        x1s = self.fq6_square(x[1])
        t = self.fq6_mul_by_nonresidue(x1s)
        t = self.fq6_sub(x0s, t)
        t = self.fq6_unsafe_invert(t)
        c0 = self.fq6_mul(t, x[0])
        c1 = self.fq6_mul(t, x[1])
        return (c0, self.fq6_neg(c1))

    def fq12_frobenius_map(self, x, power: int):
        c0 = self.fq6_frobenius_map(x[0], power)
        c1 = self.fq6_frobenius_map(x[1], power)
        coeff = self.fq2_assign_constant(self.pairing_curve.frob_fq12_c1[power % 12])
        c1c0 = self.fq2_mul(c1[0], coeff)
        c1c1 = self.fq2_mul(c1[1], coeff)
        c1c2 = self.fq2_mul(c1[2], coeff)
        return (c0, (c1c0, c1c1, c1c2))
