"""Generic pairing algorithms (Miller loop + final exponentiation).

Shared by the host oracle and the circuit contexts through the TowerOps
interface (core/tower.py). Jacobian doubling/addition steps follow
eprint 2010/354; reference parity: src/circuit/pairing_chip.rs (generic
steps), src/circuit/bn256_pairing_chip.rs:104-323 (bn254 schedule),
src/circuit/bls12_381_pairing_chip.rs:122-287 (bls12-381 schedule).

Host and circuit run the *same* schedule, so oracle values match the
in-circuit computation by construction.
"""

from __future__ import annotations

from .assign import AssignedG2, AssignedG2Affine, AssignedG2Prepared
from ..utils.fields import six_u_plus_2_naf


class PairingOps:
    """Mixin over TowerOps; additionally requires:

    assert_false_cond(cond): constrain an assigned condition to be false
        (host: plain assert).
    """

    # ------------------------------------------------------------------
    # Line evaluation steps (curve-generic, Jacobian coordinates)
    # ------------------------------------------------------------------

    def doubling_step(self, pt: AssignedG2):
        """Tangent-line doubling of the Jacobian accumulator T, returning the
        sparse line coefficients [c0, c1, c2]. The fq2-op ORDER is part of the
        row-layout contract (templates/verifier assume it); the formulas are
        the standard ones from eprint 2010/354 §4."""
        x_sq = self.fq2_square(pt.x)

        y_sq = self.fq2_square(pt.y)
        two_y_sq = self.fq2_double(y_sq)
        four_y_sq = self.fq2_double(two_y_sq)
        four_y_quad = self.fq2_square(two_y_sq)
        eight_y_quad = self.fq2_double(four_y_quad)

        z_sq = self.fq2_square(pt.z)

        acc = self.fq2_mul(y_sq, pt.x)
        acc = self.fq2_double(acc)
        four_x_y_sq = self.fq2_double(acc)  # D = 4*x*y^2

        acc = self.fq2_double(x_sq)
        tangent = self.fq2_add(acc, x_sq)  # E = 3*x^2 (tangent slope numerator)
        two_tangent = self.fq2_double(tangent)
        tangent_sq = self.fq2_square(tangent)  # F = E^2

        acc = self.fq2_sub(tangent_sq, four_x_y_sq)
        out_x = self.fq2_sub(acc, four_x_y_sq)  # x' = F - 2D

        acc = self.fq2_sub(four_x_y_sq, out_x)
        acc = self.fq2_mul(acc, tangent)
        out_y = self.fq2_sub(acc, eight_y_quad)  # y' = E*(D - x') - 8*y^4

        y_z = self.fq2_mul(pt.y, pt.z)
        out_z = self.fq2_double(y_z)  # z' = 2*y*z

        acc = self.fq2_mul(z_sq, out_z)
        line_c0 = self.fq2_double(acc)  # 2*z'*z^2

        two_tangent_z_sq = self.fq2_mul(z_sq, two_tangent)
        line_c1 = self.fq2_neg(two_tangent_z_sq)  # -6*x^2*z^2

        two_tangent_x = self.fq2_mul(two_tangent, pt.x)
        line_c2 = self.fq2_sub(two_tangent_x, four_y_sq)  # 6*x^3 - 4*y^2

        pt.x, pt.y, pt.z = out_x, out_y, out_z
        return [line_c0, line_c1, line_c2]

    def addition_step(self, pt: AssignedG2, pq: AssignedG2Affine):
        """Chord-line mixed addition T += Q (Q affine), returning the line
        coefficients. Uses the theta/lambda notation of eprint 2010/354:
        theta = yQ*zT^3 - yT, lam = xQ*zT^2 - xT. Op order is layout-fixed."""
        z_t_sq = self.fq2_square(pt.z)
        yq_z = self.fq2_mul(pq.y, pt.z)
        yq_z_cubed = self.fq2_mul(yq_z, z_t_sq)
        theta = self.fq2_sub(yq_z_cubed, pt.y)
        two_theta = self.fq2_double(theta)

        xq_z_sq = self.fq2_mul(pq.x, z_t_sq)
        lam = self.fq2_sub(xq_z_sq, pt.x)
        two_lam = self.fq2_double(lam)
        four_lam_sq = self.fq2_square(two_lam)

        lam_cubed4 = self.fq2_mul(four_lam_sq, lam)  # 4*lam^3
        acc = self.fq2_double(four_lam_sq)
        x_lam_sq8 = self.fq2_mul(acc, pt.x)  # 8*xT*lam^2
        acc = self.fq2_square(two_theta)
        acc = self.fq2_sub(acc, lam_cubed4)
        out_x = self.fq2_sub(acc, x_lam_sq8)  # x' = 4theta^2 - 4lam^3 - 8xT*lam^2

        chord = self.fq2_mul(four_lam_sq, pt.x)
        chord = self.fq2_sub(chord, out_x)
        chord = self.fq2_mul(two_theta, chord)
        y_corr = self.fq2_mul(two_lam, four_lam_sq)
        y_corr = self.fq2_mul(y_corr, pt.y)
        out_y = self.fq2_sub(chord, y_corr)

        out_z = self.fq2_mul(pt.z, two_lam)

        line_c0 = self.fq2_double(out_z)
        acc = self.fq2_double(two_theta)
        line_c1 = self.fq2_neg(acc)
        theta_xq = self.fq2_double(two_theta)
        theta_xq = self.fq2_mul(theta_xq, pq.x)
        yq_z_new = self.fq2_mul(pq.y, out_z)
        yq_z_new = self.fq2_double(yq_z_new)
        line_c2 = self.fq2_sub(theta_xq, yq_z_new)

        pt.x, pt.y, pt.z = out_x, out_y, out_z
        return [line_c0, line_c1, line_c2]

    def g2affine_to_g2(self, g2: AssignedG2Affine) -> AssignedG2:
        # identity not supported
        self.assert_false_cond(g2.z)
        z = self.fq2_assign_one()
        return AssignedG2(g2.x, g2.y, z)

    def g2_neg(self, g2: AssignedG2Affine) -> AssignedG2Affine:
        return AssignedG2Affine(g2.x, self.fq2_neg(g2.y), g2.z)

    # ------------------------------------------------------------------
    # Curve-dispatched schedule
    # ------------------------------------------------------------------

    def prepare_g2(self, g2: AssignedG2Affine) -> AssignedG2Prepared:
        if self.pairing_curve.name == "bn254":
            return self._prepare_g2_bn(g2)
        return self._prepare_g2_bls(g2)

    def multi_miller_loop(self, terms) -> tuple:
        if self.pairing_curve.name == "bn254":
            return self._multi_miller_loop_bn(terms)
        return self._multi_miller_loop_bls(terms)

    def final_exponentiation(self, f):
        if self.pairing_curve.name == "bn254":
            return self._final_exponentiation_bn(f)
        return self._final_exponentiation_bls(f)

    def pairing(self, terms):
        prepared = [(p, self.prepare_g2(q)) for (p, q) in terms]
        f = self.multi_miller_loop(prepared)
        return self.final_exponentiation(f)

    def check_pairing(self, terms):
        res = self.pairing(terms)
        self.fq12_assert_one(res)

    # ------------------------------------------------------------------
    # bn254
    # ------------------------------------------------------------------

    def _prepare_g2_bn(self, g2: AssignedG2Affine) -> AssignedG2Prepared:
        naf_digits = six_u_plus_2_naf()
        neg_g2 = self.g2_neg(g2)

        coeffs = []
        r = self.g2affine_to_g2(g2)

        for i in reversed(range(1, len(naf_digits))):
            coeffs.append(self.doubling_step(r))
            x = naf_digits[i - 1]
            if x == 1:
                coeffs.append(self.addition_step(r, g2))
            elif x == -1:
                coeffs.append(self.addition_step(r, neg_g2))

        curve = self.pairing_curve
        c11 = self.fq2_assign_constant(curve.frob_fq6_c1[1])
        c12 = self.fq2_assign_constant(curve.frob_fq6_c1[2])
        xi = self.fq2_assign_constant(curve.xi_to_q_minus_1_over_2)

        # q1 = frob(g2)
        q1x = self.fq2_mul((g2.x[0], self.int_neg(g2.x[1])), c11)
        q1y = self.fq2_mul((g2.y[0], self.int_neg(g2.y[1])), xi)
        q1 = AssignedG2Affine(q1x, q1y, g2.z)
        coeffs.append(self.addition_step(r, q1))

        # -q2 = -frob^2(g2) (only x is scaled; y stays)
        mq2x = self.fq2_mul(g2.x, c12)
        minusq2 = AssignedG2Affine(mq2x, g2.y, g2.z)
        coeffs.append(self.addition_step(r, minusq2))

        return AssignedG2Prepared(coeffs)

    def _ell_bn(self, f, coeffs, p):
        c00 = self.int_mul(coeffs[0][0], p.y)
        c01 = self.int_mul(coeffs[0][1], p.y)
        c10 = self.int_mul(coeffs[1][0], p.x)
        c11 = self.int_mul(coeffs[1][1], p.x)
        return self.fq12_mul_by_034(f, (c00, c01), (c10, c11), coeffs[2])

    def _multi_miller_loop_bn(self, terms):
        naf_digits = six_u_plus_2_naf()
        pairs = []
        for p, q in terms:
            self.assert_false_cond(p.z)
            pairs.append((p, iter(q.coeffs)))

        f = self.fq12_assign_one()

        for i in reversed(range(1, len(naf_digits))):
            if i != len(naf_digits) - 1:
                f = self.fq12_square(f)
            for p, it in pairs:
                f = self._ell_bn(f, next(it), p)
            if naf_digits[i - 1] != 0:
                for p, it in pairs:
                    f = self._ell_bn(f, next(it), p)

        for p, it in pairs:
            f = self._ell_bn(f, next(it), p)
        for p, it in pairs:
            f = self._ell_bn(f, next(it), p)
        for _, it in pairs:
            assert next(it, None) is None

        return f

    def exp_by_x(self, f):
        x = self.pairing_curve.x
        res = self.fq12_assign_one()
        for i in reversed(range(64)):
            res = self.fq12_cyclotomic_square(res)
            if (x >> i) & 1 == 1:
                res = self.fq12_mul(res, f)
        return res

    def _final_exponentiation_bn(self, f):
        f1 = self.fq12_conjugate(f)
        f2 = self.fq12_unsafe_invert(f)

        r = self.fq12_mul(f1, f2)
        f2 = r
        r = self.fq12_frobenius_map(r, 2)
        r = self.fq12_mul(r, f2)

        fp = self.fq12_frobenius_map(r, 1)
        fp2 = self.fq12_frobenius_map(r, 2)
        fp3 = self.fq12_frobenius_map(fp2, 1)

        fu = self.exp_by_x(r)
        fu2 = self.exp_by_x(fu)
        fu3 = self.exp_by_x(fu2)

        y3 = self.fq12_frobenius_map(fu, 1)
        fu2p = self.fq12_frobenius_map(fu2, 1)
        fu3p = self.fq12_frobenius_map(fu3, 1)
        y2 = self.fq12_frobenius_map(fu2, 2)

        y0 = self.fq12_mul(fp, fp2)
        y0 = self.fq12_mul(y0, fp3)

        y1 = self.fq12_conjugate(r)
        y5 = self.fq12_conjugate(fu2)
        y3 = self.fq12_conjugate(y3)

        y4 = self.fq12_mul(fu, fu2p)
        y4 = self.fq12_conjugate(y4)

        y6 = self.fq12_mul(fu3, fu3p)
        y6 = self.fq12_conjugate(y6)

        y6 = self.fq12_cyclotomic_square(y6)
        y6 = self.fq12_mul(y6, y4)
        y6 = self.fq12_mul(y6, y5)

        t1 = self.fq12_mul(y3, y5)
        t1 = self.fq12_mul(t1, y6)

        y6 = self.fq12_mul(y6, y2)

        t1 = self.fq12_cyclotomic_square(t1)
        t1 = self.fq12_mul(t1, y6)
        t1 = self.fq12_cyclotomic_square(t1)

        t0 = self.fq12_mul(t1, y1)
        t1 = self.fq12_mul(t1, y0)
        t0 = self.fq12_cyclotomic_square(t0)
        t0 = self.fq12_mul(t0, t1)
        return t0

    # ------------------------------------------------------------------
    # bls12-381
    # ------------------------------------------------------------------

    def _prepare_g2_bls(self, g2: AssignedG2Affine) -> AssignedG2Prepared:
        x = self.pairing_curve.x
        f = self.g2affine_to_g2(g2)
        coeffs = []

        found_one = False
        for i in reversed(range(64)):
            bit = ((x >> 1) >> i) & 1 == 1
            if not found_one:
                found_one = bit
                continue
            coeffs.append(self.doubling_step(f))
            if bit:
                coeffs.append(self.addition_step(f, g2))
        coeffs.append(self.doubling_step(f))

        return AssignedG2Prepared(coeffs)

    def _ell_bls(self, f, coeffs, p):
        c00 = self.int_mul(coeffs[0][0], p.y)
        c01 = self.int_mul(coeffs[0][1], p.y)
        c10 = self.int_mul(coeffs[1][0], p.x)
        c11 = self.int_mul(coeffs[1][1], p.x)
        return self.fq12_mul_by_014(f, coeffs[2], (c10, c11), (c00, c01))

    def _multi_miller_loop_bls(self, terms):
        x = self.pairing_curve.x
        pairs = []
        for p, q in terms:
            self.assert_false_cond(p.z)
            pairs.append((p, iter(q.coeffs)))

        f = self.fq12_assign_one()

        found_one = False
        for i in reversed(range(64)):
            bit = ((x >> 1) >> i) & 1 == 1
            if not found_one:
                found_one = bit
                continue
            for p, it in pairs:
                f = self._ell_bls(f, next(it), p)
            if bit:
                for p, it in pairs:
                    f = self._ell_bls(f, next(it), p)
            f = self.fq12_square(f)

        for p, it in pairs:
            f = self._ell_bls(f, next(it), p)

        return self.fq12_conjugate(f)

    def cyclotomic_exp(self, f):
        x = self.pairing_curve.x
        tmp = self.fq12_assign_one()
        found_one = False
        for i in reversed(range(64)):
            bit = (x >> i) & 1 == 1
            if found_one:
                tmp = self.fq12_cyclotomic_square(tmp)
            else:
                found_one = bit
            if bit:
                tmp = self.fq12_mul(tmp, f)
        return self.fq12_conjugate(tmp)

    def _final_exponentiation_bls(self, f):
        t0 = self.fq12_frobenius_map(f, 1)
        for _ in range(5):
            t0 = self.fq12_frobenius_map(t0, 1)

        t1 = self.fq12_unsafe_invert(f)
        t2 = self.fq12_mul(t0, t1)
        t1 = t2

        t2 = self.fq12_frobenius_map(t2, 1)
        t2 = self.fq12_frobenius_map(t2, 1)

        t2 = self.fq12_mul(t2, t1)
        t1 = self.fq12_cyclotomic_square(t2)
        t1 = self.fq12_conjugate(t1)
        t3 = self.cyclotomic_exp(t2)
        t4 = self.fq12_cyclotomic_square(t3)
        t5 = self.fq12_mul(t1, t3)
        t1 = self.cyclotomic_exp(t5)
        t0 = self.cyclotomic_exp(t1)
        t6 = self.cyclotomic_exp(t0)
        t6 = self.fq12_mul(t6, t4)
        t4 = self.cyclotomic_exp(t6)
        t5 = self.fq12_conjugate(t5)
        t = self.fq12_mul(t5, t2)
        t4 = self.fq12_mul(t4, t)
        t5 = self.fq12_conjugate(t2)
        t1 = self.fq12_mul(t1, t2)
        for _ in range(3):
            t1 = self.fq12_frobenius_map(t1, 1)
        t6 = self.fq12_mul(t6, t5)
        t6 = self.fq12_frobenius_map(t6, 1)
        t3 = self.fq12_mul(t3, t0)
        for _ in range(2):
            t3 = self.fq12_frobenius_map(t3, 1)
        t3 = self.fq12_mul(t3, t1)
        t3 = self.fq12_mul(t3, t6)
        return self.fq12_mul(t3, t4)
