"""Non-native ("wrong field" W over native N) integer arithmetic.

Reference parity: src/circuit/integer_chip.rs (IntegerChipOps) and the
RangeChipOps limb assignment (src/circuit/range_chip.rs:262-348).

A value is limbs_le (108-bit limbs for 18-bit common ranges) plus a native
shadow, with the `times` overflow counter driving lazy reduction
(conditionally_reduce at times > 2^(overflow_bits-2), integer_chip.rs:375-382).
All witness hints (d, carries v_h/v_l, inverses) are computed with exact host
integers at trace time; the batched TPU path computes the same hints with
Barrett/Fermat kernels (kernels/ff_jax.py).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..core.assign import AssignedCondition, AssignedInteger, AssignedValue
from ..core.context import COMMON_RANGE_BITS, Context
from ..core.range_info import OVERFLOW_BITS, RangeInfo, range_info
from ..utils.fields import inv_mod


def decompose_bn(v: int, decompose: int, mask: int, n: int) -> Tuple[int, List[int]]:
    """(value mod n, 18-bit chunks) (reference range_chip.rs:270-280)."""
    chunks = [(v >> (i * COMMON_RANGE_BITS)) & mask for i in range(decompose)]
    return v % n, chunks


class IntegerContext:
    """W-over-N integer ops writing into a shared native Context."""

    def __init__(
        self,
        ctx: Context,
        w_modulus: int,
        common_bits: int = COMMON_RANGE_BITS,
        overflow_bits: int = OVERFLOW_BITS,
    ):
        self.ctx = ctx
        self.info: RangeInfo = range_info(w_modulus, ctx.n, common_bits, overflow_bits)

    # ------------------------------------------------------------------
    # RangeChipOps: limb assignment through the range region
    # ------------------------------------------------------------------

    def assign_common(self, v: int) -> AssignedValue:
        return self.ctx.assign_one_line_range_value([v], v, COMMON_RANGE_BITS)

    def assign_nonleading_limb(self, v: int) -> AssignedValue:
        info = self.info
        acc, chunks = decompose_bn(v, 6, info.common_range_mask, self.ctx.n)
        return self.ctx.assign_range_value(chunks, acc, info.limb_bits)

    def assign_w_ceil_leading_limb(self, v: int) -> AssignedValue:
        info = self.info
        acc, chunks = decompose_bn(
            v, info.w_ceil_leading_decompose, info.common_range_mask, self.ctx.n
        )
        return self.ctx.assign_range_value(chunks, acc, info.w_ceil_bits % info.limb_bits)

    def assign_d_leading_limb(self, v: int) -> AssignedValue:
        info = self.info
        acc, chunks = decompose_bn(
            v, info.d_leading_decompose, info.common_range_mask, self.ctx.n
        )
        return self.ctx.assign_range_value(chunks, acc, info.d_bits % info.limb_bits)

    # ------------------------------------------------------------------
    # Assignment
    # ------------------------------------------------------------------

    def assign_w(self, w: int) -> AssignedInteger:
        """Assign a value < w_ceil as range-checked limbs + native shadow."""
        info = self.info
        limbs = []
        for i in range(info.limbs - 1):
            limbs.append(
                self.assign_nonleading_limb((w >> (i * info.limb_bits)) & info.limb_mask)
            )
        limbs.append(
            self.assign_w_ceil_leading_limb(
                (w >> ((info.limbs - 1) * info.limb_bits)) & info.limb_mask
            )
        )
        native = self.ctx.sum_with_constant(list(zip(limbs, info.limb_coeffs)), None)
        return AssignedInteger(limbs, native, 1)

    def assign_d(self, d: int) -> Tuple[List[AssignedValue], AssignedValue]:
        info = self.info
        limbs = []
        for i in range(info.limbs - 1):
            limbs.append(
                self.assign_nonleading_limb((d >> (i * info.limb_bits)) & info.limb_mask)
            )
        limbs.append(
            self.assign_d_leading_limb(
                (d >> ((info.limbs - 1) * info.limb_bits)) & info.limb_mask
            )
        )
        native = self.ctx.sum_with_constant(list(zip(limbs, info.limb_coeffs)), None)
        return limbs, native

    def assign_int_constant(self, w: int) -> AssignedInteger:
        info = self.info
        w %= info.w_modulus
        limbs = [self.ctx.assign_constant(l) for l in info.bn_to_limbs(w)]
        native = self.ctx.assign_constant(w % self.ctx.n)
        return AssignedInteger(limbs, native, 1)

    def get_w_bn(self, a: AssignedInteger) -> int:
        info = self.info
        # lazy limbs are bounded by times * 2^limb_bits; assume_bits keeps
        # symbolic width bounds tight (no-op checked assert for plain ints)
        from ..batch.symbolic import assume_bits

        t_bits = max(a.times.bit_length(), 1) + 1
        lead_bits = info.w_ceil_bits - (info.limbs - 1) * info.limb_bits
        res = 0
        for i in reversed(range(info.limbs)):
            base = info.limb_bits if i < info.limbs - 1 else lead_bits
            res = (res << info.limb_bits) + assume_bits(
                a.limbs_le[i].val, base + t_bits
            )
        return res

    def get_w(self, a: AssignedInteger) -> int:
        return self.get_w_bn(a) % self.info.w_modulus

    # ------------------------------------------------------------------
    # Reduction
    # ------------------------------------------------------------------

    def reduce(self, a: AssignedInteger) -> AssignedInteger:
        """Witness a = d*w + rem and constrain via native + per-limb carries
        (integer_chip.rs:283-373)."""
        if a.times == 1:
            return a

        info = self.info
        n = self.ctx.n
        overflow_limit = info.overflow_limit
        assert a.times < overflow_limit

        a_bn = self.get_w_bn(a)
        d, rem = divmod(a_bn, info.w_modulus)

        assigned_rem = self.assign_w(rem)
        assigned_d = self.assign_common(d)

        # native-field constraint
        self.ctx.one_line_with_last(
            [(assigned_d, info.w_native), (assigned_rem.native, 1)],
            (a.native, -1),
            None,
            (),
            None,
        )

        from ..batch.symbolic import assume_bits, exact_sub

        a_limb_bound = info.limb_bits + max(a.times.bit_length(), 1) + 1
        rem_limbs = info.bn_to_limbs(rem)
        last_v: Optional[AssignedValue] = None
        for i in range(info.reduce_check_limbs):
            last_borrow = overflow_limit if i != 0 else 0
            carry = last_v.val if last_v is not None else 0
            # grouped so each subtraction is mathematically non-negative
            # (limb_modulus*overflow_limit dominates a's limb; pre_check)
            u = exact_sub(
                d * info.w_modulus_limbs_le[i]
                + rem_limbs[i]
                + info.limb_modulus * overflow_limit,
                assume_bits(a.limbs_le[i].val, a_limb_bound),
            )
            u = exact_sub(u + carry, last_borrow)
            v, v_rem = divmod(u, info.limb_modulus)
            assert v_rem == 0
            v_assigned = self.assign_nonleading_limb(v)

            self.ctx.one_line_with_last(
                [
                    (assigned_d, info.w_modulus_limbs_le[i] % n),
                    (assigned_rem.limbs_le[i], 1),
                    (a.limbs_le[i], -1),
                    (last_v, 1) if last_v is not None else (0, 0),
                ],
                (v_assigned, -info.limb_modulus % n),
                (info.limb_modulus * overflow_limit - (0 if i == 0 else overflow_limit)) % n,
                (),
                None,
            )
            last_v = v_assigned

        return assigned_rem

    def conditionally_reduce(self, a: AssignedInteger) -> AssignedInteger:
        threshold = 1 << (self.info.overflow_bits - 2)
        return self.reduce(a) if a.times > threshold else a

    # ------------------------------------------------------------------
    # Linear ops (lazy; no reduction unless the counter overflows)
    # ------------------------------------------------------------------

    def int_add(self, a: AssignedInteger, b: AssignedInteger) -> AssignedInteger:
        info = self.info
        limbs = [
            self.ctx.add(a.limbs_le[i], b.limbs_le[i]) for i in range(info.limbs)
        ]
        native = self.ctx.sum_with_constant(list(zip(limbs, info.limb_coeffs)), None)
        res = AssignedInteger(limbs, native, a.times + b.times)
        return self.conditionally_reduce(res)

    def int_sub(self, a: AssignedInteger, b: AssignedInteger) -> AssignedInteger:
        info = self.info
        upper_limbs = info.w_modulus_of_ceil_times[b.times]
        limbs = [
            self.ctx.sum_with_constant(
                [(a.limbs_le[i], 1), (b.limbs_le[i], -1)], upper_limbs[i]
            )
            for i in range(info.limbs)
        ]
        native = self.ctx.sum_with_constant(list(zip(limbs, info.limb_coeffs)), None)
        res = AssignedInteger(limbs, native, a.times + b.times + 1)
        return self.conditionally_reduce(res)

    def int_neg(self, a: AssignedInteger) -> AssignedInteger:
        info = self.info
        upper_limbs = info.w_modulus_of_ceil_times[a.times]
        limbs = [
            self.ctx.sum_with_constant([(a.limbs_le[i], -1)], upper_limbs[i])
            for i in range(info.limbs)
        ]
        native = self.ctx.sum_with_constant(list(zip(limbs, info.limb_coeffs)), None)
        res = AssignedInteger(limbs, native, a.times + 1)
        return self.conditionally_reduce(res)

    def int_mul_small_constant(self, a: AssignedInteger, b: int) -> AssignedInteger:
        threshold = 1 << (self.info.overflow_bits - 2)
        assert b < threshold
        info = self.info
        if a.times * b >= info.overflow_limit:
            a = self.reduce(a)
        limbs = [
            self.ctx.sum_with_constant([(a.limbs_le[i], b)], None)
            for i in range(info.limbs)
        ]
        native = self.ctx.sum_with_constant(list(zip(limbs, info.limb_coeffs)), None)
        res = AssignedInteger(limbs, native, a.times * b)
        return self.conditionally_reduce(res)

    # ------------------------------------------------------------------
    # Multiplication / division constraints
    # ------------------------------------------------------------------

    def _mul_constraints_on_limbs(self, a, b, d_limbs, rem) -> None:
        """Limb-convolution check of a*b = d*w + rem with carry witnesses
        (integer_chip.rs:73-193)."""
        info = self.info
        n = self.ctx.n
        assert a.times < info.overflow_limit
        assert b.times < info.overflow_limit
        assert rem.times == 1

        conv = []
        for pos in range(info.mul_check_limbs):
            r_bound = min(pos + 1, info.limbs)
            l_bound = max(pos - (info.limbs - 1), 0)
            conv.append(
                self.ctx.mul_add_with_next_line(
                    [
                        (
                            a.limbs_le[i],
                            b.limbs_le[pos - i],
                            d_limbs[i],
                            (-info.w_modulus_limbs_le[pos - i]) % n,
                        )
                        for i in range(l_bound, r_bound)
                    ]
                )
            )

        borrow = (info.limbs * info.limb_modulus + 2) % n
        borrow_exact = info.limbs * info.limb_modulus + 2

        # limb 0
        u = self.ctx.sum_with_constant(
            [(conv[0], 1), (rem.limbs_le[0], -1)],
            (info.limb_modulus * borrow_exact) % n,
        )
        v_h, v_l = self._carry_split(u)
        self._carry_line(v_h, v_l, u)

        # limbs 1..limbs
        for i in range(1, info.limbs):
            u = self.ctx.sum_with_constant(
                [
                    (conv[i], 1),
                    (rem.limbs_le[i], -1),
                    (v_h, info.limb_coeffs[1]),
                    (v_l, info.limb_coeffs[0]),
                ],
                (info.limb_modulus * borrow_exact - borrow_exact) % n,
            )
            v_h, v_l = self._carry_split(u)
            self._carry_line(v_h, v_l, u)

        # extra check limbs (needed for bls12-381 base field)
        for i in range(info.limbs, info.mul_check_limbs):
            u = self.ctx.sum_with_constant(
                [
                    (conv[i], 1),
                    (v_h, info.limb_coeffs[1]),
                    (v_l, info.limb_coeffs[0]),
                ],
                (info.limb_modulus * borrow_exact - borrow_exact) % n,
            )
            v_h, v_l = self._carry_split(u)
            self._carry_line(v_h, v_l, u)

    def _carry_split(self, u: AssignedValue):
        info = self.info
        v, r = divmod(u.val, info.limb_modulus)
        assert r == 0
        v_h_bn, v_l_bn = divmod(v, info.limb_modulus)
        return self.assign_common(v_h_bn), self.assign_nonleading_limb(v_l_bn)

    def _carry_line(self, v_h, v_l, u):
        info = self.info
        n = self.ctx.n
        self.ctx.one_line_with_last(
            [(v_h, info.limb_coeffs[2]), (v_l, info.limb_coeffs[1])],
            (u, -1),
            None,
            (),
            None,
        )

    def _mul_constraints_on_native(self, a, b, d_native, rem) -> None:
        info = self.info
        self.ctx.one_line(
            [
                (a.native, 0),
                (b.native, 0),
                (d_native, info.w_native % self.ctx.n),
                (rem.native, 1),
            ],
            None,
            (-1,),
            None,
        )

    def int_mul(self, a: AssignedInteger, b: AssignedInteger) -> AssignedInteger:
        info = self.info
        a_bn = self.get_w_bn(a)
        b_bn = self.get_w_bn(b)
        d, rem = divmod(a_bn * b_bn, info.w_modulus)

        assigned_rem = self.assign_w(rem)
        d_limbs, d_native = self.assign_d(d)

        self._mul_constraints_on_limbs(a, b, d_limbs, assigned_rem)
        self._mul_constraints_on_native(a, b, d_native, assigned_rem)
        return assigned_rem

    def int_square(self, a: AssignedInteger) -> AssignedInteger:
        return self.int_mul(a, a)

    def int_div(
        self, a: AssignedInteger, b: AssignedInteger
    ) -> Tuple[AssignedCondition, AssignedInteger]:
        """(b == 0, a/b); witnesses c with b*c = d*w + a' where a' is a (or 0
        when b == 0), constrained like int_mul (integer_chip.rs:493-538)."""
        info = self.info

        b = self.reduce(b)
        is_b_zero = self.is_int_zero(b)
        a_coeff = self.ctx.not_(is_b_zero)

        a_red = self.reduce(a)
        limbs = [
            self.ctx.mul(a_red.limbs_le[i], a_coeff.value) for i in range(info.limbs)
        ]
        native = self.ctx.mul(a_red.native, a_coeff.value)
        a_masked = AssignedInteger(limbs, native, a_red.times)

        a_bn = self.get_w_bn(a_masked)
        b_bn = self.get_w_bn(b)
        b_inv = inv_mod(b_bn % info.w_modulus, info.w_modulus)
        # b == 0 implies a was masked to 0, so c = a * 0 = 0 uniformly —
        # branch-free on purpose (lanes must not diverge under batch tracing)
        from ..batch.symbolic import exact_sub

        c = (a_bn * b_inv) % info.w_modulus
        d_bn = exact_sub(b_bn * c, a_bn) // info.w_modulus

        c_assigned = self.assign_w(c)
        d_limbs, d_native = self.assign_d(d_bn)

        self._mul_constraints_on_limbs(b, c_assigned, d_limbs, a_masked)
        self._mul_constraints_on_native(b, c_assigned, d_native, a_masked)
        return is_b_zero, c_assigned

    def int_unsafe_invert(self, x: AssignedInteger) -> AssignedInteger:
        one = self.assign_int_constant(1)
        c, v = self.int_div(one, x)
        self.ctx.assert_false(c)
        return v

    # ------------------------------------------------------------------
    # Predicates
    # ------------------------------------------------------------------

    def is_pure_zero(self, a: AssignedInteger) -> AssignedCondition:
        s = self.ctx.sum_with_constant([(l, 1) for l in a.limbs_le], None)
        return self.ctx.is_zero(s)

    def is_pure_w_modulus(self, a: AssignedInteger) -> AssignedCondition:
        assert a.times == 1
        info = self.info
        native_diff = self.ctx.add_constant(a.native, -(info.w_native % self.ctx.n))
        is_eq = self.ctx.is_zero(native_diff)
        for i in range(info.pure_w_check_limbs):
            limb_diff = self.ctx.add_constant(
                a.limbs_le[i], -info.w_modulus_limbs_le[i]
            )
            is_limb_eq = self.ctx.is_zero(limb_diff)
            is_eq = self.ctx.and_(is_eq, is_limb_eq)
        return is_eq

    def is_int_zero(self, a: AssignedInteger) -> AssignedCondition:
        a = self.reduce(a)
        is_zero = self.is_pure_zero(a)
        is_w = self.is_pure_w_modulus(a)
        return self.ctx.or_(is_zero, is_w)

    def is_int_equal(self, a: AssignedInteger, b: AssignedInteger) -> AssignedCondition:
        diff = self.int_sub(a, b)
        return self.is_int_zero(diff)

    def assert_int_equal(self, a: AssignedInteger, b: AssignedInteger) -> None:
        diff = self.int_sub(a, b)
        diff = self.reduce(diff)
        s = self.ctx.sum_with_constant([(l, 1) for l in diff.limbs_le], None)
        self.ctx.assert_constant(s, 0)

    def bisec_int(
        self, cond: AssignedCondition, a: AssignedInteger, b: AssignedInteger
    ) -> AssignedInteger:
        limbs = [
            self.ctx.bisec(cond, a.limbs_le[i], b.limbs_le[i])
            for i in range(self.info.limbs)
        ]
        native = self.ctx.bisec(cond, a.native, b.native)
        return AssignedInteger(limbs, native, max(a.times, b.times))
