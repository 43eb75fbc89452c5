"""EC point ops and grouped/windowed MSM over non-native coordinates.

Reference parity:
- EccChipBaseOps (point assign/add/double/bisec/encode, select-chip cache,
  non-zero "unsafe" ops + UnsafeError retry protocol): src/circuit/ecc_chip.rs
- MSM engines (group size 2 without select chip, 5 with; 1-bit windows;
  alternating +/- random blinding line point): ecc_chip.rs:79-430
- scalar decomposition: native_scalar_ecc_chip.rs:94-194,
  general_scalar_ecc_chip.rs:93-169
- select-chip encode layout: select_chip.rs:11-18,118-122

Design difference vs the reference: the rayon ParallelClone machinery
(clone_with_offset + unsafe shared tables) is replaced by sequential emission
with an *offset-invariance check* per window — each window must emit exactly
the same number of rows, which is the static-layout property the batched TPU
engine (batch/) exploits to vmap whole windows.
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

from ..core.assign import (
    AssignedCondition,
    AssignedCurvature,
    AssignedInteger,
    AssignedNonZeroPoint,
    AssignedPoint,
    AssignedPointWithCurvature,
    AssignedValue,
)
from ..core.context import Context
from ..core.pairing_core import PairingOps
from ..core.tower import TowerOps
from ..utils.curves import G1
from ..utils.fields import PairingCurve, field_bits
from .integer_ops import IntegerContext

MSM_PREFIX_OFFSET = 1 << 20
MSM_LIMIT = (1 << 8) * MSM_PREFIX_OFFSET

SELECTOR_ENCODE_OFFSET = 128


class UnsafeError(Exception):
    """Incomplete-addition hazard hit; caller retries with fresh randomness."""

    def can_retry(self) -> bool:
        return True


def _encode_offset(g: int, selector: int, limb_offset: int) -> int:
    return (selector << SELECTOR_ENCODE_OFFSET) + (g << 64) + limb_offset


class EccContextBase(TowerOps, PairingOps):
    """Shared EC + tower + pairing ops over one base IntegerContext."""

    curve: PairingCurve
    ctx: Context
    base_ictx: IntegerContext
    msm_prefix: Optional[int]  # None = select chip disabled

    def __init__(self, curve: PairingCurve, ctx: Optional[Context] = None,
                 with_select_chip: bool = True, rng: Optional[random.Random] = None):
        self.curve = curve
        self.ctx = ctx if ctx is not None else Context()
        self.base_ictx = IntegerContext(self.ctx, curve.p)
        self.msm_prefix = 0 if with_select_chip else None
        self.rng = rng if rng is not None else random.Random()
        self._g1 = G1(curve)

    # -- TowerOps / PairingOps integer interface (delegates) --

    @property
    def pairing_curve(self) -> PairingCurve:
        return self.curve

    def int_add(self, a, b):
        return self.base_ictx.int_add(a, b)

    def int_sub(self, a, b):
        return self.base_ictx.int_sub(a, b)

    def int_neg(self, a):
        return self.base_ictx.int_neg(a)

    def int_mul(self, a, b):
        return self.base_ictx.int_mul(a, b)

    def int_square(self, a):
        return self.base_ictx.int_square(a)

    def int_unsafe_invert(self, a):
        return self.base_ictx.int_unsafe_invert(a)

    def assign_int_constant(self, c):
        return self.base_ictx.assign_int_constant(c)

    def assert_int_equal(self, a, b):
        self.base_ictx.assert_int_equal(a, b)

    def reduce(self, a):
        return self.base_ictx.reduce(a)

    def assert_false_cond(self, cond):
        self.ctx.assert_false(cond)

    def has_select_chip(self) -> bool:
        return self.msm_prefix is not None

    def get_and_increase_msm_prefix(self) -> int:
        assert self.msm_prefix is not None, "select chip disabled"
        ret = self.msm_prefix
        assert ret < MSM_LIMIT
        self.msm_prefix += MSM_PREFIX_OFFSET
        return ret

    # ------------------------------------------------------------------
    # Point assignment
    # ------------------------------------------------------------------

    def assign_constant_point(self, pt) -> AssignedPoint:
        x, y = pt if pt is not None else (0, 0)
        z = 1 if pt is None else 0
        ax = self.base_ictx.assign_int_constant(x)
        ay = self.base_ictx.assign_int_constant(y)
        az = self.ctx.assign_constant(z)
        return AssignedPoint(ax, ay, AssignedCondition(az))

    def assign_point(self, pt) -> AssignedPoint:
        """Assign with an in-circuit on-curve check (y^2 = x^3 + b or identity)."""
        x, y = pt if pt is not None else (0, 0)
        z = 1 if pt is None else 0
        return self.assign_point_xyz(x, y, z)

    def assign_point_xyz(self, x, y, z) -> AssignedPoint:
        """assign_point with explicit coordinate/identity-flag values
        (the batched path feeds per-lane values here)."""
        ic = self.base_ictx
        ax = ic.assign_w(x)
        ay = ic.assign_w(y)
        az = self.ctx.assign_bit(z)

        b = ic.assign_int_constant(self.curve.b)
        y2 = ic.int_square(ay)
        x2 = ic.int_square(ax)
        x3 = ic.int_mul(x2, ax)
        right = ic.int_add(x3, b)
        eq = ic.is_int_equal(y2, right)
        eq_or_identity = self.ctx.or_(eq, az)
        self.ctx.assert_true(eq_or_identity)
        return AssignedPoint(ax, ay, az)

    def assign_non_zero_point(self, pt) -> AssignedNonZeroPoint:
        assert pt is not None, "identity not allowed"
        ic = self.base_ictx
        ax = ic.assign_w(pt[0])
        ay = ic.assign_w(pt[1])
        b = ic.assign_int_constant(self.curve.b)
        y2 = ic.int_square(ay)
        x2 = ic.int_square(ax)
        x3 = ic.int_mul(x2, ax)
        right = ic.int_add(x3, b)
        ic.assert_int_equal(y2, right)
        return AssignedNonZeroPoint(ax, ay)

    def assign_identity(self) -> AssignedPointWithCurvature:
        zero = self.base_ictx.assign_int_constant(0)
        one = AssignedCondition(self.ctx.assign_constant(1))
        return AssignedPointWithCurvature(zero, zero, one, AssignedCurvature(zero, one))

    # ------------------------------------------------------------------
    # Selection
    # ------------------------------------------------------------------

    def bisec_point(self, cond, a: AssignedPoint, b: AssignedPoint) -> AssignedPoint:
        ic = self.base_ictx
        return AssignedPoint(
            ic.bisec_int(cond, a.x, b.x),
            ic.bisec_int(cond, a.y, b.y),
            self.ctx.bisec_cond(cond, a.z, b.z),
        )

    def bisec_curvature(self, cond, a, b) -> AssignedCurvature:
        return AssignedCurvature(
            self.base_ictx.bisec_int(cond, a.v, b.v),
            self.ctx.bisec_cond(cond, a.z, b.z),
        )

    def bisec_point_with_curvature(self, cond, a, b) -> AssignedPointWithCurvature:
        ic = self.base_ictx
        return AssignedPointWithCurvature(
            ic.bisec_int(cond, a.x, b.x),
            ic.bisec_int(cond, a.y, b.y),
            self.ctx.bisec_cond(cond, a.z, b.z),
            self.bisec_curvature(cond, a.curvature, b.curvature),
        )

    def ecc_bisec_non_zero_point(self, cond, a, b) -> AssignedNonZeroPoint:
        ic = self.base_ictx
        return AssignedNonZeroPoint(
            ic.bisec_int(cond, a.x, b.x), ic.bisec_int(cond, a.y, b.y)
        )

    def ecc_bisec_to_non_zero_point(self, a: AssignedPoint, b: AssignedNonZeroPoint):
        ic = self.base_ictx
        return AssignedNonZeroPoint(
            ic.bisec_int(a.z, b.x, a.x), ic.bisec_int(a.z, b.y, a.y)
        )

    # ------------------------------------------------------------------
    # Complete group law (identity-aware, via curvature caching)
    # ------------------------------------------------------------------

    def lambda_to_point(self, lam: AssignedCurvature, a, b) -> AssignedPoint:
        ic = self.base_ictx
        l = lam.v
        l2 = ic.int_square(l)
        cx = ic.int_sub(l2, a.x)
        cx = ic.int_sub(cx, b.x)
        t = ic.int_sub(a.x, cx)
        t = ic.int_mul(t, l)
        cy = ic.int_sub(t, a.y)
        return AssignedPoint(cx, cy, lam.z)

    def ecc_add(self, a: AssignedPointWithCurvature, b: AssignedPoint) -> AssignedPoint:
        ic = self.base_ictx
        diff_x = ic.int_sub(a.x, b.x)
        diff_y = ic.int_sub(a.y, b.y)
        x_eq, tangent = ic.int_div(diff_y, diff_x)
        y_eq = ic.is_int_zero(diff_y)
        eq = self.ctx.and_(x_eq, y_eq)

        tangent = AssignedCurvature(tangent, x_eq)
        lam = self.bisec_curvature(eq, a.curvature, tangent)

        a_p = a.to_point()
        p = self.lambda_to_point(lam, a_p, b)
        p = self.bisec_point(a.z, b, p)
        p = self.bisec_point(b.z, a_p, p)
        return p

    def ecc_double(self, a: AssignedPointWithCurvature) -> AssignedPoint:
        # requires odd group order (guaranteed for prime r)
        assert self.curve.r % 2 == 1
        a_p = a.to_point()
        p = self.lambda_to_point(a.curvature, a_p, a_p)
        z = self.ctx.bisec_cond(a.z, a.z, p.z)
        return AssignedPoint(p.x, p.y, z)

    def ecc_assert_equal(self, a: AssignedPoint, b: AssignedPoint) -> None:
        ic = self.base_ictx
        eq_x = ic.is_int_equal(a.x, b.x)
        eq_y = ic.is_int_equal(a.y, b.y)
        eq_z = self.ctx.xnor(a.z, b.z)
        eq_xy = self.ctx.and_(eq_x, eq_y)
        eq_xyz = self.ctx.and_(eq_xy, eq_z)
        is_both_identity = self.ctx.and_(a.z, b.z)
        eq = self.ctx.or_(eq_xyz, is_both_identity)
        self.ctx.assert_true(eq)

    def ecc_neg(self, a: AssignedPoint) -> AssignedPoint:
        return AssignedPoint(a.x, self.base_ictx.int_neg(a.y), a.z)

    def ecc_reduce(self, a: AssignedPoint) -> AssignedPoint:
        ic = self.base_ictx
        x, y, z = ic.reduce(a.x), ic.reduce(a.y), a.z
        identity = self.assign_identity()
        return self.bisec_point(z, identity.to_point(), AssignedPoint(x, y, z))

    def to_point_with_curvature(self, a: AssignedPoint) -> AssignedPointWithCurvature:
        # curvature = 3x^2 / 2y
        ic = self.base_ictx
        x2 = ic.int_square(a.x)
        num = ic.int_mul_small_constant(x2, 3)
        den = ic.int_mul_small_constant(a.y, 2)
        z, v = ic.int_div(num, den)
        return AssignedPointWithCurvature(a.x, a.y, a.z, AssignedCurvature(v, z))

    def ecc_reduce_with_curvature(self, a: AssignedPoint) -> AssignedPointWithCurvature:
        a = self.ecc_reduce(a)
        ic = self.base_ictx
        x2 = ic.int_square(a.x)
        num = ic.int_mul_small_constant(x2, 3)
        den = ic.int_mul_small_constant(a.y, 2)
        z, v = ic.int_div(num, den)
        v = ic.reduce(v)
        return AssignedPointWithCurvature(a.x, a.y, a.z, AssignedCurvature(v, z))

    def ecc_encode(self, p: AssignedPoint) -> List[AssignedValue]:
        """Pack x||y into 3 native cells (ecc_chip.rs:710-732)."""
        p = self.ecc_reduce(p)
        shift = (1 << self.base_ictx.info.limb_bits) % self.ctx.n
        s0 = self.ctx.sum_with_constant(
            [(p.x.limbs_le[0], 1), (p.x.limbs_le[1], shift)], None
        )
        s1 = self.ctx.sum_with_constant(
            [(p.x.limbs_le[2], 1), (p.y.limbs_le[0], shift)], None
        )
        s2 = self.ctx.sum_with_constant(
            [(p.y.limbs_le[1], 1), (p.y.limbs_le[2], shift)], None
        )
        return [s0, s1, s2]

    # ------------------------------------------------------------------
    # Incomplete (non-zero) fast path + UnsafeError protocol
    # ------------------------------------------------------------------

    def lambda_to_point_non_zero(self, lam, a, b) -> AssignedNonZeroPoint:
        ic = self.base_ictx
        l2 = ic.int_square(lam)
        cx = ic.int_sub(l2, a.x)
        cx = ic.int_sub(cx, b.x)
        t = ic.int_sub(a.x, cx)
        t = ic.int_mul(t, lam)
        cy = ic.int_sub(t, a.y)
        return AssignedNonZeroPoint(cx, cy)

    def ecc_add_unsafe(self, a, b) -> AssignedNonZeroPoint:
        ic = self.base_ictx
        diff_x = ic.int_sub(a.x, b.x)
        diff_y = ic.int_sub(a.y, b.y)
        x_eq, tangent = ic.int_div(diff_y, diff_x)
        succeed = self.ctx.try_assert_false(x_eq)
        res = self.lambda_to_point_non_zero(tangent, a, b)
        if not succeed:
            raise UnsafeError("add of same/negated point")
        return res

    def ecc_double_unsafe(self, a) -> AssignedNonZeroPoint:
        ic = self.base_ictx
        x2 = ic.int_square(a.x)
        num = ic.int_mul_small_constant(x2, 3)
        den = ic.int_mul_small_constant(a.y, 2)
        z, v = ic.int_div(num, den)
        succeed = self.ctx.try_assert_false(z)
        res = self.lambda_to_point_non_zero(v, a, a)
        if not succeed:
            raise UnsafeError("double of identity")
        return res

    def ecc_neg_non_zero(self, a) -> AssignedNonZeroPoint:
        return AssignedNonZeroPoint(a.x, self.base_ictx.int_neg(a.y))

    def ecc_reduce_non_zero(self, a) -> AssignedNonZeroPoint:
        ic = self.base_ictx
        return AssignedNonZeroPoint(ic.reduce(a.x), ic.reduce(a.y))

    def ecc_assert_equal_non_zero(self, a, b) -> None:
        self.base_ictx.assert_int_equal(a.x, b.x)
        self.base_ictx.assert_int_equal(a.y, b.y)

    def ecc_non_zero_point_downgrade(self, a) -> AssignedPoint:
        zero = AssignedCondition(self.ctx.assign_constant(0))
        return AssignedPoint(a.x, a.y, zero)

    # ------------------------------------------------------------------
    # Select-chip candidate cache (C9 usage)
    # ------------------------------------------------------------------

    def assign_cache_integer(self, p: AssignedInteger, sc: int, g: int, offset: int) -> int:
        assert p.times == 1
        for limb in p.limbs_le:
            self.ctx.assign_cache_value(limb, _encode_offset(g, sc, offset))
            offset += 1
        self.ctx.assign_cache_value(p.native, _encode_offset(g, sc, offset))
        return offset + 1

    def assign_selected_integer(
        self, p: AssignedInteger, sc: AssignedValue, g: int, offset: int
    ) -> Tuple[AssignedInteger, int]:
        limbs = []
        for limb in p.limbs_le:
            limbs.append(
                self.ctx.assign_select_value(limb, _encode_offset(g, 0, offset), sc)
            )
            offset += 1
        native = self.ctx.assign_select_value(
            p.native, _encode_offset(g, 0, offset), sc
        )
        return AssignedInteger(limbs, native, 1), offset + 1

    def assign_cache_point_non_zero(self, p: AssignedNonZeroPoint, g: int, sc: int):
        i = self.assign_cache_integer(p.x, sc, g, 0)
        self.assign_cache_integer(p.y, sc, g, i)

    def assign_selected_point_non_zero(
        self, p: AssignedNonZeroPoint, sc: AssignedValue, g: int
    ) -> AssignedNonZeroPoint:
        x, i = self.assign_selected_integer(p.x, sc, g, 0)
        y, _ = self.assign_selected_integer(p.y, sc, g, i)
        # x/y relation is inherited from the cached well-formed points
        return AssignedNonZeroPoint(x, y)

    def assign_cache_point(
        self, p: AssignedPointWithCurvature, g: int, sc: int
    ) -> None:
        """Cache a curvature-carrying (possibly-identity) point in the
        select chip: x, y, z flag, curvature value, curvature z flag
        (ecc_chip.rs:779-789; no call sites in the reference either — kept
        for full C11 surface parity)."""
        i = self.assign_cache_integer(p.x, sc, g, 0)
        i = self.assign_cache_integer(p.y, sc, g, i)
        self.ctx.assign_cache_value(p.z.value, _encode_offset(g, sc, i))
        i += 1
        i = self.assign_cache_integer(p.curvature.v, sc, g, i)
        self.ctx.assign_cache_value(p.curvature.z.value, _encode_offset(g, sc, i))

    def assign_selected_point(
        self, p: AssignedPointWithCurvature, sc: AssignedValue, g: int
    ) -> AssignedPointWithCurvature:
        """Select a cached curvature point by in-circuit index
        (ecc_chip.rs:791-812). x/y relation is inherited from the cached
        well-formed values, exactly as the reference skips the check."""
        x, i = self.assign_selected_integer(p.x, sc, g, 0)
        y, i = self.assign_selected_integer(p.y, sc, g, i)
        z = self.ctx.assign_select_value(
            p.z.value, _encode_offset(g, 0, i), sc
        )
        i += 1
        cv, i = self.assign_selected_integer(p.curvature.v, sc, g, i)
        cz = self.ctx.assign_select_value(
            p.curvature.z.value, _encode_offset(g, 0, i), sc
        )
        return AssignedPointWithCurvature(
            x, y, AssignedCondition(z),
            AssignedCurvature(cv, AssignedCondition(cz)),
        )

    def bisec_candidate_non_zero(self, candidates, group_bits) -> AssignedNonZeroPoint:
        """Binary-tree select of candidates[sum(bit_i * 2^i)] (ecc_chip.rs:913-933)."""
        curr = list(candidates)
        for bit in group_bits:
            nxt = []
            for i in range(0, len(curr), 2):
                nxt.append(self.ecc_bisec_non_zero_point(bit, curr[i + 1], curr[i]))
            curr = nxt
        assert len(curr) == 1
        return curr[0]

    def pick_candidate_non_zero(self, candidates, group_bits):
        index_vec = [(b.value, 1 << i) for i, b in enumerate(group_bits)]
        index = self.ctx.sum_with_constant(index_vec, None)
        idx_val = index.val
        if isinstance(idx_val, int):
            return index, candidates[idx_val & ((1 << 64) - 1)]
        # symbolic trace (batch engine): the picked candidate differs per
        # lane — gather every coordinate value by the index node. Cells are
        # irrelevant here: assign_selected_point_non_zero only consumes
        # values (fresh select-region cells carry the result).
        from ..batch.symbolic import assume_bits, gather

        idx = assume_bits(idx_val, max(len(group_bits), 1))
        v0 = idx_val.v0 & ((1 << 64) - 1)

        def gather_av(avs):
            syms = [
                a.val if not isinstance(a.val, int) else idx._coerce(a.val)
                for a in avs
            ]
            return AssignedValue(avs[v0].cell, gather(syms, idx, v0))

        def gather_int(ints):
            limbs = [
                gather_av([c.limbs_le[j] for c in ints])
                for j in range(len(ints[0].limbs_le))
            ]
            native = gather_av([c.native for c in ints])
            return AssignedInteger(limbs, native, 1)

        picked = AssignedNonZeroPoint(
            gather_int([c.x for c in candidates]),
            gather_int([c.y for c in candidates]),
        )
        return index, picked

    # ------------------------------------------------------------------
    # MSM engines
    # ------------------------------------------------------------------

    def _msm_windows_check(self, deltas: List[Tuple[int, int, int]]):
        """All windows must consume identical row counts — the static-layout
        invariant the reference asserts under rayon (ecc_chip.rs:186-191,339)
        and the TPU batch engine vmaps over."""
        assert all(d == deltas[0] for d in deltas[1:]), deltas

    def msm_batch_on_group_non_zero_without_select_chip(
        self, points, scalars, rand_acc_point, rand_line_point
    ) -> AssignedPoint:
        points = [self.ecc_reduce_non_zero(p) for p in points]

        rand_acc = self.assign_non_zero_point(rand_acc_point)
        rand_line = self.assign_non_zero_point(rand_line_point)
        rand_acc_neg = self.ecc_reduce_non_zero(self.ecc_neg_non_zero(rand_acc))
        rand_line_neg = self.ecc_reduce_non_zero(self.ecc_neg_non_zero(rand_line))

        best_group_size = 2
        n_group = (len(points) + best_group_size - 1) // best_group_size
        group_size = (len(points) + n_group - 1) // n_group

        candidates = []
        for gi in range(0, len(points), group_size):
            chunk = points[gi : gi + group_size]
            group_index = gi // group_size
            init = rand_line if group_index % 2 == 0 else rand_line_neg
            cl = [init]
            for i in range(1, 1 << len(chunk)):
                pos = (i & -i).bit_length() - 1  # lowest set bit
                other = i - (1 << pos)
                p = self.ecc_add_unsafe(cl[other], chunk[pos])
                cl.append(self.ecc_reduce_non_zero(p))
            candidates.append(cl)

        bits = [self.decompose_scalar(s, 1) for s in scalars]
        groups = [bits[i : i + group_size] for i in range(0, len(bits), group_size)]
        windows = len(bits[0])

        line_acc = []
        deltas = []
        for wi in range(windows):
            before = self.ctx.offsets()
            acc = rand_acc_neg
            for gi in range(len(groups)):
                group_bits = [b[wi][0] for b in groups[gi]]
                ci = self.bisec_candidate_non_zero(candidates[gi], group_bits)
                acc = self.ecc_add_unsafe(ci, acc)
            line_acc.append(acc)
            after = self.ctx.offsets()
            deltas.append(tuple(a - b for a, b in zip(after, before)))
        self._msm_windows_check(deltas)

        acc = rand_acc
        for wi in range(windows):
            acc = self.ecc_double_unsafe(acc)
            acc = self.ecc_add_unsafe(line_acc[wi], acc)
            if len(groups) % 2 == 1:
                acc = self.ecc_add_unsafe(acc, rand_line_neg)

        accp = self.ecc_non_zero_point_downgrade(acc)
        accp = self.to_point_with_curvature(accp)
        carry = self.ecc_non_zero_point_downgrade(rand_acc_neg)
        return self.ecc_add(accp, carry)

    def msm_batch_on_group_non_zero_with_select_chip(
        self, points, scalars, rand_acc_point, rand_line_point
    ) -> AssignedPoint:
        assert len(points) <= MSM_PREFIX_OFFSET
        points = [self.ecc_reduce_non_zero(p) for p in points]

        rand_acc = self.assign_non_zero_point(rand_acc_point)
        rand_line = self.assign_non_zero_point(rand_line_point)
        rand_acc_neg = self.ecc_reduce_non_zero(self.ecc_neg_non_zero(rand_acc))
        rand_line_neg = self.ecc_reduce_non_zero(self.ecc_neg_non_zero(rand_line))

        best_group_size = 5
        n_group = (len(points) + best_group_size - 1) // best_group_size
        group_size = (len(points) + n_group - 1) // n_group

        group_prefix = self.get_and_increase_msm_prefix()
        candidates = []
        for gi in range(0, len(points), group_size):
            chunk = points[gi : gi + group_size]
            group_index = gi // group_size
            init = rand_line if group_index % 2 == 0 else rand_line_neg
            cl = [init]
            self.assign_cache_point_non_zero(init, group_prefix + group_index, 0)
            for i in range(1, 1 << len(chunk)):
                pos = (i & -i).bit_length() - 1
                other = i - (1 << pos)
                p = self.ecc_add_unsafe(cl[other], chunk[pos])
                p = self.ecc_reduce_non_zero(p)
                self.assign_cache_point_non_zero(p, group_prefix + group_index, i)
                cl.append(p)
            candidates.append(cl)

        bits = [self.decompose_scalar(s, 1) for s in scalars]
        groups = [bits[i : i + group_size] for i in range(0, len(bits), group_size)]
        windows = len(bits[0])

        line_acc = []
        deltas = []
        for wi in range(windows):
            before = self.ctx.offsets()
            acc = rand_acc_neg
            for gi in range(len(groups)):
                group_bits = [b[wi][0] for b in groups[gi]]
                index, ci = self.pick_candidate_non_zero(candidates[gi], group_bits)
                ci = self.assign_selected_point_non_zero(ci, index, gi + group_prefix)
                acc = self.ecc_add_unsafe(ci, acc)
            line_acc.append(acc)
            after = self.ctx.offsets()
            deltas.append(tuple(a - b for a, b in zip(after, before)))
        self._msm_windows_check(deltas)

        acc = rand_acc
        for wi in range(windows):
            acc = self.ecc_double_unsafe(acc)
            acc = self.ecc_add_unsafe(line_acc[wi], acc)
            if len(groups) % 2 == 1:
                acc = self.ecc_add_unsafe(acc, rand_line_neg)

        accp = self.ecc_non_zero_point_downgrade(acc)
        accp = self.to_point_with_curvature(accp)
        carry = self.ecc_non_zero_point_downgrade(rand_acc_neg)
        return self.ecc_add(accp, carry)

    def msm_unsafe(self, points: List[AssignedPoint], scalars) -> AssignedPoint:
        """MSM with identity normalisation; raises UnsafeError on a blinding
        collision (retry with a fresh context, ecc_chip.rs:373-408)."""
        r1 = self._g1.mul(self._g1.generator, self.rng.randrange(1, self.curve.r))
        r2 = self._g1.mul(self._g1.generator, self.rng.randrange(1, self.curve.r))

        non_zero_points = []
        normalized_scalars = []
        non_zero_p = self.assign_non_zero_point(self._g1.generator)
        s_zero = self.ecc_assign_constant_zero_scalar()
        for p, s in zip(points, scalars):
            s = self.ecc_bisec_scalar(p.z, s_zero, s)
            pnz = self.ecc_bisec_to_non_zero_point(p, non_zero_p)
            non_zero_points.append(pnz)
            normalized_scalars.append(s)

        if self.has_select_chip():
            return self.msm_batch_on_group_non_zero_with_select_chip(
                non_zero_points, normalized_scalars, r1, r2
            )
        return self.msm_batch_on_group_non_zero_without_select_chip(
            non_zero_points, normalized_scalars, r1, r2
        )

    def msm(self, points, scalars) -> AssignedPoint:
        return self.msm_unsafe(points, scalars)

    def ecc_mul(self, a: AssignedPoint, s) -> AssignedPoint:
        return self.msm_unsafe([a], [s])

    # ------------------------------------------------------------------
    # Tower / G2 assignment conveniences (used by pairing circuits)
    # ------------------------------------------------------------------

    def assign_fq(self, v: int) -> AssignedInteger:
        return self.base_ictx.assign_w(v)

    def assign_fq2(self, c):
        return (self.base_ictx.assign_w(c[0]), self.base_ictx.assign_w(c[1]))

    def assign_fq6(self, c):
        return tuple(self.assign_fq2(ci) for ci in c)

    def assign_fq12(self, c):
        return (self.assign_fq6(c[0]), self.assign_fq6(c[1]))

    def get_fq2(self, a):
        return (self.base_ictx.get_w(a[0]), self.base_ictx.get_w(a[1]))

    def get_fq6(self, a):
        return tuple(self.get_fq2(ai) for ai in a)

    def get_fq12(self, a):
        return (self.get_fq6(a[0]), self.get_fq6(a[1]))

    def assign_constant_g2(self, pt):
        """G2 point as fixed constants (reference tests assign G2 this way)."""
        from ..core.assign import AssignedG2Affine

        assert pt is not None
        x = self.fq2_assign_constant(pt[0])
        y = self.fq2_assign_constant(pt[1])
        z = AssignedCondition(self.ctx.assign_constant(0))
        return AssignedG2Affine(x, y, z)

    def assign_g2(self, pt):
        """Witnessed (non-constant) G2 point with an on-curve check."""
        from ..core.assign import AssignedG2Affine

        assert pt is not None
        x = self.assign_fq2(pt[0])
        y = self.fq2_reduce(self.assign_fq2(pt[1]))
        # y^2 = x^3 + b2
        y2 = self.fq2_square(y)
        x3 = self.fq2_mul(self.fq2_square(x), x)
        b2 = self.fq2_assign_constant(self.curve.b2)
        rhs = self.fq2_add(x3, b2)
        self.fq2_assert_equal(y2, rhs)
        z = AssignedCondition(self.ctx.assign_constant(0))
        return AssignedG2Affine(self.fq2_reduce(x), y, z)

    # -- abstract scalar interface --

    def decompose_scalar(self, s, window_size: int):
        raise NotImplementedError

    def ecc_bisec_scalar(self, cond, a, b):
        raise NotImplementedError

    def ecc_assign_constant_zero_scalar(self):
        raise NotImplementedError


class NativeScalarEccContext(EccContextBase):
    """Scalars live in the native field N == curve's Fr (bn254 over bn254 Fr).

    Reference: NativeScalarEccContext (context.rs:190-207) +
    native_scalar_ecc_chip.rs.
    """

    def decompose_scalar(self, s: AssignedValue, window_size: int):
        """2 bits per row: v = 4*v_next + 2*b1 + b0
        (native_scalar_ecc_chip.rs:97-171)."""
        num_bits = field_bits(self.curve.r)
        ctx = self.ctx
        bits = []
        s_bn = s.val
        v = s
        for i in range(num_bits // 2):
            b0 = ctx.assign_bit((s_bn >> (2 * i)) & 1)
            b1 = ctx.assign_bit((s_bn >> (2 * i + 1)) & 1)
            v_next = s_bn >> (2 * i + 2)
            cells, _ = ctx.one_line_with_last(
                [(v_next, 4), (b1.value, 2), (b0.value, 1)], (v, -1), None, (), None
            )
            v = cells[0]
            bits.append(b0)
            bits.append(b1)

        if num_bits % 2 == 1:
            ctx.assert_bit(v)
            bits.append(AssignedCondition(v))
        else:
            ctx.assert_constant(v, 0)

        rem = num_bits % window_size
        if rem > 0:
            zero = ctx.assign_constant(0)
            for _ in range(window_size - rem):
                bits.append(AssignedCondition(zero))

        res = [bits[i : i + window_size] for i in range(0, len(bits), window_size)]
        res.reverse()
        return res

    def ecc_bisec_scalar(self, cond, a, b):
        return self.ctx.bisec(cond, a, b)

    def ecc_assign_constant_zero_scalar(self):
        return self.ctx.assign_constant(0)

    def assign_scalar(self, s: int) -> AssignedValue:
        return self.ctx.assign(s)


class GeneralScalarEccContext(EccContextBase):
    """Scalars are non-native integers (e.g. bls12-381 Fr over bn254 Fr).

    Reference: GeneralScalarEccContext (context.rs:215-239) +
    general_scalar_ecc_chip.rs. Always has the select chip.
    """

    def __init__(self, curve: PairingCurve, ctx: Optional[Context] = None,
                 rng: Optional[random.Random] = None):
        super().__init__(curve, ctx, with_select_chip=True, rng=rng)
        self.scalar_ictx = IntegerContext(self.ctx, curve.r)

    def decompose_scalar(self, s: AssignedInteger, window_size: int):
        """Per-limb halving chains (general_scalar_ecc_chip.rs:96-147)."""
        ctx = self.ctx
        n = ctx.n
        two_inv = pow(2, -1, n)

        s = self.scalar_ictx.reduce(s)
        bits = []
        for l in s.limbs_le:
            v = l.val
            rest = l
            for j in range(self.scalar_ictx.info.limb_bits):
                b = ctx.assign_bit((v >> j) & 1)
                nxt = ((rest.val - b.val) * two_inv) % n
                _, rest = ctx.one_line_with_last(
                    [(rest, -1), (b.value, 1)], (nxt, 2), None, (), None
                )
                bits.append(b)
            ctx.assert_constant(rest, 0)

        padding = len(bits) % window_size
        if padding != 0:
            zero = ctx.assign_constant(0)
            for _ in range(padding, window_size):
                bits.append(AssignedCondition(zero))

        res = [bits[i : i + window_size] for i in range(0, len(bits), window_size)]
        res.reverse()
        return res

    def ecc_bisec_scalar(self, cond, a, b):
        return self.scalar_ictx.bisec_int(cond, a, b)

    def ecc_assign_constant_zero_scalar(self):
        return self.scalar_ictx.assign_int_constant(0)

    def assign_scalar(self, s: int) -> AssignedInteger:
        return self.scalar_ictx.assign_w(s)
