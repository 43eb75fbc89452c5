"""Context: write cursors over Records + the universal base-gate ops.

Reference parity:
- Context struct / offsets: src/context.rs:41-159
- one_line / one_line_with_last emission: src/context.rs:634-714
- BaseChipOps (add/mul/bisec/logic/...): src/circuit/base_chip.rs:81-605
- range-row emitters: src/context.rs:835-997
- select-row emitters: src/context.rs:749-801

The base gate (5 advice, 9 fixed):
    constant + next_coeff * adv[row+1][4]
      + sum_i coeff[i] * adv[i]
      + mul0 * adv0 * adv1 + mul1 * adv2 * adv3  == 0   (mod N)

Unlike the reference, parallel trace generation does not alias one table from
many threads (context.rs:303-307 ParallelWorkAround); `fork()` creates a
cursor-shifted view over the same Records, and the statically predictable
per-op row counts (the property the reference's MSM exploits) make forked
slabs disjoint by construction. The reference's `merge()` height bookkeeping
(including its range_height copy-paste bug, native_scalar_ecc_chip.rs:87) is
unnecessary here because heights live on the shared tables.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

from ..utils.fields import BN254_FR, inv_mod
from .assign import AssignedCondition, AssignedValue, Cell, Region
from .records import (
    MUL_COLUMNS,
    RANGE_COL_COMMON,
    RANGE_COL_TAGGED,
    RANGE_COL_VALUE_ACC,
    RANGE_FIX_ACC_LINES,
    RANGE_FIX_TAG,
    SELECT_COL_SELECTOR,
    SELECT_COL_VALUE,
    SELECT_FIX_ENCODE,
    SELECT_FIX_IS_LOOKUP,
    VAR_COLUMNS,
    Records,
)

# reference: range_chip.rs:22-24
MAX_CHUNKS = 3
COMMON_RANGE_BITS = 18
RANGE_VALUE_DECOMPOSE = 6  # MAX_CHUNKS * 2 range columns

Schema = Union[int, AssignedValue, AssignedCondition]


def _val(x: Schema) -> int:
    if isinstance(x, AssignedValue):
        return x.val
    if isinstance(x, AssignedCondition):
        return x.value.val
    return x


def _cell(x: Schema) -> Optional[Cell]:
    if isinstance(x, AssignedValue):
        return x.cell
    if isinstance(x, AssignedCondition):
        return x.value.cell
    return None


class Context:
    """Native-field witness builder. N defaults to bn254 Fr."""

    def __init__(self, n_modulus: int = BN254_FR, records: Optional[Records] = None):
        self.n = n_modulus
        self.records = records if records is not None else Records()
        self.base_offset = 0
        self.range_offset = 0
        self.select_offset = 0

    # -- ParallelClone equivalent (reference: ecc_chip.rs:36-77) --

    def offsets(self) -> Tuple[int, int, int]:
        return (self.base_offset, self.range_offset, self.select_offset)

    def fork(self, offset_diff: Tuple[int, int, int]) -> "Context":
        """Cursor-shifted view over the same Records (disjoint row slabs)."""
        c = Context(self.n, self.records)
        c.base_offset = self.base_offset + offset_diff[0]
        c.range_offset = self.range_offset + offset_diff[1]
        c.select_offset = self.select_offset + offset_diff[2]
        return c

    def apply_offset_diff(self, offset_diff: Tuple[int, int, int]) -> None:
        self.base_offset += offset_diff[0]
        self.range_offset += offset_diff[1]
        self.select_offset += offset_diff[2]

    # ------------------------------------------------------------------
    # Row emission
    # ------------------------------------------------------------------

    def var_columns(self) -> int:
        return VAR_COLUMNS

    def mul_columns(self) -> int:
        return MUL_COLUMNS

    def one_line(
        self,
        pairs: Sequence[Tuple[Schema, int]],
        constant: Optional[int] = None,
        mul_coeffs: Sequence[int] = (),
        next_coeff: Optional[int] = None,
    ) -> List[AssignedValue]:
        assert len(pairs) <= VAR_COLUMNS
        n = self.n
        row = self.base_offset
        tbl = self.records.base
        tbl.ensure(row + 1)
        tbl.bump_height(row + 1)

        out = []
        perms = self.records.permutations
        for i, (v, coeff) in enumerate(pairs):
            value = _val(v) % n
            old_cell = _cell(v)
            new_cell = Cell(Region.BASE, i, row)
            if old_cell is not None:
                perms.append((old_cell, new_cell))
            tbl.write_adv(row, i, value)
            tbl.write_fix(row, i, coeff % n)
            out.append(AssignedValue(new_cell, value))

        for i, mc in enumerate(mul_coeffs):
            tbl.write_fix(row, VAR_COLUMNS + i, mc % n)
        if next_coeff is not None:
            tbl.write_fix(row, VAR_COLUMNS + MUL_COLUMNS, next_coeff % n)
        if constant is not None:
            tbl.write_fix(row, VAR_COLUMNS + MUL_COLUMNS + 1, constant % n)

        self.base_offset += 1
        return out

    def one_line_with_last(
        self,
        pairs: Sequence[Tuple[Schema, int]],
        last: Tuple[Schema, int],
        constant: Optional[int] = None,
        mul_coeffs: Sequence[int] = (),
        next_coeff: Optional[int] = None,
    ) -> Tuple[List[AssignedValue], AssignedValue]:
        assert len(pairs) <= VAR_COLUMNS - 1
        row = self.base_offset
        out = self.one_line(pairs, constant, mul_coeffs, next_coeff)

        v, coeff = last
        value = _val(v) % self.n
        old_cell = _cell(v)
        new_cell = Cell(Region.BASE, VAR_COLUMNS - 1, row)
        if old_cell is not None:
            self.records.permutations.append((old_cell, new_cell))
        tbl = self.records.base
        tbl.write_adv(row, VAR_COLUMNS - 1, value)
        tbl.write_fix(row, VAR_COLUMNS - 1, coeff % self.n)
        return out, AssignedValue(new_cell, value)

    # ------------------------------------------------------------------
    # BaseChipOps
    # ------------------------------------------------------------------

    def sum_with_constant_in_one_line(self, elems, constant=None) -> AssignedValue:
        assert len(elems) < VAR_COLUMNS
        n = self.n
        s = sum(_val(x) * c for x, c in elems) + (constant or 0)
        s %= n
        _, last = self.one_line_with_last(list(elems), (s, n - 1), constant)
        return last

    def sum_with_constant(self, elems, constant=None) -> AssignedValue:
        """Multi-row chaining when more than 4 terms (base_chip.rs:134-153)."""
        columns = VAR_COLUMNS
        elems = list(elems)
        if len(elems) < columns:
            return self.sum_with_constant_in_one_line(elems, constant)
        curr, tail = elems[: columns - 1], elems[columns - 1 :]
        acc = self.sum_with_constant_in_one_line(curr, constant)
        for i in range(0, len(tail), columns - 2):
            chunk = tail[i : i + columns - 2]
            acc = self.sum_with_constant_in_one_line(chunk + [(acc, 1)], None)
        return acc

    def add(self, a, b) -> AssignedValue:
        return self.sum_with_constant([(a, 1), (b, 1)], None)

    def add_constant(self, a, c: int) -> AssignedValue:
        return self.sum_with_constant([(a, 1)], c)

    def sub(self, a, b) -> AssignedValue:
        return self.sum_with_constant([(a, 1), (b, -1)], None)

    def mul(self, a, b) -> AssignedValue:
        n = self.n
        c = (_val(a) * _val(b)) % n
        _, last = self.one_line_with_last(
            [(a, 0), (b, 0)], (c, n - 1), None, (1,), None
        )
        return last

    def mul_add_constant(self, a, b, c: int) -> AssignedValue:
        n = self.n
        d = (_val(a) * _val(b) + c) % n
        _, last = self.one_line_with_last(
            [(a, 0), (b, 0)], (d, n - 1), c, (1,), None
        )
        return last

    def mul_add(self, a, b, ab_coeff: int, c, c_coeff: int) -> AssignedValue:
        n = self.n
        d = (_val(a) * _val(b) * ab_coeff + _val(c) * c_coeff) % n
        _, last = self.one_line_with_last(
            [(a, 0), (b, 0), (c, c_coeff)], (d, n - 1), None, (ab_coeff,), None
        )
        return last

    def mul_add_with_next_line(self, ls) -> AssignedValue:
        """ls: list of (a, b, c, c_coeff); returns sum(a*b + c*c_coeff).

        Chains partial sums through the next-row cell (base_chip.rs:245-281).
        """
        assert len(ls) > 0
        if len(ls) == 1:
            a, b, c, c_coeff = ls[0]
            return self.mul_add(a, b, 1, c, c_coeff)
        n = self.n
        t = 0
        for i, (a, b, c, c_coeff) in enumerate(ls):
            self.one_line_with_last(
                [(a, 0), (b, 0), (c, c_coeff)],
                (t, 0 if i == 0 else 1),
                None,
                (1,),
                n - 1,
            )
            t = (_val(a) * _val(b) + _val(c) * c_coeff + t) % n
        _, last = self.one_line_with_last([], (t, 0), None, (), None)
        return last

    def invert_unsafe(self, a) -> AssignedValue:
        b = inv_mod(_val(a), self.n)
        assert b != 0 or _val(a) == 0
        cells = self.one_line([(a, 0), (b, 0)], -1, (1,), None)
        return cells[1]

    def invert(self, a) -> Tuple[AssignedCondition, AssignedValue]:
        n = self.n
        av = _val(a)
        b = inv_mod(av, n)
        c = (1 - av * b) % n
        # a * c = 0 (one of them must be zero)
        cells = self.one_line([(a, 0), (c, 0)], None, (1,), None)
        c_assigned = cells[1]
        # a * b + c = 1
        cells2, last = self.one_line_with_last(
            [(a, 0), (b, 0)], (c_assigned, 1), -1, (1,), None
        )
        return AssignedCondition(last), cells2[1]

    def is_zero(self, a) -> AssignedCondition:
        return self.invert(a)[0]

    def div_unsafe(self, a, b) -> AssignedValue:
        n = self.n
        c = (inv_mod(_val(b), n) * _val(a)) % n
        # b * c = a
        cells, _ = self.one_line_with_last([(b, 0), (c, 0)], (a, n - 1), None, (1,), None)
        return cells[1]

    def assign_constant(self, v: int) -> AssignedValue:
        v %= self.n
        cells = self.one_line([(v, -1)], v, (), None)
        return cells[0]

    def assign(self, v: int) -> AssignedValue:
        cells = self.one_line([(v % self.n, 0)], None, (), None)
        return cells[0]

    def assign_bit(self, a: int) -> AssignedCondition:
        # a * a - a = 0
        cells = self.one_line([(a, 1), (a, 0)], None, (-1,), None)
        return AssignedCondition(cells[0])

    def assert_equal(self, a, b) -> None:
        self.one_line([(a, -1), (b, 1)], None, (), None)

    def assert_constant(self, a, b: int) -> None:
        av = _val(a)
        assert av % self.n == b % self.n
        if not isinstance(av, int):  # symbolic trace: all lanes must agree
            node = av % self.n
            node.tape.assume_equal_const.append((node.nid, b % self.n))
        self.one_line([(a, -1)], b, (), None)

    def assert_bit(self, a) -> None:
        self.one_line([(a, 1), (a, 0)], None, (-1,), None)

    def and_(self, a: AssignedCondition, b: AssignedCondition) -> AssignedCondition:
        return AssignedCondition(self.mul(a.value, b.value))

    def not_(self, a: AssignedCondition) -> AssignedCondition:
        return AssignedCondition(self.sum_with_constant([(a.value, -1)], 1))

    def not_and(self, a: AssignedCondition, b: AssignedCondition) -> AssignedCondition:
        n = self.n
        c = (b.val - a.val * b.val) % n
        _, last = self.one_line_with_last(
            [(a.value, 0), (b.value, 1)], (c, n - 1), None, (-1,), None
        )
        return AssignedCondition(last)

    def or_(self, a: AssignedCondition, b: AssignedCondition) -> AssignedCondition:
        n = self.n
        c = (a.val + b.val - a.val * b.val) % n
        _, last = self.one_line_with_last(
            [(a.value, 1), (b.value, 1)], (c, n - 1), None, (-1,), None
        )
        return AssignedCondition(last)

    def xor(self, a: AssignedCondition, b: AssignedCondition) -> AssignedCondition:
        n = self.n
        c = (a.val + b.val - 2 * a.val * b.val) % n
        _, last = self.one_line_with_last(
            [(a.value, 1), (b.value, 1)], (c, n - 1), None, (-2,), None
        )
        return AssignedCondition(last)

    def xnor(self, a: AssignedCondition, b: AssignedCondition) -> AssignedCondition:
        n = self.n
        c = (1 - a.val - b.val + 2 * a.val * b.val) % n
        _, last = self.one_line_with_last(
            [(a.value, -1), (b.value, -1)], (c, n - 1), 1, (2,), None
        )
        return AssignedCondition(last)

    def bisec(self, cond: AssignedCondition, a, b) -> AssignedValue:
        """cond ? a : b in one row (5 advice cells; base_chip.rs:574-604)."""
        n = self.n
        cv = cond.value
        # written as cond*a + b - cond*b (not (1-cond)*b) so products stay on
        # exact operands under symbolic tracing
        c = (cond.val * _val(a) + _val(b) - cond.val * _val(b)) % n
        _, last = self.one_line_with_last(
            [(cv, 0), (a, 0), (cv, 0), (b, 1)],
            (c, n - 1),
            None,
            (1, -1),
            None,
        )
        return last

    def bisec_cond(self, cond, a: AssignedCondition, b: AssignedCondition):
        return AssignedCondition(self.bisec(cond, a.value, b.value))

    def assert_true(self, a: AssignedCondition) -> None:
        assert a.val == 1
        self.assert_constant(a.value, 1)

    def assert_false(self, a: AssignedCondition) -> None:
        assert a.val == 0
        self.assert_constant(a.value, 0)

    def try_assert_false(self, a: AssignedCondition) -> bool:
        """Emit the constraint regardless; report whether it can hold.

        Callers retry with fresh randomness on False (UnsafeError protocol,
        reference base_chip.rs:497-500 + ecc_chip.rs:24-34).
        """
        self.one_line([(a.value, -1)], 0, (), None)
        av = a.val
        if not isinstance(av, int):  # symbolic trace: record lane assumption
            node = av % self.n
            node.tape.assume_equal_const.append((node.nid, 0))
        return av == 0

    # ------------------------------------------------------------------
    # Range-region row emitters (reference: context.rs:835-997)
    # ------------------------------------------------------------------

    def assign_one_line_range_value(self, v, v_acc: int, bits: int) -> AssignedValue:
        assert bits <= COMMON_RANGE_BITS
        row = self.range_offset
        tbl = self.records.range
        tbl.ensure(row + 1)
        tbl.bump_height(row + 1)
        tbl.write_fix(row, RANGE_FIX_ACC_LINES, 1)
        tbl.write_fix(row, RANGE_FIX_TAG, bits)
        tbl.write_adv(row, RANGE_COL_TAGGED, v[0] % self.n)
        tbl.write_adv(row, RANGE_COL_VALUE_ACC, v_acc % self.n)
        self.range_offset += 1
        return AssignedValue(Cell(Region.RANGE, RANGE_COL_VALUE_ACC, row), v_acc % self.n)

    def assign_two_line_range_value(self, v, v_acc: int, bits: int) -> AssignedValue:
        assert 2 * COMMON_RANGE_BITS <= bits <= 4 * COMMON_RANGE_BITS
        row = self.range_offset
        tbl = self.records.range
        tbl.ensure(row + 2)
        tbl.bump_height(row + 2)
        tbl.write_fix(row, RANGE_FIX_ACC_LINES, 2)
        tbl.write_adv(row, RANGE_COL_COMMON, v[0] % self.n)
        tbl.write_adv(row + 1, RANGE_COL_COMMON, v[1] % self.n)

        cell_bits = COMMON_RANGE_BITS if bits >= 3 * COMMON_RANGE_BITS else bits % COMMON_RANGE_BITS
        tbl.write_fix(row, RANGE_FIX_TAG, cell_bits)
        tbl.write_adv(row, RANGE_COL_TAGGED, v[2] % self.n)

        cell_bits = bits - 3 * COMMON_RANGE_BITS if bits > 3 * COMMON_RANGE_BITS else 0
        tbl.write_fix(row + 1, RANGE_FIX_TAG, cell_bits)
        tbl.write_adv(row + 1, RANGE_COL_TAGGED, v[3] % self.n)

        tbl.write_adv(row, RANGE_COL_VALUE_ACC, v_acc % self.n)
        self.range_offset += 2
        return AssignedValue(Cell(Region.RANGE, RANGE_COL_VALUE_ACC, row), v_acc % self.n)

    def assign_three_line_range_value(self, v, v_acc: int, bits: int) -> AssignedValue:
        assert 3 * COMMON_RANGE_BITS <= bits <= 6 * COMMON_RANGE_BITS
        row = self.range_offset
        tbl = self.records.range
        tbl.ensure(row + 3)
        tbl.bump_height(row + 3)
        tbl.write_fix(row, RANGE_FIX_ACC_LINES, 3)
        for j in range(3):
            tbl.write_adv(row + j, RANGE_COL_COMMON, v[j] % self.n)

        cell_bits = COMMON_RANGE_BITS if bits >= 4 * COMMON_RANGE_BITS else bits % COMMON_RANGE_BITS
        tbl.write_fix(row, RANGE_FIX_TAG, cell_bits)
        tbl.write_adv(row, RANGE_COL_TAGGED, v[3] % self.n)

        if bits >= 5 * COMMON_RANGE_BITS:
            cell_bits = COMMON_RANGE_BITS
        elif bits > 4 * COMMON_RANGE_BITS:
            cell_bits = bits % COMMON_RANGE_BITS
        else:
            cell_bits = 0
        tbl.write_fix(row + 1, RANGE_FIX_TAG, cell_bits)
        tbl.write_adv(row + 1, RANGE_COL_TAGGED, v[4] % self.n)

        cell_bits = bits - 5 * COMMON_RANGE_BITS if bits > 5 * COMMON_RANGE_BITS else 0
        tbl.write_fix(row + 2, RANGE_FIX_TAG, cell_bits)
        tbl.write_adv(row + 2, RANGE_COL_TAGGED, v[5] % self.n)

        tbl.write_adv(row, RANGE_COL_VALUE_ACC, v_acc % self.n)
        self.range_offset += 3
        return AssignedValue(Cell(Region.RANGE, RANGE_COL_VALUE_ACC, row), v_acc % self.n)

    def assign_range_value(self, v: List[int], v_acc: int, bits: int) -> AssignedValue:
        """Dispatch on bit width (reference context.rs:974-997)."""
        if bits <= COMMON_RANGE_BITS:
            return self.assign_one_line_range_value(v, v_acc, bits)
        if bits < 2 * COMMON_RANGE_BITS:
            raise AssertionError("unreachable range width")
        if bits <= 4 * COMMON_RANGE_BITS:
            v = list(v) + [0] * (4 - len(v))
            return self.assign_two_line_range_value(v, v_acc, bits)
        if bits <= 6 * COMMON_RANGE_BITS:
            v = list(v) + [0] * (6 - len(v))
            return self.assign_three_line_range_value(v, v_acc, bits)
        raise AssertionError("unreachable range width")

    # ------------------------------------------------------------------
    # Select-region row emitters (reference: context.rs:749-801)
    # ------------------------------------------------------------------

    def assign_cache_value(self, v: AssignedValue, encode: int) -> None:
        row = self.select_offset
        tbl = self.records.select
        tbl.ensure(row + 1)
        tbl.bump_height(row + 1)
        tbl.write_adv(row, SELECT_COL_VALUE, v.val)
        idx = Cell(Region.SELECT, SELECT_COL_VALUE, row)
        self.records.permutations.append((idx, v.cell))
        tbl.write_fix(row, SELECT_FIX_ENCODE, encode % self.n)
        tbl.write_fix(row, SELECT_FIX_IS_LOOKUP, 0)
        self.select_offset += 1

    def assign_select_value(
        self, v: AssignedValue, encode: int, selector: AssignedValue
    ) -> AssignedValue:
        row = self.select_offset
        tbl = self.records.select
        tbl.ensure(row + 1)
        tbl.bump_height(row + 1)
        tbl.write_adv(row, SELECT_COL_VALUE, v.val)
        tbl.write_adv(row, SELECT_COL_SELECTOR, selector.val)
        sel_cell = Cell(Region.SELECT, SELECT_COL_SELECTOR, row)
        self.records.permutations.append((sel_cell, selector.cell))
        tbl.write_fix(row, SELECT_FIX_ENCODE, encode % self.n)
        tbl.write_fix(row, SELECT_FIX_IS_LOOKUP, 1)
        self.select_offset += 1
        return AssignedValue(Cell(Region.SELECT, SELECT_COL_VALUE, row), v.val)
