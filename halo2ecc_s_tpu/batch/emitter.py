"""Batched row emission: B parallel instances writing disjoint row slabs.

This is the TPU-native replacement for the reference's ParallelClone/rayon
machinery (ecc_chip.rs:36-77, context.rs:303-307): because per-op row counts
are statically known, instance i's rows live at slab_start + i*stride + local,
and all B instances' cells for one template row are written as a single
column-block scatter. Values arrive as uint64[B, 4] arrays straight from the
device kernels (kernels/ff_jax.py) — no per-cell Python marshalling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from ..core.assign import Region
from ..core.context import COMMON_RANGE_BITS, Context
from ..core.records import (
    MUL_COLUMNS,
    RANGE_COL_COMMON,
    RANGE_COL_TAGGED,
    RANGE_COL_VALUE_ACC,
    RANGE_FIX_ACC_LINES,
    RANGE_FIX_TAG,
    VAR_COLUMNS,
    pack_u64x4,
)


@dataclass
class BAssigned:
    """A batch of B assigned cells occupying one (region, col) across slabs."""

    region: Region
    col: int
    rows: np.ndarray  # int64[B]
    vals: np.ndarray  # uint64[B, 4]


Source = Union[BAssigned, np.ndarray, int]


def pack_const(v: int, B: int) -> np.ndarray:
    return np.tile(np.array(pack_u64x4(v), dtype=np.uint64), (B, 1))


class BatchEmitter:
    """Emits template rows for B instances at once.

    Strides (per-instance row counts) must be known up-front — obtain them by
    probing the scalar path once (the same static-layout property the
    reference's parallel MSM asserts, ecc_chip.rs:186-191).
    """

    def __init__(self, ctx: Context, B: int,
                 base_stride: int, range_stride: int, select_stride: int = 0):
        self.ctx = ctx
        self.rec = ctx.records
        self.B = B
        self.n = ctx.n
        self.strides = (base_stride, range_stride, select_stride)
        self.starts = (ctx.base_offset, ctx.range_offset, ctx.select_offset)
        self.local = [0, 0, 0]
        self._ar = np.arange(B, dtype=np.int64)

        # pre-size tables and bump heights/cursors for the whole batch
        ends = [s + B * st for s, st in zip(self.starts, self.strides)]
        self.rec.base.ensure(ends[0])
        self.rec.range.ensure(ends[1])
        self.rec.select.ensure(ends[2])
        self.rec.base.bump_height(ends[0])
        self.rec.range.bump_height(ends[1])
        if self.strides[2]:
            self.rec.select.bump_height(ends[2])
        ctx.apply_offset_diff(tuple(B * st for st in self.strides))

    def finish(self):
        assert self.local[0] == self.strides[0], (self.local, self.strides)
        assert self.local[1] == self.strides[1], (self.local, self.strides)
        assert self.local[2] == self.strides[2], (self.local, self.strides)

    # -- row coordinates --

    def _rows(self, region_idx: int, local_row: int) -> np.ndarray:
        return (
            self.starts[region_idx]
            + self._ar * self.strides[region_idx]
            + local_row
        )

    def _vals_of(self, src: Source) -> np.ndarray:
        if isinstance(src, BAssigned):
            return src.vals
        if isinstance(src, np.ndarray):
            return src
        return pack_const(src % self.n, self.B)

    # -- base region --

    def one_line(
        self,
        pairs: Sequence[Tuple[Source, int]],
        constant: Optional[int] = None,
        mul_coeffs: Sequence[int] = (),
        next_coeff: Optional[int] = None,
    ) -> List[BAssigned]:
        assert len(pairs) <= VAR_COLUMNS
        rows = self._rows(0, self.local[0])
        tbl = self.rec.base
        out = []
        for i, (src, coeff) in enumerate(pairs):
            vals = self._vals_of(src)
            tbl.adv_vals[rows, i] = vals
            tbl.adv_set[rows, i] = 1
            tbl.fix_vals[rows, i] = pack_u64x4(coeff % self.n)
            tbl.fix_set[rows, i] = 1
            new = BAssigned(Region.BASE, i, rows, vals)
            if isinstance(src, BAssigned):
                self.rec.permutation_blocks.append(
                    ((src.region, src.col, src.rows), (Region.BASE, i, rows))
                )
            out.append(new)
        for i, mc in enumerate(mul_coeffs):
            tbl.fix_vals[rows, VAR_COLUMNS + i] = pack_u64x4(mc % self.n)
            tbl.fix_set[rows, VAR_COLUMNS + i] = 1
        if next_coeff is not None:
            tbl.fix_vals[rows, VAR_COLUMNS + MUL_COLUMNS] = pack_u64x4(next_coeff % self.n)
            tbl.fix_set[rows, VAR_COLUMNS + MUL_COLUMNS] = 1
        if constant is not None:
            tbl.fix_vals[rows, VAR_COLUMNS + MUL_COLUMNS + 1] = pack_u64x4(constant % self.n)
            tbl.fix_set[rows, VAR_COLUMNS + MUL_COLUMNS + 1] = 1
        self.local[0] += 1
        return out

    def one_line_with_last(
        self,
        pairs: Sequence[Tuple[Source, int]],
        last: Tuple[Source, int],
        constant: Optional[int] = None,
        mul_coeffs: Sequence[int] = (),
        next_coeff: Optional[int] = None,
    ) -> Tuple[List[BAssigned], BAssigned]:
        rows = self._rows(0, self.local[0])
        out = self.one_line(pairs, constant, mul_coeffs, next_coeff)
        src, coeff = last
        vals = self._vals_of(src)
        tbl = self.rec.base
        i = VAR_COLUMNS - 1
        tbl.adv_vals[rows, i] = vals
        tbl.adv_set[rows, i] = 1
        tbl.fix_vals[rows, i] = pack_u64x4(coeff % self.n)
        tbl.fix_set[rows, i] = 1
        if isinstance(src, BAssigned):
            self.rec.permutation_blocks.append(
                ((src.region, src.col, src.rows), (Region.BASE, i, rows))
            )
        return out, BAssigned(Region.BASE, i, rows, vals)

    def sum_line(
        self,
        elems: Sequence[Tuple[BAssigned, int]],
        total: np.ndarray,
        constant: Optional[int] = None,
    ) -> BAssigned:
        """sum_with_constant single-row form: total must be the precomputed sum."""
        assert len(elems) < VAR_COLUMNS
        _, last = self.one_line_with_last(list(elems), (total, self.n - 1), constant)
        return last

    # -- range region --

    def _range_write(self, local_row, adv_col, vals):
        rows = self._rows(1, local_row)
        tbl = self.rec.range
        tbl.adv_vals[rows, adv_col] = vals
        tbl.adv_set[rows, adv_col] = 1

    def _range_fix(self, local_row, fix_col, v: int):
        rows = self._rows(1, local_row)
        tbl = self.rec.range
        tbl.fix_vals[rows, fix_col] = pack_u64x4(v)
        tbl.fix_set[rows, fix_col] = 1

    def assign_one_line_range_value(self, chunk0, acc, bits: int) -> BAssigned:
        assert bits <= COMMON_RANGE_BITS
        r = self.local[1]
        self._range_fix(r, RANGE_FIX_ACC_LINES, 1)
        self._range_fix(r, RANGE_FIX_TAG, bits)
        self._range_write(r, RANGE_COL_TAGGED, chunk0)
        self._range_write(r, RANGE_COL_VALUE_ACC, acc)
        rows = self._rows(1, r)
        self.local[1] += 1
        return BAssigned(Region.RANGE, RANGE_COL_VALUE_ACC, rows, acc)

    def assign_two_line_range_value(self, chunks, acc, bits: int) -> BAssigned:
        """chunks: list of 4 uint64[B,4] (v0, v1 common; v2, v3 tagged)."""
        assert 2 * COMMON_RANGE_BITS <= bits <= 4 * COMMON_RANGE_BITS
        r = self.local[1]
        self._range_fix(r, RANGE_FIX_ACC_LINES, 2)
        self._range_write(r, RANGE_COL_COMMON, chunks[0])
        self._range_write(r + 1, RANGE_COL_COMMON, chunks[1])
        cell_bits = COMMON_RANGE_BITS if bits >= 3 * COMMON_RANGE_BITS else bits % COMMON_RANGE_BITS
        self._range_fix(r, RANGE_FIX_TAG, cell_bits)
        self._range_write(r, RANGE_COL_TAGGED, chunks[2])
        cell_bits = bits - 3 * COMMON_RANGE_BITS if bits > 3 * COMMON_RANGE_BITS else 0
        self._range_fix(r + 1, RANGE_FIX_TAG, cell_bits)
        self._range_write(r + 1, RANGE_COL_TAGGED, chunks[3])
        self._range_write(r, RANGE_COL_VALUE_ACC, acc)
        rows = self._rows(1, r)
        self.local[1] += 2
        return BAssigned(Region.RANGE, RANGE_COL_VALUE_ACC, rows, acc)

    def assign_three_line_range_value(self, chunks, acc, bits: int) -> BAssigned:
        assert 3 * COMMON_RANGE_BITS <= bits <= 6 * COMMON_RANGE_BITS
        r = self.local[1]
        self._range_fix(r, RANGE_FIX_ACC_LINES, 3)
        for j in range(3):
            self._range_write(r + j, RANGE_COL_COMMON, chunks[j])
        cell_bits = COMMON_RANGE_BITS if bits >= 4 * COMMON_RANGE_BITS else bits % COMMON_RANGE_BITS
        self._range_fix(r, RANGE_FIX_TAG, cell_bits)
        self._range_write(r, RANGE_COL_TAGGED, chunks[3])
        if bits >= 5 * COMMON_RANGE_BITS:
            cell_bits = COMMON_RANGE_BITS
        elif bits > 4 * COMMON_RANGE_BITS:
            cell_bits = bits % COMMON_RANGE_BITS
        else:
            cell_bits = 0
        self._range_fix(r + 1, RANGE_FIX_TAG, cell_bits)
        self._range_write(r + 1, RANGE_COL_TAGGED, chunks[4])
        cell_bits = bits - 5 * COMMON_RANGE_BITS if bits > 5 * COMMON_RANGE_BITS else 0
        self._range_fix(r + 2, RANGE_FIX_TAG, cell_bits)
        self._range_write(r + 2, RANGE_COL_TAGGED, chunks[5])
        self._range_write(r, RANGE_COL_VALUE_ACC, acc)
        rows = self._rows(1, r)
        self.local[1] += 3
        return BAssigned(Region.RANGE, RANGE_COL_VALUE_ACC, rows, acc)

    def assign_range_value(self, chunks: List[np.ndarray], acc, bits: int) -> BAssigned:
        zero = pack_const(0, self.B)
        if bits <= COMMON_RANGE_BITS:
            return self.assign_one_line_range_value(chunks[0], acc, bits)
        if bits <= 4 * COMMON_RANGE_BITS:
            chunks = list(chunks) + [zero] * (4 - len(chunks))
            return self.assign_two_line_range_value(chunks, acc, bits)
        chunks = list(chunks) + [zero] * (6 - len(chunks))
        return self.assign_three_line_range_value(chunks, acc, bits)
