"""Assigned-value model: typed handles into the witness tables.

Reference parity: src/assign.rs (Chip, Cell, AssignedValue, AssignedInteger,
AssignedPoint, AssignedNonZeroPoint, AssignedPointWithCurvature,
AssignedCondition, Fq2/6/12 + G2 aliases).

Values are plain Python ints in [0, N) where N is the native circuit field.
The `times` overflow counter on AssignedInteger is trace-time static metadata
(it never enters the witness), which is what lets the batched/TPU path keep
static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import IntEnum
from typing import List, Optional, Tuple


class Region(IntEnum):
    BASE = 0
    RANGE = 1
    SELECT = 2


@dataclass(frozen=True)
class Cell:
    region: Region
    col: int
    row: int


@dataclass(frozen=True)
class AssignedValue:
    cell: Cell
    val: int  # element of the native field N


@dataclass(frozen=True)
class AssignedCondition:
    """A value constrained (by its creation site) to be 0 or 1."""

    value: AssignedValue

    @property
    def val(self) -> int:
        return self.value.val

    @property
    def cell(self) -> Cell:
        return self.value.cell


@dataclass
class AssignedInteger:
    """Non-native ("wrong field" W) integer over native field N.

    limbs_le: little-endian limbs (each an AssignedValue over N)
    native:   shadow value = sum(limb_i * 2^(i*limb_bits)) mod N
    times:    overflow counter; value < w_ceil * times (reference assign.rs:26-37)
    """

    limbs_le: List[AssignedValue]
    native: AssignedValue
    times: int


@dataclass
class AssignedCurvature:
    v: AssignedInteger
    z: AssignedCondition  # 1 when the curvature is undefined (y == 0)


@dataclass
class AssignedPoint:
    x: AssignedInteger
    y: AssignedInteger
    z: AssignedCondition  # 1 for identity


@dataclass
class AssignedNonZeroPoint:
    x: AssignedInteger
    y: AssignedInteger


@dataclass
class AssignedPointWithCurvature:
    x: AssignedInteger
    y: AssignedInteger
    z: AssignedCondition
    curvature: AssignedCurvature

    def to_point(self) -> AssignedPoint:
        return AssignedPoint(self.x, self.y, self.z)


# Tower element aliases: plain tuples so host (ints) and circuit
# (AssignedInteger) share the generic algorithms in core/tower.py.
AssignedFq2 = Tuple  # (c0, c1)
AssignedFq6 = Tuple  # (fq2, fq2, fq2)
AssignedFq12 = Tuple  # (fq6, fq6)


@dataclass
class AssignedG2Affine:
    x: AssignedFq2
    y: AssignedFq2
    z: object  # condition; host uses int 0/1


@dataclass
class AssignedG2:
    x: AssignedFq2
    y: AssignedFq2
    z: AssignedFq2


@dataclass
class AssignedG2Prepared:
    coeffs: List  # list of [fq2, fq2, fq2] line coefficients
