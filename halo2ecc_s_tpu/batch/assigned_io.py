"""Shared helpers for moving assigned values across template boundaries.

Batched leaves use the template-output convention:
    leaf = (vals u32[B, 16], (region, col, rows int64[B]))
A batched AssignedInteger ("BInt") is limbs + native leaves + the static
`times` counter; conditions are single leaves.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from ..core.assign import AssignedInteger, AssignedValue, Cell, Region
from ..kernels import ff_jax as ff
from .template import AssignedInput

Leaf = Tuple[np.ndarray, Tuple[Region, int, np.ndarray]]


def leaf_vals(leaf: Leaf) -> np.ndarray:
    return leaf[0]


def leaf_rows(leaf: Leaf):
    return leaf[1]


def unbatch_value(leaf: Leaf, lane: int) -> AssignedValue:
    vals, (region, col, rows) = leaf
    return AssignedValue(Cell(region, col, int(rows[lane])), ff.limbs_to_int(vals[lane]))


def broadcast_value(v: AssignedValue, B: int) -> Leaf:
    return (
        np.broadcast_to(ff.ints_to_limbs([v.val], 16), (B, 16)),
        (v.cell.region, v.cell.col, np.full(B, v.cell.row, dtype=np.int64)),
    )


@dataclass
class BInt:
    """Batched assigned integer (limbs + native leaves, static times)."""

    limbs: List[Leaf]
    native: Leaf
    times: int

    @classmethod
    def from_tree(cls, tree) -> "BInt":
        return cls(list(tree["limbs"]), tree["native"], tree["times"])

    def tree(self):
        return {"limbs": self.limbs, "native": self.native, "times": self.times}

    def lane(self, i: int) -> AssignedInteger:
        return AssignedInteger(
            [unbatch_value(l, i) for l in self.limbs],
            unbatch_value(self.native, i),
            self.times,
        )

    @classmethod
    def broadcast(cls, v: AssignedInteger, B: int) -> "BInt":
        return cls(
            [broadcast_value(l, B) for l in v.limbs_le],
            broadcast_value(v.native, B),
            v.times,
        )

    def value(self, lane: int, limb_bits: int) -> int:
        res = 0
        for l in reversed(self.limbs):
            res = (res << limb_bits) + ff.limbs_to_int(leaf_vals(l)[lane])
        return res


def declare_int(prefix: str, sample: AssignedInteger, limb_bits: int, lead_bits: int):
    """AssignedInput declarations for an integer's leaves (widths from the
    times-dependent lazy-limb bounds)."""
    t_bits = max(sample.times.bit_length(), 1) + 1
    decls = []
    n_limbs = len(sample.limbs_le)
    for j, limb in enumerate(sample.limbs_le):
        bits = (limb_bits if j < n_limbs - 1 else lead_bits) + t_bits
        decls.append(AssignedInput(f"{prefix}_l{j}", bits, limb.val))
    decls.append(AssignedInput(f"{prefix}_native", 254, sample.native.val))
    return decls


def int_from_ins(ins: Dict, prefix: str, times: int, n_limbs: int = 3) -> AssignedInteger:
    limbs = [ins[f"{prefix}_l{j}"] for j in range(n_limbs)]
    return AssignedInteger(list(limbs), ins[f"{prefix}_native"], times)


def int_arrays(prefix: str, b: BInt, ins: Dict, rows: Dict):
    for j, leaf in enumerate(b.limbs):
        ins[f"{prefix}_l{j}"] = leaf_vals(leaf)
        rows[f"{prefix}_l{j}"] = leaf_rows(leaf)
    ins[f"{prefix}_native"] = leaf_vals(b.native)
    rows[f"{prefix}_native"] = leaf_rows(b.native)


def declare_value(prefix: str, sample: AssignedValue, bits: int = 254):
    return [AssignedInput(prefix, bits, sample.val)]


def value_arrays(prefix: str, leaf: Leaf, ins: Dict, rows: Dict):
    ins[prefix] = leaf_vals(leaf)
    rows[prefix] = leaf_rows(leaf)
