"""Dense witness record tables (structure-of-arrays, numpy-backed).

Reference parity: src/context.rs:241-301 (RecordsInner/Records). Instead of
Vec<[Option<N>; COLS]> rows, each region keeps columnar uint64[rows, cols, 4]
value limbs plus uint8 presence masks — the layout batched XLA emitters and
the vectorized verifier consume directly, and the layout that ships to/from
TPU without per-cell marshalling.

Tables grow by doubling (reference preallocates MAX_ROWS = 1<<23 rows,
src/context.rs:36; override via HALO2ECC_TPU_START_ROWS env var here).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from .assign import Cell, Region

# base chip geometry (reference: base_chip.rs:14-16)
VAR_COLUMNS = 5
MUL_COLUMNS = 2
FIXED_COLUMNS = VAR_COLUMNS + MUL_COLUMNS + 2  # + next_coeff + constant

# range chip geometry (reference: range_chip.rs:26-33)
RANGE_ADV_COLUMNS = 3
RANGE_FIX_COLUMNS = 2
RANGE_COL_VALUE_ACC = 0
RANGE_COL_TAGGED = 1
RANGE_COL_COMMON = 2
RANGE_FIX_ACC_LINES = 0
RANGE_FIX_TAG = 1

# select chip geometry (reference: select_chip.rs:29-52)
SELECT_ADV_COLUMNS = 2
SELECT_FIX_COLUMNS = 2
SELECT_COL_VALUE = 0
SELECT_COL_SELECTOR = 1
SELECT_FIX_ENCODE = 0
SELECT_FIX_IS_LOOKUP = 1

_M64 = (1 << 64) - 1

_START_ROWS = int(os.environ.get("HALO2ECC_TPU_START_ROWS", 1 << 13))

# write-once sanity checking (reference SANITY_CHECK, context.rs:37,610-632):
# asserts no cell is assigned twice with different values
SANITY_CHECK = bool(os.environ.get("HALO2ECC_TPU_SANITY_CHECK"))


def pack_u64x4(v: int) -> Tuple[int, int, int, int]:
    return (v & _M64, (v >> 64) & _M64, (v >> 128) & _M64, (v >> 192) & _M64)


def limbs_to_object_ints(vals: np.ndarray) -> np.ndarray:
    """uint64[..., 4] -> object ndarray of Python ints (vectorized)."""
    o = vals[..., 0].astype(object)
    o += vals[..., 1].astype(object) << 64
    o += vals[..., 2].astype(object) << 128
    o += vals[..., 3].astype(object) << 192
    return o


def ints_to_limbs(ints, out: np.ndarray | None = None) -> np.ndarray:
    """iterable of ints -> uint64[n, 4]."""
    n = len(ints)
    if out is None:
        out = np.empty((n, 4), dtype=np.uint64)
    for i, v in enumerate(ints):
        out[i, 0] = v & _M64
        out[i, 1] = (v >> 64) & _M64
        out[i, 2] = (v >> 128) & _M64
        out[i, 3] = v >> 192
    return out


def add_u64x4(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 256-bit add of u64x4 little-endian values (wrap at 2^256)."""
    a, b = np.broadcast_arrays(a, b)
    out = np.empty(a.shape, dtype=np.uint64)
    carry = np.zeros(a.shape[:-1], dtype=np.uint64)
    for i in range(4):
        s1 = a[..., i] + b[..., i]
        c1 = s1 < a[..., i]
        s2 = s1 + carry
        c2 = s2 < s1
        out[..., i] = s2
        carry = (c1 | c2).astype(np.uint64)
    return out


def sub_u64x4(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 256-bit subtract (a >= b assumed; wraps otherwise)."""
    a, b = np.broadcast_arrays(a, b)
    out = np.empty(a.shape, dtype=np.uint64)
    borrow = np.zeros(a.shape[:-1], dtype=np.uint64)
    for i in range(4):
        d1 = a[..., i] - b[..., i]
        b1 = a[..., i] < b[..., i]
        d2 = d1 - borrow
        b2 = d1 < borrow
        out[..., i] = d2
        borrow = (b1 | b2).astype(np.uint64)
    return out


def geq_u64x4(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized a >= b on u64x4 values."""
    a, b = np.broadcast_arrays(a, b)
    res = np.ones(a.shape[:-1], dtype=bool)
    decided = np.zeros(a.shape[:-1], dtype=bool)
    for i in range(3, -1, -1):
        gt = a[..., i] > b[..., i]
        lt = a[..., i] < b[..., i]
        res = np.where(~decided & lt, False, res)
        decided |= gt | lt
    return res


def mod_add_u64x4(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
    """(a + b) mod n for u64x4 arrays with a, b < n < 2^255 (one conditional
    subtract suffices). Vectorized block form of the per-row encode patches."""
    n_arr = np.array(pack_u64x4(n), dtype=np.uint64)
    s = add_u64x4(a, b)
    ge = geq_u64x4(s, n_arr)
    if np.any(ge):
        s[ge] = sub_u64x4(s[ge], n_arr)
    return s


class RegionTable:
    """One chip region: advice + fixed columns with presence masks."""

    __slots__ = ("n_adv", "n_fix", "cap", "height", "adv_vals", "adv_set",
                 "fix_vals", "fix_set")

    def __init__(self, n_adv: int, n_fix: int, cap: int = _START_ROWS):
        self.n_adv = n_adv
        self.n_fix = n_fix
        self.cap = cap
        self.height = 0
        self.adv_vals = np.zeros((cap, n_adv, 4), dtype=np.uint64)
        self.adv_set = np.zeros((cap, n_adv), dtype=np.uint8)
        self.fix_vals = np.zeros((cap, n_fix, 4), dtype=np.uint64)
        self.fix_set = np.zeros((cap, n_fix), dtype=np.uint8)

    def ensure(self, rows: int) -> None:
        if rows <= self.cap:
            return
        new_cap = self.cap
        while new_cap < rows:
            new_cap *= 2
        for name in ("adv_vals", "adv_set", "fix_vals", "fix_set"):
            old = getattr(self, name)
            new = np.zeros((new_cap,) + old.shape[1:], dtype=old.dtype)
            new[: self.cap] = old
            setattr(self, name, new)
        self.cap = new_cap

    # -- scalar writes (trace path) --

    def write_adv(self, row: int, col: int, val: int) -> None:
        if row >= self.cap:
            self.ensure(row + 1)
        packed = pack_u64x4(val)
        if SANITY_CHECK and self.adv_set[row, col]:
            assert tuple(self.adv_vals[row, col]) == packed, (
                f"advice cell ({row},{col}) reassigned with a different value"
            )
        self.adv_vals[row, col] = packed
        self.adv_set[row, col] = 1

    def write_fix(self, row: int, col: int, val: int) -> None:
        if row >= self.cap:
            self.ensure(row + 1)
        packed = pack_u64x4(val)
        if SANITY_CHECK and self.fix_set[row, col]:
            assert tuple(self.fix_vals[row, col]) == packed, (
                f"fixed cell ({row},{col}) reassigned with a different value"
            )
        self.fix_vals[row, col] = packed
        self.fix_set[row, col] = 1

    # -- block writes (batched path) --

    def write_adv_block(self, rows: np.ndarray, col: int, vals: np.ndarray) -> None:
        """rows: int64[n]; vals: uint64[n, 4]."""
        self.ensure(int(rows.max()) + 1)
        self.adv_vals[rows, col] = vals
        self.adv_set[rows, col] = 1

    def write_fix_block(self, rows: np.ndarray, col: int, vals: np.ndarray) -> None:
        self.ensure(int(rows.max()) + 1)
        self.fix_vals[rows, col] = vals
        self.fix_set[rows, col] = 1

    # -- reads --

    def adv_int(self, row: int, col: int) -> int:
        v = self.adv_vals[row, col]
        return int(v[0]) | (int(v[1]) << 64) | (int(v[2]) << 128) | (int(v[3]) << 192)

    def adv_col_ints(self, col: int, rows: int) -> np.ndarray:
        return limbs_to_object_ints(self.adv_vals[:rows, col])

    def fix_col_ints(self, col: int, rows: int) -> np.ndarray:
        return limbs_to_object_ints(self.fix_vals[:rows, col])

    def bump_height(self, rows: int) -> None:
        if rows > self.height:
            self.height = rows


class Records:
    """The three region tables + copy-constraint (permutation) pairs.

    Reference: src/context.rs:294-301.
    """

    def __init__(self):
        self.base = RegionTable(VAR_COLUMNS, FIXED_COLUMNS)
        self.range = RegionTable(RANGE_ADV_COLUMNS, RANGE_FIX_COLUMNS)
        self.select = RegionTable(SELECT_ADV_COLUMNS, SELECT_FIX_COLUMNS)
        self.permutations: List[Tuple[Cell, Cell]] = []
        # batched copy constraints: ((region, col, rows[B]), (region, col, rows[B]))
        self.permutation_blocks: List[Tuple[Tuple, Tuple]] = []

    def region(self, r: Region) -> RegionTable:
        if r == Region.BASE:
            return self.base
        if r == Region.RANGE:
            return self.range
        return self.select

    @property
    def base_height(self) -> int:
        return self.base.height

    @property
    def range_height(self) -> int:
        return self.range.height

    @property
    def select_height(self) -> int:
        return self.select.height

    # -- debug helpers (reference: context.rs:59-132) --

    def check_row_has_some(self, base_rows: int, range_rows: int, select_rows: int):
        """Assert every used row has at least one fixed assignment
        (reference check_row_has_some)."""
        for name, tbl, rows in (
            ("base", self.base, base_rows),
            ("range", self.range, range_rows),
            ("select", self.select, select_rows),
        ):
            if rows == 0:
                continue
            empty = ~self.region_has_fix(tbl, rows)
            if empty.any():
                bad = int(np.nonzero(empty)[0][0])
                raise AssertionError(f"no assigned fix in {name} chip at row {bad}")

    @staticmethod
    def region_has_fix(tbl: RegionTable, rows: int):
        return tbl.fix_set[:rows].any(axis=-1)

    def dump_fix_rows(self, start: int, end: int) -> str:
        """Human-readable fixed-cell dump (reference dump_fix_value)."""
        lines = []
        for name, tbl in (("base", self.base), ("range", self.range), ("select", self.select)):
            for r in range(start, min(end, tbl.height)):
                for c in range(tbl.n_fix):
                    if tbl.fix_set[r, c]:
                        v = tbl.fix_vals[r, c]
                        val = int(v[0]) | (int(v[1]) << 64) | (int(v[2]) << 128) | (int(v[3]) << 192)
                        lines.append(f"{name}_fix[{r}][{c}] = {val:#x}")
        return "\n".join(lines)

    def dump_permutations(self, limit: int = 50) -> str:
        lines = [f"{i}: {a} <-> {b}" for i, (a, b) in enumerate(self.permutations[:limit])]
        extra = len(self.permutations) - limit
        if extra > 0:
            lines.append(f"... and {extra} more pairs + {len(self.permutation_blocks)} blocks")
        return "\n".join(lines)
