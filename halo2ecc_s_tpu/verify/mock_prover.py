"""Constraint-system verifier over Records (MockProver equivalent).

Checks, fully vectorized over rows:
  1. the universal base gate on every base-region row (base_chip.rs:50-69)
  2. range accumulation gates for acc_lines in {1,2,3} (range_chip.rs:141-220)
  3. range lookups: tagged cell < 2^tag (tag <= 18), common cell < 2^18
     against the (tag, value) table semantics (range_chip.rs:119-137, 230-258)
  4. select-chip lookup_any semantics: every row's
     (limb_info, selector * 2^128 + encoded_offset, 0) tuple must appear as a
     (limb_info, encoded_offset, is_lookup=0) row (select_chip.rs:62-96)
  5. copy constraints: both cells of every permutation pair hold equal values

The reference delegates these checks to halo2's MockProver
(src/tests/mod.rs:117-150); this framework verifies its own tables directly,
which is also the shape of the batched on-device witness validator.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..core.context import COMMON_RANGE_BITS, Context
from ..core.records import (
    FIXED_COLUMNS,
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
    limbs_to_object_ints,
)

SELECTOR_ENCODE_OFFSET = 128  # select_chip.rs:18


def _first_rows(mask: np.ndarray, limit: int = 5) -> List[int]:
    return [int(i) for i in np.nonzero(mask)[0][:limit]]


def verify_context(
    ctx: Context,
    k: int | None = None,
    max_errors: int = 16,
    use_native: bool | None = None,
) -> List[str]:
    """use_native: True forces the C++ backend, False forces the numpy
    reference path, None picks native when the toolchain built it."""
    if use_native is not False:
        from . import native as _native

        lib = _native.get_lib()
        if lib is not None:
            return _verify_native(ctx, lib, k)
        if use_native is True:
            raise RuntimeError("native verifier unavailable")

    return _verify_python(ctx, k, max_errors)


def _verify_native(ctx: Context, lib, k: int | None) -> List[str]:
    from . import native as _native

    errors: List[str] = []
    rec = ctx.records
    n = ctx.n

    if k is not None:
        usable = (1 << k) - 8
        for name, h in (
            ("base", rec.base.height),
            ("range", rec.range.height),
            ("select", rec.select.height),
        ):
            if h > usable:
                errors.append(f"{name} region height {h} exceeds usable rows 2^{k}-8")

    if rec.base.height > 0:
        bad = _native.check_base_gate(lib, rec.base, rec.base.height, n)
        if bad >= 0:
            errors.append(f"base gate violated at row {bad}")
    if rec.range.height > 0:
        bad = _native.check_range_region(
            lib, rec.range, rec.range.height, n, COMMON_RANGE_BITS
        )
        if bad >= 0:
            errors.append(f"range region violated at row {bad}")
    if rec.select.height > 0:
        bad = _native.check_select_lookup(lib, rec.select, rec.select.height, n)
        if bad >= 0:
            errors.append(f"select lookup violated at row {bad}")

    # flatten scalar pairs + batch blocks into index arrays
    n_pairs = len(rec.permutations)
    block_len = sum(len(rows_a) for (_, _, rows_a), _ in rec.permutation_blocks)
    total = n_pairs + block_len
    if total > 0:
        rego_a = np.empty(total, np.int64)
        col_a = np.empty(total, np.int64)
        row_a = np.empty(total, np.int64)
        rego_b = np.empty(total, np.int64)
        col_b = np.empty(total, np.int64)
        row_b = np.empty(total, np.int64)
        for i, (a, b) in enumerate(rec.permutations):
            rego_a[i], col_a[i], row_a[i] = int(a.region), a.col, a.row
            rego_b[i], col_b[i], row_b[i] = int(b.region), b.col, b.row
        off = n_pairs
        for (ra, ca, rows_a), (rb, cb, rows_b) in rec.permutation_blocks:
            m = len(rows_a)
            rego_a[off : off + m] = int(ra)
            col_a[off : off + m] = ca
            row_a[off : off + m] = rows_a
            rego_b[off : off + m] = int(rb)
            col_b[off : off + m] = cb
            row_b[off : off + m] = rows_b
            off += m
        bad = _native.check_permutations(
            lib, rec, rego_a, col_a, row_a, rego_b, col_b, row_b
        )
        if bad >= 0:
            errors.append(f"permutation violated at index {bad}")

    return errors


def _verify_python(ctx: Context, k: int | None = None, max_errors: int = 16) -> List[str]:
    errors: List[str] = []
    n = ctx.n
    rec = ctx.records

    if k is not None:
        usable = (1 << k) - 8  # leave room for blinding rows as halo2 does
        for name, h in (
            ("base", rec.base.height),
            ("range", rec.range.height),
            ("select", rec.select.height),
        ):
            if h > usable:
                errors.append(f"{name} region height {h} exceeds usable rows 2^{k}-8")

    # ---------------- base gate ----------------
    R = rec.base.height
    if R > 0:
        tbl = rec.base
        tbl.ensure(R + 1)
        adv = [limbs_to_object_ints(tbl.adv_vals[: R + 1, c]) for c in range(VAR_COLUMNS)]
        fix = [limbs_to_object_ints(tbl.fix_vals[:R, c]) for c in range(FIXED_COLUMNS)]
        nxt = adv[VAR_COLUMNS - 1][1 : R + 1]
        acc = fix[VAR_COLUMNS + MUL_COLUMNS + 1] + fix[VAR_COLUMNS + MUL_COLUMNS] * nxt
        for i in range(VAR_COLUMNS):
            acc = acc + fix[i] * adv[i][:R]
        for i in range(MUL_COLUMNS):
            acc = acc + fix[VAR_COLUMNS + i] * adv[2 * i][:R] * adv[2 * i + 1][:R]
        bad = (acc % n) != 0
        if bad.any():
            errors.append(f"base gate violated at rows {_first_rows(bad)}")

    # ---------------- range region ----------------
    R2 = rec.range.height
    if R2 > 0:
        tbl = rec.range
        tbl.ensure(R2 + 2)
        acc_col = limbs_to_object_ints(tbl.adv_vals[:R2, RANGE_COL_VALUE_ACC])
        tagged = limbs_to_object_ints(tbl.adv_vals[: R2 + 2, RANGE_COL_TAGGED])
        common = limbs_to_object_ints(tbl.adv_vals[: R2 + 2, RANGE_COL_COMMON])
        tags = limbs_to_object_ints(tbl.fix_vals[:R2, RANGE_FIX_TAG])
        acc_lines = limbs_to_object_ints(tbl.fix_vals[:R2, RANGE_FIX_ACC_LINES])

        bad_tag = tags > COMMON_RANGE_BITS
        if bad_tag.any():
            errors.append(f"range tag > {COMMON_RANGE_BITS} at rows {_first_rows(bad_tag)}")
        limits = np.array([1 << int(t) if t <= 64 else 0 for t in tags], dtype=object)
        bad_lookup = ~np.less(tagged[:R2], limits)
        if bad_lookup.any():
            errors.append(f"range lookup (tagged) violated at rows {_first_rows(bad_lookup)}")
        bad_common = ~np.less(common[:R2], 1 << COMMON_RANGE_BITS)
        if bad_common.any():
            errors.append(f"range lookup (common) violated at rows {_first_rows(bad_common)}")

        S = 1 << COMMON_RANGE_BITS
        m1 = acc_lines == 1
        m2 = acc_lines == 2
        m3 = acc_lines == 3
        if m1.any():
            bad = m1 & (((acc_col - tagged[:R2]) % n) != 0)
            if bad.any():
                errors.append(f"range acc(1) violated at rows {_first_rows(bad)}")
        if m2.any():
            expect = (
                common[:R2]
                + common[1 : R2 + 1] * S
                + tagged[:R2] * S**2
                + tagged[1 : R2 + 1] * S**3
            )
            bad = m2 & (((acc_col - expect) % n) != 0)
            if bad.any():
                errors.append(f"range acc(2) violated at rows {_first_rows(bad)}")
        if m3.any():
            expect = (
                common[:R2]
                + common[1 : R2 + 1] * S
                + common[2 : R2 + 2] * S**2
                + tagged[:R2] * S**3
                + tagged[1 : R2 + 1] * S**4
                + tagged[2 : R2 + 2] * S**5
            )
            bad = m3 & (((acc_col - expect) % n) != 0)
            if bad.any():
                errors.append(f"range acc(3) violated at rows {_first_rows(bad)}")
        bad_lines = ~(m1 | m2 | m3) & (acc_lines != 0)
        if bad_lines.any():
            errors.append(f"range acc_lines out of domain at rows {_first_rows(bad_lines)}")

    # ---------------- select region ----------------
    R3 = rec.select.height
    if R3 > 0:
        tbl = rec.select
        limb = limbs_to_object_ints(tbl.adv_vals[:R3, SELECT_COL_VALUE])
        sel = limbs_to_object_ints(tbl.adv_vals[:R3, SELECT_COL_SELECTOR])
        enc = limbs_to_object_ints(tbl.fix_vals[:R3, SELECT_FIX_ENCODE])
        is_lookup = limbs_to_object_ints(tbl.fix_vals[:R3, SELECT_FIX_IS_LOOKUP])

        table = {(0, 0)}  # empty rows beyond the region
        for i in range(R3):
            if is_lookup[i] == 0:
                table.add((limb[i], enc[i]))
        shift = 1 << SELECTOR_ENCODE_OFFSET
        bad_rows = []
        for i in range(R3):
            key = (limb[i], (sel[i] * shift + enc[i]) % n)
            if key not in table:
                bad_rows.append(i)
                if len(bad_rows) >= 5:
                    break
        if bad_rows:
            errors.append(f"select lookup violated at rows {bad_rows}")

    # ---------------- batched permutation blocks ----------------
    for idx, ((ra, ca, rows_a), (rb, cb, rows_b)) in enumerate(rec.permutation_blocks):
        ta, tb = rec.region(ra), rec.region(rb)
        if not (ta.adv_set[rows_a, ca].all() and tb.adv_set[rows_b, cb].all()):
            errors.append(f"permutation block {idx}: unassigned cells")
            continue
        va = ta.adv_vals[rows_a, ca]
        vb = tb.adv_vals[rows_b, cb]
        neq = (va != vb).any(axis=-1)
        if neq.any():
            errors.append(
                f"permutation block {idx}: unequal at lanes {_first_rows(neq)}"
            )

    # ---------------- permutations ----------------
    bad_pairs = []
    for idx, (a, b) in enumerate(rec.permutations):
        ta, tb = rec.region(a.region), rec.region(b.region)
        if not ta.adv_set[a.row, a.col] or not tb.adv_set[b.row, b.col]:
            bad_pairs.append((idx, "unassigned"))
        elif ta.adv_int(a.row, a.col) != tb.adv_int(b.row, b.col):
            bad_pairs.append((idx, "unequal"))
        if len(bad_pairs) >= 5:
            break
    if bad_pairs:
        errors.append(f"permutation violated: {bad_pairs}")

    return errors[:max_errors]


def run_circuit(ctx: Context, k: int) -> None:
    """Equivalent of run_circuit_on_bn256 (tests/mod.rs:117-132)."""
    errors = verify_context(ctx, k)
    if errors:
        raise AssertionError("circuit verification failed:\n" + "\n".join(errors))


def run_circuit_expect_fail(ctx: Context, k: int) -> None:
    errors = verify_context(ctx, k)
    if not errors:
        raise AssertionError("circuit verification unexpectedly succeeded")
