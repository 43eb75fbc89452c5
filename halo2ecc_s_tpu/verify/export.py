"""Prover handoff: lookup-table materialization + witness serialization.

The reference's entire output is witness tables consumed by halo2
keygen/prove (`context.rs:575-588 assign_all`; the range chip additionally
materializes a ~2^19-row (tag, value) lookup table, `range_chip.rs:230-258`).
This module is that handoff surface for the TPU build:

- `range_lookup_table()` materializes the (tag, value) table rows.
- `export_context()` serializes the three regions' advice/fixed columns,
  presence masks, permutation pairs AND blocks, the range lookup table, and
  the native modulus to one compressed `.npz` file (format v1, documented
  below). Everything a prover needs to ingest the witness.
- `import_context()` reloads the file into a fresh `Context` whose tables
  verify exactly like the original (round-trip test:
  tests/test_export.py).

npz format v1 (all arrays little-endian):
  meta                 u64[6]   = [1 (version), common_bits, n_modulus u64x4]
  {base,range,select}_adv_vals  u64[H, n_adv, 4]
  {base,range,select}_adv_set   u8 [H, n_adv]
  {base,range,select}_fix_vals  u64[H, n_fix, 4]
  {base,range,select}_fix_set   u8 [H, n_fix]
  perm_pairs           i64[P, 6]  rows (region_a, col_a, row_a,
                                        region_b, col_b, row_b)
  perm_block_meta      i64[Bk, 5] rows (region_a, col_a, region_b, col_b, len)
  perm_block_rows_a    i64[sum(len)]   concatenated row arrays
  perm_block_rows_b    i64[sum(len)]
  range_table          u64[T, 2]  the (tag, value) lookup table
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.context import COMMON_RANGE_BITS, Context
from ..core.records import Records, pack_u64x4


def range_lookup_table(common_bits: int = COMMON_RANGE_BITS) -> np.ndarray:
    """The range chip's (tag, value) lookup table: for every tag in
    0..=common_bits, all values in [0, 2^tag) — sum_{t<=18} 2^t = 2^19 - 1 + 19
    rows for the default 18-bit config (reference range_chip.rs:230-258)."""
    tags = []
    vals = []
    for tag in range(common_bits + 1):
        count = 1 << tag
        tags.append(np.full(count, tag, dtype=np.uint64))
        vals.append(np.arange(count, dtype=np.uint64))
    return np.stack([np.concatenate(tags), np.concatenate(vals)], axis=1)


_REGIONS = ("base", "range", "select")


def export_context(ctx: Context, path: str) -> None:
    """Serialize the context's witness tables (format v1, module docstring)."""
    rec = ctx.records
    out = {}
    n_limbs = pack_u64x4(ctx.n)
    out["meta"] = np.array([1, COMMON_RANGE_BITS, *n_limbs], dtype=np.uint64)
    for name in _REGIONS:
        tbl = getattr(rec, name)
        h = tbl.height
        out[f"{name}_adv_vals"] = tbl.adv_vals[:h]
        out[f"{name}_adv_set"] = tbl.adv_set[:h]
        out[f"{name}_fix_vals"] = tbl.fix_vals[:h]
        out[f"{name}_fix_set"] = tbl.fix_set[:h]
    pairs = np.empty((len(rec.permutations), 6), dtype=np.int64)
    for i, (a, b) in enumerate(rec.permutations):
        pairs[i] = (int(a.region), a.col, a.row, int(b.region), b.col, b.row)
    out["perm_pairs"] = pairs
    meta = []
    rows_a = []
    rows_b = []
    for (ra, ca, ra_rows), (rb, cb, rb_rows) in rec.permutation_blocks:
        assert len(ra_rows) == len(rb_rows)
        meta.append((int(ra), ca, int(rb), cb, len(ra_rows)))
        rows_a.append(np.asarray(ra_rows, dtype=np.int64))
        rows_b.append(np.asarray(rb_rows, dtype=np.int64))
    out["perm_block_meta"] = np.array(meta, dtype=np.int64).reshape(-1, 5)
    out["perm_block_rows_a"] = (
        np.concatenate(rows_a) if rows_a else np.empty(0, dtype=np.int64)
    )
    out["perm_block_rows_b"] = (
        np.concatenate(rows_b) if rows_b else np.empty(0, dtype=np.int64)
    )
    out["range_table"] = range_lookup_table()
    np.savez_compressed(path, **out)


def import_context(path: str) -> Tuple[Context, np.ndarray]:
    """Reload an exported witness; returns (context, range_table). The
    context's tables verify exactly like the original's
    (verify.mock_prover.verify_context)."""
    from ..core.assign import Cell, Region

    data = np.load(path)
    meta = data["meta"]
    assert int(meta[0]) == 1, f"unsupported export version {int(meta[0])}"
    n = int(meta[2]) | int(meta[3]) << 64 | int(meta[4]) << 128 | int(meta[5]) << 192
    rec = Records()
    ctx = Context(n, rec)
    for name in _REGIONS:
        tbl = getattr(rec, name)
        adv = data[f"{name}_adv_vals"]
        h = adv.shape[0]
        tbl.ensure(h)
        tbl.adv_vals[:h] = adv
        tbl.adv_set[:h] = data[f"{name}_adv_set"]
        tbl.fix_vals[:h] = data[f"{name}_fix_vals"]
        tbl.fix_set[:h] = data[f"{name}_fix_set"]
        tbl.bump_height(h)
    for row in data["perm_pairs"]:
        rec.permutations.append(
            (
                Cell(Region(int(row[0])), int(row[1]), int(row[2])),
                Cell(Region(int(row[3])), int(row[4]), int(row[5])),
            )
        )
    off = 0
    for ra, ca, rb, cb, ln in data["perm_block_meta"]:
        rec.permutation_blocks.append(
            (
                (Region(int(ra)), int(ca), data["perm_block_rows_a"][off : off + ln]),
                (Region(int(rb)), int(cb), data["perm_block_rows_b"][off : off + ln]),
            )
        )
        off += int(ln)
    ctx.base_offset = rec.base.height
    ctx.range_offset = rec.range.height
    ctx.select_offset = rec.select.height
    return ctx, data["range_table"]
