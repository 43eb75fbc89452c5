"""Prover-handoff export: range lookup table + witness serialization
round-trip (reload-and-reverify), with tamper detection."""

import numpy as np
import pytest

from halo2ecc_s_tpu.core.context import COMMON_RANGE_BITS, Context
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.fields import BN254_FQ
from halo2ecc_s_tpu.verify.export import (
    export_context,
    import_context,
    range_lookup_table,
)
from halo2ecc_s_tpu.verify.mock_prover import verify_context


def test_range_lookup_table_shape():
    t = range_lookup_table()
    # sum_{tag<=18} 2^tag rows (reference range_chip.rs:230-258)
    assert t.shape == ((1 << (COMMON_RANGE_BITS + 1)) - 1, 2)
    # spot semantics: every (tag, value) has value < 2^tag, all pairs unique
    assert np.all(t[:, 1] < (np.uint64(1) << t[:, 0]))
    assert len({(int(a), int(b)) for a, b in t}) == t.shape[0]
    # tag 18 occupies the last 2^18 rows
    assert np.all(t[-(1 << 18) :, 0] == COMMON_RANGE_BITS)


def _small_circuit():
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    a = ictx.assign_w(123456789)
    b = ictx.assign_w(987654321)
    c = ictx.int_mul(a, b)
    d = ictx.int_add(c, a)
    ictx.assert_int_equal(d, ictx.assign_w((123456789 * 987654321 + 123456789) % BN254_FQ))
    return ctx


def test_export_import_reverify(tmp_path):
    ctx = _small_circuit()
    assert verify_context(ctx, k=18) == []
    path = str(tmp_path / "witness.npz")
    export_context(ctx, path)

    ctx2, table = import_context(path)
    assert ctx2.n == ctx.n
    assert verify_context(ctx2, k=18) == []
    np.testing.assert_array_equal(table, range_lookup_table())
    # tables bit-identical
    for name in ("base", "range", "select"):
        ta, tb = getattr(ctx.records, name), getattr(ctx2.records, name)
        assert ta.height == tb.height
        h = ta.height
        np.testing.assert_array_equal(ta.adv_vals[:h], tb.adv_vals[:h])
        np.testing.assert_array_equal(ta.fix_vals[:h], tb.fix_vals[:h])
    assert len(ctx.records.permutations) == len(ctx2.records.permutations)


def test_import_tamper_detected(tmp_path):
    ctx = _small_circuit()
    path = str(tmp_path / "witness.npz")
    export_context(ctx, path)
    ctx2, _ = import_context(path)
    ctx2.records.base.write_adv(3, 0, 12345)
    assert verify_context(ctx2, k=18) != []
