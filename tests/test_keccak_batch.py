"""Batched keccak witness engine: B-lane hashes must match the host oracle
and pass full constraint verification (reference keccak_chip.rs tests)."""

import numpy as np
import pytest

from halo2ecc_s_tpu.batch.keccak_batch import BatchKeccak
from halo2ecc_s_tpu.utils.fields import BN254_FR
from halo2ecc_s_tpu.utils.keccak import keccak256_of_scalars
from halo2ecc_s_tpu.verify.mock_prover import verify_context

pytestmark = pytest.mark.slow


def test_keccak_batch_matches_oracle_and_verifies():
    inputs = [123456789, 0, BN254_FR - 977]
    bk = BatchKeccak()
    ctx, results = bk.hash_batch(inputs)
    for v, s in zip(results, inputs):
        assert v.val == keccak256_of_scalars([s], BN254_FR)
    # ~156k rows/lane x 3 lanes -> k=20 capacity
    assert verify_context(ctx, k=20) == []


def test_keccak_batch_device_bit_exact():
    inputs = [42, 31337]
    bk = BatchKeccak()
    ctx_h, res_h = bk.hash_batch(inputs)
    ctx_d, res_d = bk.hash_batch(inputs, device=True)
    for a, b in zip(res_h, res_d):
        assert a.val == b.val and a.cell == b.cell
    for name in ("base", "range", "select"):
        ta, tb = getattr(ctx_h.records, name), getattr(ctx_d.records, name)
        assert ta.height == tb.height
        h = ta.height
        np.testing.assert_array_equal(ta.adv_vals[:h], tb.adv_vals[:h])
        np.testing.assert_array_equal(ta.fix_vals[:h], tb.fix_vals[:h])
    assert verify_context(ctx_d, k=20) == []


def test_keccak_batch_tamper_detected():
    bk = BatchKeccak()
    ctx, _ = bk.hash_batch([7])
    from halo2ecc_s_tpu.core.records import pack_u64x4

    # corrupt a cell that is actually assigned (value+1 breaks its gate)
    tbl = ctx.records.base
    rows, cols = np.nonzero(tbl.adv_set[: tbl.height])
    r, c = int(rows[len(rows) // 2]), int(cols[len(rows) // 2])
    old = tbl.adv_vals[r, c].copy()
    new = pack_u64x4(2) if not np.array_equal(old, pack_u64x4(2)) else pack_u64x4(3)
    tbl.adv_vals[r, c] = new
    assert verify_context(ctx, k=18) != []


def test_keccak_batch_serving_mode_matches_oracle():
    """Serving mode (device=True, write_tables=False): results still match
    the host oracle and divergence flags are still checked; host Records are
    never materialised."""
    from halo2ecc_s_tpu.core.context import Context

    scalars = [3, (1 << 200) + 17, BN254_FR - 1]
    bk = BatchKeccak()
    ctx, out = bk.hash_batch(scalars, device=True, write_tables=False)
    for s, v in zip(scalars, out):
        assert v.val == keccak256_of_scalars([s], BN254_FR)
    ref_ctx, _ = bk.hash_batch(scalars[:1], Context(), device=False)
    assert ctx.records.base.adv_vals.shape[0] < ref_ctx.records.base.adv_vals.shape[0]
