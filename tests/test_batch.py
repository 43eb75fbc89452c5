"""Batched witness engine tests: device-computed tables must verify AND be
bit-exact against the scalar trace path for identical inputs."""

import random

import numpy as np
import pytest

from halo2ecc_s_tpu.batch.integer_batch import get_engine
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.fields import BN254_FQ, BN254_FR
from halo2ecc_s_tpu.verify.mock_prover import run_circuit, verify_context

RNG = random.Random(0xBA7C)


def _build_batch(B, vals_a, vals_b):
    engine = get_engine(BN254_FQ)
    ctx = Context()
    a16 = ff.ints_to_limbs(vals_a, 16)
    b16 = ff.ints_to_limbs(vals_b, 16)
    engine.run(ctx, a16, b16)
    return ctx


def _build_scalar(vals_a, vals_b):
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    for av, bv in zip(vals_a, vals_b):
        a = ictx.assign_w(av)
        b = ictx.assign_w(bv)
        ictx.int_mul(a, b)
    return ctx


def test_batch_int_mul_verifies():
    B = 8
    vals_a = [RNG.randrange(BN254_FQ) for _ in range(B)]
    vals_b = [RNG.randrange(BN254_FQ) for _ in range(B)]
    vals_a[0], vals_b[0] = 0, 0
    vals_a[1], vals_b[1] = BN254_FQ - 1, BN254_FQ - 1
    ctx = _build_batch(B, vals_a, vals_b)
    run_circuit(ctx, 20)


def test_batch_matches_scalar_bit_exact():
    B = 4
    vals_a = [RNG.randrange(BN254_FQ) for _ in range(B)]
    vals_b = [RNG.randrange(BN254_FQ) for _ in range(B)]
    bctx = _build_batch(B, vals_a, vals_b)
    sctx = _build_scalar(vals_a, vals_b)

    assert bctx.offsets() == sctx.offsets()
    for name in ("base", "range"):
        bt = getattr(bctx.records, name)
        st = getattr(sctx.records, name)
        assert bt.height == st.height, name
        h = bt.height + 1
        np.testing.assert_array_equal(bt.adv_set[:h], st.adv_set[:h], err_msg=name)
        np.testing.assert_array_equal(bt.adv_vals[:h], st.adv_vals[:h], err_msg=name)
        np.testing.assert_array_equal(bt.fix_set[:h], st.fix_set[:h], err_msg=name)
        np.testing.assert_array_equal(bt.fix_vals[:h], st.fix_vals[:h], err_msg=name)

    # permutation sets are equivalent (batch uses blocks, scalar uses pairs)
    def pairs(ctx):
        s = set()
        for a, b in ctx.records.permutations:
            s.add(((a.region, a.col, a.row), (b.region, b.col, b.row)))
        for (ra, ca, rows_a), (rb, cb, rows_b) in ctx.records.permutation_blocks:
            for x, y in zip(rows_a, rows_b):
                s.add(((ra, ca, int(x)), (rb, cb, int(y))))
        return s

    assert pairs(bctx) == pairs(sctx)


def test_batch_bad_value_fails():
    B = 2
    vals_a = [123456789, 55]
    vals_b = [987654321, 77]
    ctx = _build_batch(B, vals_a, vals_b)
    assert verify_context(ctx) == []
    # corrupt a base-region advice cell
    row = ctx.records.base.height - 1
    ctx.records.base.write_adv(row, 0, 42)
    assert verify_context(ctx) != []
