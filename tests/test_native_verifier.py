"""Native (C++) verifier backend: agreement with the numpy reference path."""

import random

import pytest

from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.fields import BN254_FQ, BN254_FR
from halo2ecc_s_tpu.verify import native
from halo2ecc_s_tpu.verify.mock_prover import verify_context

RNG = random.Random(0xC44)

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native toolchain unavailable"
)


def _circuit():
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    for _ in range(5):
        a = ictx.assign_w(RNG.randrange(BN254_FQ))
        b = ictx.assign_w(RNG.randrange(BN254_FQ))
        ictx.int_mul(a, b)
    c = ictx.assign_w(123)
    d, q = ictx.int_div(ictx.assign_w(456), c)
    ctx.assert_false(d)
    return ctx


def test_native_matches_python_on_valid():
    ctx = _circuit()
    assert verify_context(ctx, use_native=False) == []
    assert verify_context(ctx, use_native=True) == []


@pytest.mark.parametrize("corruption", ["base", "range_tag", "range_acc", "perm"])
def test_native_matches_python_on_corruption(corruption):
    ctx = _circuit()
    rec = ctx.records
    if corruption == "base":
        rec.base.write_adv(3, 0, (rec.base.adv_int(3, 0) + 1) % ctx.n)
    elif corruption == "range_tag":
        # oversized chunk in the tagged column
        rec.range.write_adv(2, 1, 1 << 30)
    elif corruption == "range_acc":
        rec.range.write_adv(0, 0, (rec.range.adv_int(0, 0) + 1) % ctx.n)
    elif corruption == "perm":
        # find a permutation pair and corrupt one side only if it doesn't
        # break a gate first (copy cells are also gate cells; either error
        # is acceptable — both backends must report *something*)
        a, _ = rec.permutations[0]
        t = rec.region(a.region)
        t.write_adv(a.row, a.col, (t.adv_int(a.row, a.col) + 1) % ctx.n)
    assert verify_context(ctx, use_native=False) != []
    assert verify_context(ctx, use_native=True) != []


def test_native_select_lookup():
    from halo2ecc_s_tpu.models.msm import build_msm_circuit, random_msm_instance

    points, scalars, expect = random_msm_instance(3, seed=5)
    ecc, _ = build_msm_circuit(points, scalars, expected=expect, seed=9)
    ctx = ecc.ctx
    assert verify_context(ctx, use_native=True) == []
    assert verify_context(ctx, use_native=False) == []
    # corrupt a selected (is_lookup=1) value
    rec = ctx.records
    for r in range(rec.select.height):
        if rec.select.fix_vals[r, 1, 0] == 1:
            rec.select.write_adv(r, 0, (rec.select.adv_int(r, 0) + 1) % ctx.n)
            break
    assert verify_context(ctx, use_native=True) != []
    assert verify_context(ctx, use_native=False) != []
