"""Witness-template compiler tests: trace chip code symbolically, batch-
evaluate on device, compare bit-exactly against the scalar trace path."""

import random

import numpy as np
import pytest

from halo2ecc_s_tpu.batch.template import Template
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.ops.ecc_ops import NativeScalarEccContext
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.curves import G1
from halo2ecc_s_tpu.utils.fields import BN254_FQ, BN254_FR, bn254
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

RNG = random.Random(0x7E17)


def tables_equal(actx, bctx, regions=("base", "range")):
    assert actx.offsets() == bctx.offsets()
    for name in regions:
        at = getattr(actx.records, name)
        bt = getattr(bctx.records, name)
        assert at.height == bt.height, name
        h = at.height + 1
        np.testing.assert_array_equal(at.adv_set[:h], bt.adv_set[:h], err_msg=name)
        np.testing.assert_array_equal(at.adv_vals[:h], bt.adv_vals[:h], err_msg=name)
        np.testing.assert_array_equal(at.fix_set[:h], bt.fix_set[:h], err_msg=name)
        np.testing.assert_array_equal(at.fix_vals[:h], bt.fix_vals[:h], err_msg=name)


def perm_sets_equal(actx, bctx):
    def pairs(ctx):
        s = set()
        for a, b in ctx.records.permutations:
            s.add(((a.region, a.col, a.row), (b.region, b.col, b.row)))
        for (ra, ca, rows_a), (rb, cb, rows_b) in ctx.records.permutation_blocks:
            for x, y in zip(rows_a, rows_b):
                s.add(((ra, ca, int(x)), (rb, cb, int(y))))
        return s

    assert pairs(actx) == pairs(bctx)


def test_template_base_ops():
    """Small template mixing base-chip ops."""

    def build(ctx, ins):
        a = ctx.assign(ins["a"])
        b = ctx.assign(ins["b"])
        s = ctx.add(a, b)
        m = ctx.mul(s, b)
        inv_flag, inv = ctx.invert(m)
        return [s, m, inv]

    sample = {"a": (254, 12345), "b": (254, 67890)}
    tmpl = Template.trace(build, sample)

    B = 8
    vals_a = [RNG.randrange(BN254_FR) for _ in range(B)]
    vals_b = [RNG.randrange(BN254_FR) for _ in range(B)]
    ctx = Context()
    out = tmpl.instantiate(
        ctx,
        {"a": ff.ints_to_limbs(vals_a, 16), "b": ff.ints_to_limbs(vals_b, 16)},
    )
    run_circuit(ctx, 20)

    # scalar comparison
    sctx = Context()
    for av, bv in zip(vals_a, vals_b):
        a = sctx.assign(av)
        b = sctx.assign(bv)
        s = sctx.add(a, b)
        m = sctx.mul(s, b)
        sctx.invert(m)
    tables_equal(ctx, sctx)
    perm_sets_equal(ctx, sctx)

    # outputs carry correct values
    m_vals, (reg, col, rows) = out[1]
    for i, (av, bv) in enumerate(zip(vals_a, vals_b)):
        expect = ((av + bv) * bv) % BN254_FR
        assert ff.limbs_to_int(m_vals[i]) == expect


def test_template_int_mul_matches_scalar():
    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        b = ictx.assign_w(ins["b"])
        return ictx.int_mul(a, b)

    tmpl = Template.trace(
        build, {"a": (254, 1234567 % BN254_FQ), "b": (254, 7654321 % BN254_FQ)}
    )

    B = 6
    vals_a = [RNG.randrange(BN254_FQ) for _ in range(B)]
    vals_b = [RNG.randrange(BN254_FQ) for _ in range(B)]
    vals_a[0] = 0

    ctx = Context()
    out = tmpl.instantiate(
        ctx,
        {"a": ff.ints_to_limbs(vals_a, 16), "b": ff.ints_to_limbs(vals_b, 16)},
    )
    run_circuit(ctx, 20)

    sctx = Context()
    ictx = IntegerContext(sctx, BN254_FQ)
    for av, bv in zip(vals_a, vals_b):
        a = ictx.assign_w(av)
        b = ictx.assign_w(bv)
        ictx.int_mul(a, b)
    tables_equal(ctx, sctx)
    perm_sets_equal(ctx, sctx)

    # the product value round-trips
    rem_limbs = out["limbs"]
    for i, (av, bv) in enumerate(zip(vals_a, vals_b)):
        got = 0
        for j in reversed(range(3)):
            got = (got << 108) + ff.limbs_to_int(rem_limbs[j][0][i])
        assert got == (av * bv) % BN254_FQ


def test_template_int_div():
    """int_div includes reduce, is_int_zero (inverse chains), masked div."""

    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        b = ictx.assign_w(ins["b"])
        cond, c = ictx.int_div(a, b)
        return c

    tmpl = Template.trace(
        build, {"a": (254, 999888777 % BN254_FQ), "b": (254, 31415926 % BN254_FQ)}
    )

    B = 4
    vals_a = [RNG.randrange(BN254_FQ) for _ in range(B)]
    vals_b = [RNG.randrange(1, BN254_FQ) for _ in range(B)]
    ctx = Context()
    tmpl.instantiate(
        ctx,
        {"a": ff.ints_to_limbs(vals_a, 16), "b": ff.ints_to_limbs(vals_b, 16)},
    )
    run_circuit(ctx, 20)

    sctx = Context()
    ictx = IntegerContext(sctx, BN254_FQ)
    for av, bv in zip(vals_a, vals_b):
        a = ictx.assign_w(av)
        b = ictx.assign_w(bv)
        ictx.int_div(a, b)
    tables_equal(ctx, sctx)
    perm_sets_equal(ctx, sctx)


@pytest.fixture(scope="module")
def ecc_add_template():
    curve = bn254()
    g1 = G1(curve)

    def build(ctx, ins):
        ecc = NativeScalarEccContext(curve, ctx=ctx, with_select_chip=False)
        p = ecc.assign_non_zero_point((ins["x1"], ins["y1"]))
        q = ecc.assign_non_zero_point((ins["x2"], ins["y2"]))
        return ecc.ecc_add_unsafe(p, q)

    s1 = g1.random(random.Random(1))
    s2 = g1.random(random.Random(2))
    return Template.trace(
        build,
        {
            "x1": (254, s1[0]),
            "y1": (254, s1[1]),
            "x2": (254, s2[0]),
            "y2": (254, s2[1]),
        },
    )


@pytest.mark.slow
def test_template_ecc_add_unsafe(ecc_add_template):
    curve = bn254()
    g1 = G1(curve)
    tmpl = ecc_add_template

    B = 2
    rng = random.Random(33)
    pts1 = [g1.random(rng) for _ in range(B)]
    pts2 = [g1.random(rng) for _ in range(B)]
    ctx = Context()
    out = tmpl.instantiate(
        ctx,
        {
            "x1": ff.ints_to_limbs([p[0] for p in pts1], 16),
            "y1": ff.ints_to_limbs([p[1] for p in pts1], 16),
            "x2": ff.ints_to_limbs([p[0] for p in pts2], 16),
            "y2": ff.ints_to_limbs([p[1] for p in pts2], 16),
        },
    )
    run_circuit(ctx, 21)

    sctx = Context()
    ecc = NativeScalarEccContext(curve, ctx=sctx, with_select_chip=False)
    for p1, p2 in zip(pts1, pts2):
        a = ecc.assign_non_zero_point(p1)
        b = ecc.assign_non_zero_point(p2)
        ecc.ecc_add_unsafe(a, b)
    tables_equal(ctx, sctx)
    perm_sets_equal(ctx, sctx)

    # the batched sum x-coordinates match the host oracle
    x_limbs = out["x"]["limbs"]
    for i in range(B):
        expect = g1.add(pts1[i], pts2[i])
        got = 0
        for j in reversed(range(3)):
            got = (got << 108) + ff.limbs_to_int(x_limbs[j][0][i])
        assert got % curve.p == expect[0]


@pytest.mark.slow
def test_template_divergence_raises(ecc_add_template):
    """A lane violating a traced try_assert_false must raise UnsafeError."""
    from halo2ecc_s_tpu.ops.ecc_ops import UnsafeError

    curve = bn254()
    g1 = G1(curve)
    tmpl = ecc_add_template

    pts1 = [g1.random(random.Random(5)), g1.random(random.Random(6))]
    pts2 = [pts1[0], g1.random(random.Random(7))]  # lane 0 adds P+P: collision
    ctx = Context()
    with pytest.raises(UnsafeError):
        tmpl.instantiate(
            ctx,
            {
                "x1": ff.ints_to_limbs([p[0] for p in pts1], 16),
                "y1": ff.ints_to_limbs([p[1] for p in pts1], 16),
                "x2": ff.ints_to_limbs([p[0] for p in pts2], 16),
                "y2": ff.ints_to_limbs([p[1] for p in pts2], 16),
            },
        )
