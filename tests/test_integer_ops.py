"""Integer chip tests (reference tests/integer_chip.rs and tests/range_chip.rs)."""

import random

import pytest

from halo2ecc_s_tpu.core.context import COMMON_RANGE_BITS, Context
from halo2ecc_s_tpu.core.range_info import range_info
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext, decompose_bn
from halo2ecc_s_tpu.utils.fields import (
    BLS12_381_FQ,
    BLS12_381_FR,
    BN254_FQ,
    BN254_FR,
    inv_mod,
)
from halo2ecc_s_tpu.verify.mock_prover import run_circuit, run_circuit_expect_fail

RNG = random.Random(7)


def test_range_info_parameters():
    info = range_info(BN254_FQ, BN254_FR)
    assert info.limb_bits == 108
    assert info.limbs == 3
    assert info.d_bits == 267
    assert info.w_ceil_bits == 254
    # pre-check assertions already ran in the constructor for all three
    range_info(BLS12_381_FR, BN254_FR)
    info381 = range_info(BLS12_381_FQ, BN254_FR)
    assert info381.limbs == 4


def test_range_chip_limb_assignment():
    """Reference tests/range_chip.rs:14-46."""
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    a = RNG.randrange(BN254_FQ)
    b = RNG.randrange(BN254_FQ)
    d, r = divmod(a * b, BN254_FQ)

    info = ictx.info
    nlb = (info.limbs - 1) * info.limb_bits
    ictx.assign_nonleading_limb(a & ((1 << info.limbs) - 1))
    ictx.assign_w_ceil_leading_limb(a >> nlb)
    ictx.assign_w_ceil_leading_limb(b >> nlb)
    ictx.assign_w_ceil_leading_limb(r >> nlb)
    ictx.assign_d_leading_limb(d >> nlb)
    run_circuit(ctx, 20)


def test_range_chip_full_sweep():
    """All (bits_cap, bits) in-range combinations verify; out-of-range values
    fail (reference tests/range_chip.rs:49-101)."""
    ctx = Context()
    mask = (1 << COMMON_RANGE_BITS) - 1
    for bits_cap in range(1, COMMON_RANGE_BITS * 6):
        if COMMON_RANGE_BITS < bits_cap < COMMON_RANGE_BITS * 2:
            continue
        for bits in range(0, bits_cap, 7):
            v = 1 << bits
            decompose = (bits_cap + COMMON_RANGE_BITS - 1) // COMMON_RANGE_BITS
            acc, chunks = decompose_bn(v, decompose, mask, ctx.n)
            ctx.assign_range_value(chunks, acc, bits_cap)
    run_circuit(ctx, 20)

    # failure cases: value has more bits than the cap allows
    for bits_cap in (5, COMMON_RANGE_BITS, 40, 72, 80, 108):
        if COMMON_RANGE_BITS < bits_cap < 2 * COMMON_RANGE_BITS:
            continue
        ctx = Context()
        bits = bits_cap  # 1 << bits needs bits_cap+1 bits
        v = 1 << bits
        decompose = (bits + COMMON_RANGE_BITS) // COMMON_RANGE_BITS
        acc, chunks = decompose_bn(v, decompose, mask, ctx.n)
        ctx.assign_range_value(chunks[:6], acc, bits_cap)
        run_circuit_expect_fail(ctx, 20)


def test_integer_chip_basic():
    """add/sub/mul/div + division by zero (reference tests/integer_chip.rs:12-55)."""
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    q = BN254_FQ

    a_v = RNG.randrange(q)
    b_v = RNG.randrange(1, q)
    c_v = (a_v + b_v) % q
    d_v = (a_v - b_v) % q
    e_v = (a_v * b_v) % q
    f_v = (a_v * inv_mod(b_v, q)) % q

    a = ictx.assign_w(a_v)
    b = ictx.assign_w(b_v)

    c1 = ictx.assign_w(c_v)
    c2 = ictx.int_add(a, b)
    ictx.assert_int_equal(c1, c2)

    d1 = ictx.assign_w(d_v)
    d2 = ictx.int_sub(a, b)
    ictx.assert_int_equal(d1, d2)

    e1 = ictx.assign_w(e_v)
    e2 = ictx.int_mul(a, b)
    ictx.assert_int_equal(e1, e2)

    f1 = ictx.assign_w(f_v)
    _, f2 = ictx.int_div(a, b)
    ictx.assert_int_equal(f1, f2)

    zero = ictx.int_sub(a, a)
    g1, _ = ictx.int_div(a, zero)
    ctx.assert_true(g1)

    run_circuit(ctx, 20)


def test_integer_chip_values():
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    q = BN254_FQ
    a_v, b_v = RNG.randrange(q), RNG.randrange(1, q)
    a = ictx.assign_w(a_v)
    b = ictx.assign_w(b_v)
    assert ictx.get_w(ictx.int_mul(a, b)) == (a_v * b_v) % q
    assert ictx.get_w(ictx.int_add(a, b)) == (a_v + b_v) % q  # mod via get_w
    inv = ictx.int_unsafe_invert(b)
    assert ictx.get_w(inv) == inv_mod(b_v, q)
    assert ictx.is_int_equal(a, a).val == 1
    assert ictx.is_int_equal(a, b).val == 0
    # lazy times bookkeeping
    s = ictx.int_add(a, b)
    assert s.times == 2
    s2 = ictx.int_sub(a, b)
    assert s2.times == 3  # a.times + b.times + 1
    run_circuit(ctx, 20)


def test_lazy_reduction_chain():
    """Adding repeatedly must trigger conditionally_reduce and stay sound."""
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    q = BN254_FQ
    vals = [RNG.randrange(q) for _ in range(40)]
    acc = ictx.assign_w(vals[0])
    acc_v = vals[0]
    for v in vals[1:]:
        acc = ictx.int_add(acc, ictx.assign_w(v))
        acc_v = (acc_v + v) % q
        assert acc.times <= 1 << (ictx.info.overflow_bits - 2)
    expect = ictx.assign_w(acc_v)
    ictx.assert_int_equal(acc, expect)
    run_circuit(ctx, 21)


@pytest.mark.parametrize(
    "w_modulus", [BLS12_381_FQ, BLS12_381_FR], ids=["bls_fq", "bls_fr"]
)
def test_nonnative_mul_sweep(w_modulus):
    """Random mults for bls12-381 fields over bn254 Fr
    (reference tests/integer_chip.rs:58-99, reduced count)."""
    ctx = Context()
    ictx = IntegerContext(ctx, w_modulus)
    for _ in range(25):
        a_v = RNG.randrange(w_modulus)
        b_v = RNG.randrange(w_modulus)
        a = ictx.assign_w(a_v)
        b = ictx.assign_w(b_v)
        ab0 = ictx.assign_w((a_v * b_v) % w_modulus)
        ab1 = ictx.int_mul(a, b)
        ictx.assert_int_equal(ab0, ab1)
    run_circuit(ctx, 20)


def test_int_mul_bad_witness_fails():
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    a = ictx.assign_w(1234567)
    b = ictx.assign_w(7654321)
    prod = ictx.int_mul(a, b)
    run_circuit(ctx, 20)
    # corrupt one limb of the product
    c = prod.limbs_le[0].cell
    tbl = ctx.records.region(c.region)
    tbl.write_adv(c.row, c.col, (prod.limbs_le[0].val + 1) % ctx.n)
    run_circuit_expect_fail(ctx, 20)


def test_bisec_and_predicates():
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    a = ictx.assign_w(111)
    b = ictx.assign_w(222)
    t = ctx.assign_bit(1)
    f = ctx.assign_bit(0)
    assert ictx.get_w(ictx.bisec_int(t, a, b)) == 111
    assert ictx.get_w(ictx.bisec_int(f, a, b)) == 222
    zero = ictx.int_sub(a, a)
    assert ictx.is_int_zero(zero).val == 1
    assert ictx.is_int_zero(a).val == 0
    w_as_int = ictx.assign_w(0)
    assert ictx.is_pure_zero(w_as_int).val == 1
    small = ictx.int_mul_small_constant(a, 3)
    assert ictx.get_w(small) == 333
    run_circuit(ctx, 20)
