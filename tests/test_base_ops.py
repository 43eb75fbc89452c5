"""Base chip (universal gate) tests. Mirrors reference tests/base_chip.rs
plus per-op unit checks and negative cases."""

import random

from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.core.records import VAR_COLUMNS, MUL_COLUMNS
from halo2ecc_s_tpu.utils.fields import BN254_FR as FR
from halo2ecc_s_tpu.verify.mock_prover import (
    run_circuit,
    run_circuit_expect_fail,
    verify_context,
)

RNG = random.Random(42)


def rand_fr() -> int:
    return RNG.randrange(FR)


def test_one_line_batch():
    """10k random full-width universal gate rows (ref tests/base_chip.rs:9-46)."""
    vars_ = [rand_fr() for _ in range(VAR_COLUMNS)]
    coeffs = [rand_fr() for _ in range(VAR_COLUMNS)]
    mul_coeffs = [rand_fr() for _ in range(MUL_COLUMNS)]
    next_var = rand_fr()
    next_coeff = rand_fr()

    result = sum(v * c for v, c in zip(vars_, coeffs))
    result += mul_coeffs[0] * vars_[0] * vars_[1]
    result += mul_coeffs[1] * vars_[2] * vars_[3]
    result += next_var * next_coeff
    result %= FR

    ctx = Context()
    for _ in range(2000):
        ctx.one_line(
            list(zip(vars_, coeffs)), -result, mul_coeffs, next_coeff
        )
        ctx.one_line_with_last([], (next_var, 0), None, (), None)
    run_circuit(ctx, 20)


def test_forked_offsets():
    """Disjoint-slab emission through forked cursors (analog of the
    multi-threaded witness test, ref tests/base_chip.rs:48-99)."""
    vars_ = [rand_fr() for _ in range(VAR_COLUMNS)]
    coeffs = [rand_fr() for _ in range(VAR_COLUMNS)]
    result = sum(v * c for v, c in zip(vars_, coeffs)) % FR

    ctx = Context()
    n_forks, per_fork = 10, 100
    forks = [ctx.fork((i * per_fork, 0, 0)) for i in range(n_forks)]
    for f in forks:
        for _ in range(per_fork):
            f.one_line(list(zip(vars_, coeffs)), -result, (), None)
    ctx.apply_offset_diff((n_forks * per_fork, 0, 0))
    assert ctx.base_offset == ctx.records.base.height == n_forks * per_fork
    run_circuit(ctx, 20)


def test_arith_ops():
    ctx = Context()
    a_v, b_v = rand_fr(), rand_fr()
    a = ctx.assign(a_v)
    b = ctx.assign(b_v)

    s = ctx.add(a, b)
    assert s.val == (a_v + b_v) % FR
    d = ctx.sub(a, b)
    assert d.val == (a_v - b_v) % FR
    m = ctx.mul(a, b)
    assert m.val == (a_v * b_v) % FR
    q = ctx.div_unsafe(a, b)
    assert (q.val * b_v) % FR == a_v
    inv = ctx.invert_unsafe(a)
    assert (inv.val * a_v) % FR == 1
    ma = ctx.mul_add(a, b, 3, s, 5)
    assert ma.val == (a_v * b_v * 3 + s.val * 5) % FR
    run_circuit(ctx, 20)


def test_sum_with_constant_chaining():
    """More than 4 terms spills across rows (base_chip.rs:134-153)."""
    ctx = Context()
    vals = [rand_fr() for _ in range(11)]
    assigned = [ctx.assign(v) for v in vals]
    coeffs = [rand_fr() for _ in range(11)]
    c = rand_fr()
    s = ctx.sum_with_constant(list(zip(assigned, coeffs)), c)
    assert s.val == (sum(v * k for v, k in zip(vals, coeffs)) + c) % FR
    run_circuit(ctx, 20)


def test_mul_add_with_next_line():
    ctx = Context()
    ls = []
    expect = 0
    for _ in range(5):
        a, b, c, cc = rand_fr(), rand_fr(), rand_fr(), rand_fr()
        ls.append((ctx.assign(a), ctx.assign(b), ctx.assign(c), cc))
        expect += a * b + c * cc
    out = ctx.mul_add_with_next_line(ls)
    assert out.val == expect % FR
    run_circuit(ctx, 20)


def test_invert_and_is_zero():
    ctx = Context()
    a = ctx.assign(rand_fr())
    z = ctx.assign(0)
    is_z, inv = ctx.invert(a)
    assert is_z.val == 0 and (inv.val * a.val) % FR == 1
    is_z2, inv2 = ctx.invert(z)
    assert is_z2.val == 1 and inv2.val == 0
    assert ctx.is_zero(z).val == 1
    assert ctx.is_zero(a).val == 0
    run_circuit(ctx, 20)


def test_logic_ops():
    ctx = Context()
    bits = {}
    for av in (0, 1):
        for bv in (0, 1):
            a = ctx.assign_bit(av)
            b = ctx.assign_bit(bv)
            assert ctx.and_(a, b).val == av & bv
            assert ctx.or_(a, b).val == av | bv
            assert ctx.xor(a, b).val == av ^ bv
            assert ctx.xnor(a, b).val == 1 - (av ^ bv)
            assert ctx.not_and(a, b).val == (1 - av) & bv
        bits[av] = a
    assert ctx.not_(bits[0]).val == 1
    run_circuit(ctx, 20)


def test_bisec():
    ctx = Context()
    a = ctx.assign(rand_fr())
    b = ctx.assign(rand_fr())
    t = ctx.assign_bit(1)
    f = ctx.assign_bit(0)
    assert ctx.bisec(t, a, b).val == a.val
    assert ctx.bisec(f, a, b).val == b.val
    run_circuit(ctx, 20)


def test_asserts_and_constants():
    ctx = Context()
    c = ctx.assign_constant(12345)
    assert c.val == 12345
    a = ctx.assign(777)
    b = ctx.assign(777)
    ctx.assert_equal(a, b)
    ctx.assert_constant(a, 777)
    bit = ctx.assign_bit(1)
    ctx.assert_true(bit)
    run_circuit(ctx, 20)


def test_bad_witness_fails():
    """Corrupting a witness cell must break verification."""
    ctx = Context()
    a = ctx.assign(5)
    b = ctx.assign(7)
    ctx.mul(a, b)
    run_circuit(ctx, 20)
    # corrupt the product cell
    ctx.records.base.write_adv(2, VAR_COLUMNS - 1, 1234)
    run_circuit_expect_fail(ctx, 20)


def test_bad_permutation_fails():
    ctx = Context()
    a = ctx.assign(5)
    ctx.add(a, a)
    assert verify_context(ctx) == []
    # tamper with the copy of `a` used in the sum row
    ctx.records.base.write_adv(1, 0, 6)
    assert verify_context(ctx) != []


def test_try_assert_false():
    ctx = Context()
    good = ctx.assign_bit(0)
    assert ctx.try_assert_false(good)
    bad = ctx.assign_bit(1)
    assert not ctx.try_assert_false(bad)  # constraint emitted but unsatisfiable
    run_circuit_expect_fail(ctx, 20)
