"""ECC chip + MSM tests (reference tests/native_scalar_ecc_chip.rs,
tests/general_scalar_ecc_chip.rs)."""

import random

import pytest

from halo2ecc_s_tpu.ops.ecc_ops import (
    GeneralScalarEccContext,
    NativeScalarEccContext,
    UnsafeError,
)
from halo2ecc_s_tpu.utils.curves import G1
from halo2ecc_s_tpu.utils.fields import bls12_381, bn254
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

CURVE = bn254()
G = G1(CURVE)


def make_ctx(with_select=True, seed=0):
    return NativeScalarEccContext(
        CURVE, with_select_chip=with_select, rng=random.Random(seed)
    )


def test_point_assign_and_add():
    rng = random.Random(1)
    ecc = make_ctx()
    pa = G.random(rng)
    pb = G.random(rng)
    a = ecc.assign_point(pa)
    b = ecc.assign_point(pb)
    awc = ecc.to_point_with_curvature(ecc.ecc_reduce(a))
    s = ecc.ecc_add(awc, b)
    expect = ecc.assign_point(G.add(pa, pb))
    ecc.ecc_assert_equal(s, expect)

    # doubling through the complete formula (a + a hits the curvature path)
    awc2 = ecc.to_point_with_curvature(ecc.ecc_reduce(a))
    d = ecc.ecc_add(awc2, ecc.ecc_reduce(a))
    expect_d = ecc.assign_point(G.double(pa))
    ecc.ecc_assert_equal(d, expect_d)

    dd = ecc.ecc_double(awc2)
    ecc.ecc_assert_equal(dd, expect_d)
    run_circuit(ecc.ctx, 20)


def test_identity_handling():
    rng = random.Random(2)
    ecc = make_ctx()
    pa = G.random(rng)
    a = ecc.assign_point(pa)
    ident = ecc.assign_point(None)
    assert ident.z.val == 1

    # a + 0 = a
    awc = ecc.to_point_with_curvature(ecc.ecc_reduce(a))
    s = ecc.ecc_add(awc, ident)
    ecc.ecc_assert_equal(s, a)

    # 0 + a = a
    iwc = ecc.ecc_reduce_with_curvature(ident)
    s2 = ecc.ecc_add(iwc, a)
    ecc.ecc_assert_equal(s2, a)

    # a + (-a) = 0
    na = ecc.ecc_neg(a)
    s3 = ecc.ecc_add(awc, na)
    ecc.ecc_assert_equal(s3, ecc.assign_point(None))
    run_circuit(ecc.ctx, 20)


def test_ecc_add_unsafe_and_error():
    rng = random.Random(3)
    ecc = make_ctx()
    pa, pb = G.random(rng), G.random(rng)
    a = ecc.assign_non_zero_point(pa)
    b = ecc.assign_non_zero_point(pb)
    s = ecc.ecc_add_unsafe(a, b)
    expect = ecc.assign_non_zero_point(G.add(pa, pb))
    ecc.ecc_assert_equal_non_zero(s, expect)
    d = ecc.ecc_double_unsafe(a)
    ecc.ecc_assert_equal_non_zero(d, ecc.assign_non_zero_point(G.double(pa)))
    run_circuit(ecc.ctx, 20)

    # adding a point to itself must raise (and poison the trace)
    ecc2 = make_ctx()
    a2 = ecc2.assign_non_zero_point(pa)
    with pytest.raises(UnsafeError):
        ecc2.ecc_add_unsafe(a2, a2)


def _run_msm(n_points, with_select, k, seed=0):
    rng = random.Random(seed)
    points = [G.random(rng) for _ in range(n_points)]
    scalars = [rng.randrange(CURVE.r) for _ in range(n_points)]
    # make one identity point and one zero scalar to exercise normalisation
    if n_points >= 3:
        points[1] = None
        scalars[2] = 0
    expect = G.msm([p for p in points], scalars)

    for attempt in range(10):
        ecc = make_ctx(with_select=with_select, seed=seed + 100 + attempt)
        try:
            ap = [ecc.assign_point(p) for p in points]
            asc = [ecc.assign_scalar(s) for s in scalars]
            res = ecc.msm_unsafe(ap, asc)
            expect_p = ecc.assign_point(expect)
            ecc.ecc_assert_equal(res, expect_p)
            run_circuit(ecc.ctx, k)
            return ecc
        except UnsafeError:
            continue
    raise AssertionError("MSM retries exhausted")


def test_msm_with_select_chip():
    ecc = _run_msm(6, True, 20)
    assert ecc.ctx.select_offset > 0


def test_msm_without_select_chip():
    ecc = _run_msm(5, False, 20)
    assert ecc.ctx.select_offset == 0


@pytest.mark.slow
def test_msm_with_select_chip_100():
    _run_msm(100, True, 23)


def test_ecc_mul():
    rng = random.Random(9)
    p = G.random(rng)
    s = rng.randrange(CURVE.r)
    expect = G.mul(p, s)
    for attempt in range(10):
        ecc = make_ctx(seed=42 + attempt)
        try:
            ap = ecc.assign_point(p)
            asc = ecc.assign_scalar(s)
            res = ecc.ecc_mul(ap, asc)
            ecc.ecc_assert_equal(res, ecc.assign_point(expect))
            run_circuit(ecc.ctx, 20)
            return
        except UnsafeError:
            continue
    raise AssertionError("retries exhausted")


def test_general_scalar_msm_bls12_381():
    """bls12-381 points/scalars witnessed over bn254 Fr
    (reference tests/general_scalar_ecc_chip.rs, reduced size)."""
    bls = bls12_381()
    g1 = G1(bls)
    rng = random.Random(11)
    n = 3
    points = [g1.random(rng) for _ in range(n)]
    scalars = [rng.randrange(bls.r) for _ in range(n)]
    expect = g1.msm(points, scalars)

    for attempt in range(10):
        ecc = GeneralScalarEccContext(bls, rng=random.Random(50 + attempt))
        try:
            ap = [ecc.assign_point(p) for p in points]
            asc = [ecc.assign_scalar(s) for s in scalars]
            res = ecc.msm_unsafe(ap, asc)
            ecc.ecc_assert_equal(res, ecc.assign_point(expect))
            run_circuit(ecc.ctx, 22)
            return
        except UnsafeError:
            continue
    raise AssertionError("retries exhausted")


def test_ecc_encode():
    rng = random.Random(13)
    ecc = make_ctx()
    p = G.random(rng)
    ap = ecc.assign_point(p)
    enc = ecc.ecc_encode(ap)
    info = ecc.base_ictx.info
    shift = 1 << info.limb_bits
    x, y = p
    assert enc[0].val == ((x & (shift - 1)) + ((x >> info.limb_bits) & (shift - 1)) * shift) % ecc.ctx.n
    run_circuit(ecc.ctx, 20)


def test_curvature_point_cache_select_lookup():
    """assign_cache_point / assign_selected_point (ecc_chip.rs:779-812):
    cache K curvature-carrying points in the select chip, select one by an
    in-circuit index, and check (a) the selected point round-trips, (b) the
    lookup verifies, (c) tampering a selected cell breaks verification."""
    from halo2ecc_s_tpu.verify.mock_prover import verify_context

    rng = random.Random(77)
    ecc = make_ctx(seed=31)
    K = 4
    cached = []
    for k in range(K):
        p = ecc.assign_point(G.random(rng))
        pwc = ecc.ecc_reduce_with_curvature(p)
        ecc.assign_cache_point(pwc, g=7, sc=k)
        cached.append(pwc)
    idx = 2
    sel = ecc.ctx.assign(idx)
    got = ecc.assign_selected_point(cached[idx], sel, g=7)
    # selected values equal the cached point's values
    ic = ecc.base_ictx
    assert ic.get_w_bn(got.x) == ic.get_w_bn(cached[idx].x)
    assert ic.get_w_bn(got.y) == ic.get_w_bn(cached[idx].y)
    assert got.z.value.val == cached[idx].z.value.val
    assert ic.get_w_bn(got.curvature.v) == ic.get_w_bn(cached[idx].curvature.v)
    assert verify_context(ecc.ctx) == []

    # tamper: bump a selected (is_lookup=1) select-chip value
    rec = ecc.ctx.records
    for r in range(rec.select.height):
        if rec.select.fix_vals[r, 1, 0] == 1:
            rec.select.write_adv(r, 0, (rec.select.adv_int(r, 0) + 1) % ecc.ctx.n)
            break
    assert verify_context(ecc.ctx) != []
