"""Tower (Fq2/6/12) circuit ops and pairing circuits.

Because host oracle and circuit share the algorithm core (core/tower.py,
core/pairing_core.py), these tests compare circuit-computed values against
the int-backed host context, then verify all emitted constraints.
Reference: tests/native_scalar_pairing_chip.rs, tests/general_scalar_pairing_chip.rs.
"""

import random

import pytest

from halo2ecc_s_tpu.core.assign import AssignedG2, AssignedG2Affine
from halo2ecc_s_tpu.ops.ecc_ops import GeneralScalarEccContext, NativeScalarEccContext
from halo2ecc_s_tpu.utils.curves import G1, G2
from halo2ecc_s_tpu.utils.fields import bls12_381, bn254
from halo2ecc_s_tpu.utils.host_ops import HostG1Affine, HostPairingCtx
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

RNG = random.Random(0xF12)


def rand_fq2(p):
    return (RNG.randrange(p), RNG.randrange(p))


def rand_fq6(p):
    return tuple(rand_fq2(p) for _ in range(3))


def rand_fq12(p):
    return (rand_fq6(p), rand_fq6(p))


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_381"])
def test_fq2_circuit_ops_match_host(curve_name):
    curve = bn254() if curve_name == "bn254" else bls12_381()
    host = HostPairingCtx(curve)
    if curve_name == "bn254":
        ecc = NativeScalarEccContext(curve)
    else:
        ecc = GeneralScalarEccContext(curve)

    a, b = rand_fq2(curve.p), rand_fq2(curve.p)
    aa, ab = ecc.assign_fq2(a), ecc.assign_fq2(b)

    for op in ("fq2_add", "fq2_sub", "fq2_mul", "fq2_double", "fq2_square",
               "fq2_neg", "fq2_conjugate", "fq2_mul_by_nonresidue",
               "fq2_unsafe_invert"):
        hv = getattr(host, op)(a) if op in (
            "fq2_double", "fq2_square", "fq2_neg", "fq2_conjugate",
            "fq2_mul_by_nonresidue", "fq2_unsafe_invert",
        ) else getattr(host, op)(a, b)
        cv = getattr(ecc, op)(aa) if op in (
            "fq2_double", "fq2_square", "fq2_neg", "fq2_conjugate",
            "fq2_mul_by_nonresidue", "fq2_unsafe_invert",
        ) else getattr(ecc, op)(aa, ab)
        assert ecc.get_fq2(cv) == hv, op

    for power in (1, 2):
        hv = host.fq2_frobenius_map(a, power)
        cv = ecc.fq2_frobenius_map(aa, power)
        assert ecc.get_fq2(cv) == hv, f"frobenius {power}"

    run_circuit(ecc.ctx, 20)


@pytest.mark.parametrize("curve_name", ["bn254", "bls12_381"])
def test_fq6_fq12_circuit_ops_match_host(curve_name):
    curve = bn254() if curve_name == "bn254" else bls12_381()
    host = HostPairingCtx(curve)
    ecc = NativeScalarEccContext(curve) if curve_name == "bn254" else GeneralScalarEccContext(curve)

    a6, b6 = rand_fq6(curve.p), rand_fq6(curve.p)
    aa6, ab6 = ecc.assign_fq6(a6), ecc.assign_fq6(b6)
    assert ecc.get_fq6(ecc.fq6_mul(aa6, ab6)) == host.fq6_mul(a6, b6)
    assert ecc.get_fq6(ecc.fq6_unsafe_invert(aa6)) == host.fq6_unsafe_invert(a6)

    a12, b12 = rand_fq12(curve.p), rand_fq12(curve.p)
    aa12, ab12 = ecc.assign_fq12(a12), ecc.assign_fq12(b12)
    assert ecc.get_fq12(ecc.fq12_mul(aa12, ab12)) == host.fq12_mul(a12, b12)
    assert ecc.get_fq12(ecc.fq12_square(aa12)) == host.fq12_square(a12)
    assert ecc.get_fq12(ecc.fq12_cyclotomic_square(aa12)) == host.fq12_cyclotomic_square(a12)
    assert ecc.get_fq12(ecc.fq12_unsafe_invert(aa12)) == host.fq12_unsafe_invert(a12)
    assert ecc.get_fq12(ecc.fq12_frobenius_map(aa12, 1)) == host.fq12_frobenius_map(a12, 1)

    run_circuit(ecc.ctx, 21)


def test_line_steps_match_host():
    """doubling_step/addition_step produce host-identical coeffs and state."""
    curve = bn254()
    host = HostPairingCtx(curve)
    ecc = NativeScalarEccContext(curve)
    g2 = G2(curve)
    q = g2.random(RNG)

    hq = AssignedG2Affine(q[0], q[1], 0)
    hr = host.g2affine_to_g2(hq)
    cq = ecc.assign_g2(q)
    cr = ecc.g2affine_to_g2(cq)

    h_coeffs = host.doubling_step(hr)
    c_coeffs = ecc.doubling_step(cr)
    for hc, cc in zip(h_coeffs, c_coeffs):
        assert ecc.get_fq2(cc) == hc
    assert ecc.get_fq2(cr.x) == tuple(v % curve.p for v in hr.x)

    h_coeffs = host.addition_step(hr, hq)
    c_coeffs = ecc.addition_step(cr, cq)
    for hc, cc in zip(h_coeffs, c_coeffs):
        assert ecc.get_fq2(cc) == hc
    assert ecc.get_fq2(cr.y) == tuple(v % curve.p for v in hr.y)

    run_circuit(ecc.ctx, 20)


@pytest.mark.slow
def test_bn254_pairing_vs_host_constant():
    """e(a, b) equals the host-computed pairing assigned as a constant
    (reference tests/native_scalar_pairing_chip.rs:20-66)."""
    curve = bn254()
    g1, g2 = G1(curve), G2(curve)
    host = HostPairingCtx(curve)

    a = g1.random(RNG)
    b = g2.random(RNG)
    ab = host.pairing_points(a, b)

    ecc = NativeScalarEccContext(curve)
    cb = ecc.assign_constant_g2(b)
    ab0 = ecc.fq12_assign_constant(ab)
    ca = ecc.assign_point(a)
    ab1 = ecc.pairing([(ca, cb)])
    ecc.fq12_assert_eq(ab0, ab1)
    run_circuit(ecc.ctx, 22)


@pytest.mark.slow
def test_bn254_check_pairing():
    """e(a,b) * e(-a,b) == 1 (reference tests/native_scalar_pairing_chip.rs:68-103)."""
    curve = bn254()
    g1, g2 = G1(curve), G2(curve)
    a = g1.random(RNG)
    b = g2.random(RNG)

    ecc = NativeScalarEccContext(curve)
    cb = ecc.assign_constant_g2(b)
    neg_a = ecc.assign_point(g1.neg(a))
    ca = ecc.assign_point(a)
    ecc.check_pairing([(ca, cb), (neg_a, cb)])
    run_circuit(ecc.ctx, 22)


@pytest.mark.slow
def test_bls12_381_check_pairing_over_bn254_fr():
    """bls12-381 bilinearity check over bn254 Fr
    (reference tests/general_scalar_pairing_chip.rs)."""
    curve = bls12_381()
    g1, g2 = G1(curve), G2(curve)
    a = g1.random(RNG)
    b = g2.random(RNG)
    c = RNG.randrange(1, curve.r)

    # e(c*a, b) * e(-a, c*b) == 1
    ecc = GeneralScalarEccContext(curve)
    ca = ecc.assign_point(g1.mul(a, c))
    cb = ecc.assign_constant_g2(b)
    na = ecc.assign_point(g1.neg(a))
    cbc = ecc.assign_constant_g2(g2.mul(b, c))
    ecc.check_pairing([(ca, cb), (na, cbc)])
    run_circuit(ecc.ctx, 22)


def test_miller_loop_prefix_consistency():
    """First ell applications match host (cheap e2e sanity for default runs)."""
    curve = bn254()
    host = HostPairingCtx(curve)
    ecc = NativeScalarEccContext(curve)
    g1, g2 = G1(curve), G2(curve)
    a = g1.random(RNG)
    b = g2.random(RNG)

    # first miller iteration (i = 64): ell(doubling), then digit naf[63]=1
    # so ell(addition) — no squaring on the first iteration
    hq = AssignedG2Affine(b[0], b[1], 0)
    hprep = host.prepare_g2(hq)
    hp = HostG1Affine.from_point(a)
    f_h = host.fq12_assign_one()
    f_h = host._ell_bn(f_h, hprep.coeffs[0], hp)
    f_h = host._ell_bn(f_h, hprep.coeffs[1], hp)

    cq = ecc.assign_constant_g2(b)
    r = ecc.g2affine_to_g2(cq)
    coeff0 = ecc.doubling_step(r)
    coeff1 = ecc.addition_step(r, cq)
    cp = ecc.assign_point(a)
    f_c = ecc.fq12_assign_one()
    f_c = ecc._ell_bn(f_c, coeff0, cp)
    f_c = ecc._ell_bn(f_c, coeff1, cp)
    assert ecc.get_fq12(f_c) == f_h

    run_circuit(ecc.ctx, 20)
