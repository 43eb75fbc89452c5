"""Field/curve parameter and host-oracle sanity tests."""

import random

import pytest

from halo2ecc_s_tpu.utils import fields
from halo2ecc_s_tpu.utils.curves import G1, G2
from halo2ecc_s_tpu.utils.fields import bls12_381, bn254
from halo2ecc_s_tpu.utils.host_ops import HostPairingCtx

RNG = random.Random(0xECC)


def test_bn254_params():
    c = bn254()
    # p and r are the degree-4 BN polynomials in x
    x = fields.BN_X
    assert c.p == 36 * x**4 + 36 * x**3 + 24 * x**2 + 6 * x + 1
    assert c.r == 36 * x**4 + 36 * x**3 + 18 * x**2 + 6 * x + 1
    assert c.fq_bits == 254 and c.fr_bits == 254


def test_six_u_plus_2_naf_checksum():
    digits = fields.six_u_plus_2_naf()
    assert sum(d << i for i, d in enumerate(digits)) == 6 * fields.BN_X + 2
    assert len(digits) == 65


@pytest.mark.parametrize("curve", [bn254(), bls12_381()])
def test_generators_on_curve(curve):
    g1 = G1(curve)
    g2 = G2(curve)
    assert g1.is_on_curve(g1.generator)
    assert g2.is_on_curve(g2.generator)
    # generators have order r
    assert g1.mul(g1.generator, curve.r) is None
    assert g2.mul(g2.generator, curve.r) is None


@pytest.mark.parametrize("curve", [bn254(), bls12_381()])
def test_group_law(curve):
    g1 = G1(curve)
    a, b = RNG.randrange(1, curve.r), RNG.randrange(1, curve.r)
    pa = g1.mul(g1.generator, a)
    pb = g1.mul(g1.generator, b)
    assert g1.add(pa, pb) == g1.mul(g1.generator, (a + b) % curve.r)
    assert g1.add(pa, g1.neg(pa)) is None
    assert g1.msm([pa, pb], [3, 5]) == g1.mul(g1.generator, (3 * a + 5 * b) % curve.r)


def test_frobenius_constants_consistent():
    for curve in (bn254(), bls12_381()):
        # xi^((p-1)/3) cubed equals xi^(p-1); sanity on derived tables
        c = curve.frob_fq6_c1[1]
        c3 = fields.fq2_pow_host(c, 3, curve.p)
        expect = fields.fq2_pow_host(curve.xi, curve.p - 1, curve.p)
        assert c3 == expect
        assert curve.frob_fq6_c1[0] == (1, 0)
        assert curve.frob_fq12_c1[0] == (1, 0)


@pytest.mark.parametrize("curve", [bn254(), bls12_381()])
def test_host_pairing_bilinearity(curve):
    ctx = HostPairingCtx(curve)
    g1 = G1(curve)
    g2 = G2(curve)

    a = RNG.randrange(1, curve.r)
    b = RNG.randrange(1, curve.r)

    P = g1.generator
    Q = g2.generator
    e_pq = ctx.pairing_points(P, Q)
    # non-degenerate
    assert e_pq != ctx.fq12_assign_one()

    e_ab = ctx.pairing_points(g1.mul(P, a), g2.mul(Q, b))
    assert e_ab == ctx.fq12_pow(e_pq, (a * b) % curve.r)


@pytest.mark.parametrize("curve", [bn254(), bls12_381()])
def test_host_pairing_product_check(curve):
    ctx = HostPairingCtx(curve)
    g1 = G1(curve)
    g2 = G2(curve)
    a = RNG.randrange(1, curve.r)
    P = g1.mul(g1.generator, a)
    Q = g2.mul(g2.generator, RNG.randrange(1, curve.r))
    # e(P, Q) * e(-P, Q) == 1
    assert ctx.check_pairing_points([(P, Q), (g1.neg(P), Q)])
    # and a wrong statement fails
    assert not ctx.check_pairing_points([(P, Q), (P, Q)])
