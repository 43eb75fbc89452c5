"""High-level circuit builder wrappers (models/)."""

import random

import pytest

from halo2ecc_s_tpu.models.keccak_hash import build_keccak_circuit
from halo2ecc_s_tpu.models.msm import (
    build_general_msm_circuit,
    build_msm_circuit,
    random_msm_instance,
)
from halo2ecc_s_tpu.models.pairing_check import (
    build_pairing_check_circuit,
    build_pairing_eq_circuit,
)
from halo2ecc_s_tpu.utils.curves import G1, G2
from halo2ecc_s_tpu.utils.fields import BN254_FR, bls12_381, bn254
from halo2ecc_s_tpu.utils.host_ops import HostPairingCtx
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

RNG = random.Random(0x30D)


def test_msm_model_builder():
    points, scalars, expect = random_msm_instance(4, seed=21)
    ecc, res = build_msm_circuit(points, scalars, expected=expect, seed=5)
    run_circuit(ecc.ctx, 21)


def test_keccak_model_builder():
    ctx, out = build_keccak_circuit([RNG.randrange(BN254_FR)])
    run_circuit(ctx, 20)


@pytest.mark.slow
def test_msm_model_builder_no_select():
    points, scalars, expect = random_msm_instance(6, seed=22)
    ecc, res = build_msm_circuit(
        points, scalars, with_select_chip=False, expected=expect, seed=6
    )
    run_circuit(ecc.ctx, 21)
    assert ecc.ctx.select_offset == 0


@pytest.mark.slow
def test_general_msm_model_builder():
    curve = bls12_381()
    g1 = G1(curve)
    rng = random.Random(23)
    points = [g1.random(rng) for _ in range(2)]
    scalars = [rng.randrange(curve.r) for _ in range(2)]
    expect = g1.msm(points, scalars)
    ecc, res = build_general_msm_circuit(points, scalars, curve, expected=expect, seed=7)
    run_circuit(ecc.ctx, 22)


@pytest.mark.slow
def test_pairing_check_model_builder():
    curve = bn254()
    g1, g2 = G1(curve), G2(curve)
    a = g1.random(RNG)
    b = g2.random(RNG)
    ecc = build_pairing_check_circuit([(a, b), (g1.neg(a), b)], curve)
    run_circuit(ecc.ctx, 22)


@pytest.mark.slow
def test_pairing_eq_model_builder():
    curve = bn254()
    g1, g2 = G1(curve), G2(curve)
    a = g1.random(RNG)
    b = g2.random(RNG)
    gt = HostPairingCtx(curve).pairing_points(a, b)
    ecc = build_pairing_eq_circuit(a, b, gt, curve)
    run_circuit(ecc.ctx, 22)
