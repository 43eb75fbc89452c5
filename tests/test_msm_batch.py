"""Batched MSM witness engine: template-driven generation must verify and
match the host oracle."""

import random

import pytest

from halo2ecc_s_tpu.batch.msm_batch import BatchMsm
from halo2ecc_s_tpu.models.msm import random_msm_instance
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

pytestmark = pytest.mark.slow


def test_msm_batch_50_points():
    """Larger batched MSM (10 groups x 254 windows); opt-in via XSLOW."""
    import os

    if "HALO2ECC_TPU_RUN_XSLOW" not in os.environ:
        pytest.skip("set HALO2ECC_TPU_RUN_XSLOW=1")
    points, scalars, expect = random_msm_instance(50, seed=8)
    bm = BatchMsm()
    ecc, res = bm.build(points, scalars, seed=99)
    ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    run_circuit(ecc.ctx, 23)


def test_msm_batch_10_points():
    points, scalars, expect = random_msm_instance(10, seed=3)
    # exercise identity/zero normalisation
    points[1] = None
    scalars[2] = 0
    from halo2ecc_s_tpu.utils.curves import G1
    from halo2ecc_s_tpu.utils.fields import bn254

    expect = G1(bn254()).msm(points, scalars)

    bm = BatchMsm()
    ecc, res = bm.build(points, scalars, seed=77)
    ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    run_circuit(ecc.ctx, 22)
