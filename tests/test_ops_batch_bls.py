"""Batched contexts over bls12-381 (4-limb base field over bn254 Fr)."""

import random

import pytest

from halo2ecc_s_tpu.batch.ops_batch import BatchedPairingOps
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.utils.curves import G1, G2
from halo2ecc_s_tpu.utils.fields import bls12_381
from halo2ecc_s_tpu.utils.host_ops import HostPairingCtx
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

pytestmark = pytest.mark.slow

RNG = random.Random(0xB15)
CURVE = bls12_381()


def test_batched_bls_fq2_and_doubling_step():
    B = 2
    host = HostPairingCtx(CURVE)
    g1h, g2h = G1(CURVE), G2(CURVE)
    g1_pts = [g1h.random(RNG) for _ in range(B)]
    g2_pts = [g2h.random(RNG) for _ in range(B)]

    ctx = Context()
    bops = BatchedPairingOps(ctx, CURVE, B)
    assert bops.info.limbs == 4

    p = bops.assign_g1([q[0] for q in g1_pts], [q[1] for q in g1_pts])
    q = bops.assign_g2(g2_pts)

    # tower sanity
    prod = bops.fq2_mul((p.x, p.y), q.x)
    lb = bops.info.limb_bits
    for lane in range(B):
        av = (g1_pts[lane][0], g1_pts[lane][1])
        assert tuple(x.value(lane, lb) % CURVE.p for x in prod) == host.fq2_mul(
            av, g2_pts[lane][0]
        )

    # one pairing doubling step (the bls miller-loop workhorse)
    r = bops.g2affine_to_g2(q)
    coeffs = bops.doubling_step(r)
    from halo2ecc_s_tpu.core.assign import AssignedG2Affine

    for lane in range(B):
        hq = AssignedG2Affine(g2_pts[lane][0], g2_pts[lane][1], 0)
        hr = host.g2affine_to_g2(hq)
        hc = host.doubling_step(hr)
        for hcc, ccc in zip(hc, coeffs):
            got = tuple(x.value(lane, lb) % CURVE.p for x in ccc)
            assert got == hcc

    run_circuit(ctx, 22)
