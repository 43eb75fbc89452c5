"""Op-granular batched contexts: tower ops and pairing steps batched over
lanes via per-op cached templates."""

import random

import pytest

from halo2ecc_s_tpu.batch.assigned_io import BInt
from halo2ecc_s_tpu.batch.ops_batch import BatchedPairingOps
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.utils.curves import G1, G2
from halo2ecc_s_tpu.utils.fields import bn254
from halo2ecc_s_tpu.utils.host_ops import HostPairingCtx
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

RNG = random.Random(0x0B5)
CURVE = bn254()


def test_batched_fq2_mul_matches_host():
    B = 3
    host = HostPairingCtx(CURVE)
    g1 = G1(CURVE)

    ctx = Context()
    bops = BatchedPairingOps(ctx, CURVE, B)
    # use on-curve points' coordinates as arbitrary field elements
    pts_a = [g1.random(RNG) for _ in range(B)]
    pts_b = [g1.random(RNG) for _ in range(B)]
    pa = bops.assign_g1([p[0] for p in pts_a], [p[1] for p in pts_a])
    pb = bops.assign_g1([p[0] for p in pts_b], [p[1] for p in pts_b])

    a2 = (pa.x, pa.y)
    b2 = (pb.x, pb.y)
    prod = bops.fq2_mul(a2, b2)
    s = bops.fq2_add(a2, b2)
    sq = bops.fq2_square(s)
    inv = bops.fq2_unsafe_invert(a2)

    lb = bops.info.limb_bits
    for lane in range(B):
        av = (pts_a[lane][0], pts_a[lane][1])
        bv = (pts_b[lane][0], pts_b[lane][1])
        assert tuple(x.value(lane, lb) % CURVE.p for x in prod) == host.fq2_mul(av, bv)
        assert tuple(x.value(lane, lb) % CURVE.p for x in sq) == host.fq2_square(
            host.fq2_add(av, bv)
        )
        assert tuple(x.value(lane, lb) % CURVE.p for x in inv) == host.fq2_unsafe_invert(av)

    run_circuit(ctx, 21)


@pytest.mark.skipif(
    "HALO2ECC_TPU_RUN_XSLOW" not in __import__("os").environ,
    reason="full batched pairing: ~30+ min; HALO2ECC_TPU_RUN_XSLOW=1 to run",
)
def test_batched_check_pairing_full():
    """B independent pairing checks e(a,b)·e(-a,b)==1 through the batched
    context — the proof-aggregation workload, end to end."""
    B = 2
    g1h, g2h = G1(CURVE), G2(CURVE)
    g1_pts = [g1h.random(RNG) for _ in range(B)]
    g2_pts = [g2h.random(RNG) for _ in range(B)]
    neg_pts = [g1h.neg(p) for p in g1_pts]

    ctx = Context()
    bops = BatchedPairingOps(ctx, CURVE, B)
    p = bops.assign_g1([q[0] for q in g1_pts], [q[1] for q in g1_pts])
    pn = bops.assign_g1([q[0] for q in neg_pts], [q[1] for q in neg_pts])
    q = bops.assign_g2(g2_pts)
    bops.check_pairing([(p, q), (pn, q)])
    # row-overhead accounting: the batched context reduces eagerly (no lazy
    # `times` chains), costing extra reduce rows per op vs the scalar path's
    # k=22 circuit; record rows/lane and check a batched pairing still fits
    # the reference's table capacity (2^23, context.rs:36)
    rows = ctx.offsets()
    total = sum(rows)
    print(f"batched pairing: B={B} rows={rows} total={total} "
          f"({total / B:.0f} rows/lane incl. shared constants)")
    assert max(rows) < (1 << 23)
    run_circuit(ctx, 23)


@pytest.mark.slow
def test_batched_doubling_step_and_ell_matches_host():
    """Batched pairing-step chain: g2 assignment, doubling_step, ell — the
    building blocks of a batched multi-pairing check."""
    B = 2
    host = HostPairingCtx(CURVE)
    g1h, g2h = G1(CURVE), G2(CURVE)

    g1_pts = [g1h.random(RNG) for _ in range(B)]
    g2_pts = [g2h.random(RNG) for _ in range(B)]

    ctx = Context()
    bops = BatchedPairingOps(ctx, CURVE, B)
    p = bops.assign_g1([p[0] for p in g1_pts], [p[1] for p in g1_pts])
    q = bops.assign_g2(g2_pts)

    r = bops.g2affine_to_g2(q)
    coeffs0 = bops.doubling_step(r)
    f = bops.fq12_assign_one()
    f = bops._ell_bn(f, coeffs0, p)
    coeffs1 = bops.addition_step(r, q)
    f = bops._ell_bn(f, coeffs1, p)

    for lane in range(B):
        from halo2ecc_s_tpu.core.assign import AssignedG2Affine
        from halo2ecc_s_tpu.utils.host_ops import HostG1Affine

        hq = AssignedG2Affine(g2_pts[lane][0], g2_pts[lane][1], 0)
        hr = host.g2affine_to_g2(hq)
        hc0 = host.doubling_step(hr)
        hp = HostG1Affine.from_point(g1_pts[lane])
        hf = host.fq12_assign_one()
        hf = host._ell_bn(hf, hc0, hp)
        hc1 = host.addition_step(hr, hq)
        hf = host._ell_bn(hf, hc1, hp)

        assert bops.fq12_values(f, lane) == hf

    run_circuit(ctx, 22)


def test_batched_ops_device_mode_bit_exact():
    """device=True (deferred slabs, async-pipelined dispatches, one drain)
    must produce Records bit-exact with the eager host path — the serving
    shape for TPU pairing aggregation (scripts/pairing_tpu_bench.py)."""
    import numpy as np

    B = 2
    g1 = G1(CURVE)
    pts_a = [g1.random(RNG) for _ in range(B)]
    pts_b = [g1.random(RNG) for _ in range(B)]

    def build(device):
        ctx = Context()
        bops = BatchedPairingOps(ctx, CURVE, B, device=device)
        pa = bops.assign_g1([p[0] for p in pts_a], [p[1] for p in pts_a])
        pb = bops.assign_g1([p[0] for p in pts_b], [p[1] for p in pts_b])
        a2, b2 = (pa.x, pa.y), (pb.x, pb.y)
        prod = bops.fq2_mul(a2, b2)
        sq = bops.fq2_square(bops.fq2_add(a2, b2))
        inv = bops.fq2_unsafe_invert(a2)
        bops.drain()
        return ctx

    ctx_h = build(False)
    ctx_d = build(True)
    for th, td in (
        (ctx_h.records.base, ctx_d.records.base),
        (ctx_h.records.range, ctx_d.records.range),
        (ctx_h.records.select, ctx_d.records.select),
    ):
        assert th.height == td.height
        h = th.height
        np.testing.assert_array_equal(th.adv_vals[:h], td.adv_vals[:h])
        np.testing.assert_array_equal(th.adv_set[:h], td.adv_set[:h])
        np.testing.assert_array_equal(th.fix_vals[:h], td.fix_vals[:h])
    run_circuit(ctx_d, 21)
