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


def test_msm_batch_device_bit_exact():
    """The device-resident pipeline (deferred slabs + per-step jits) must
    produce Records bit-exact with the host path for the same seed, and the
    result must verify."""
    import numpy as np

    points, scalars, expect = random_msm_instance(10, seed=5)
    bm = BatchMsm()
    ecc_h, res_h = bm.build(points, scalars, seed=123)
    ecc_d, res_d = bm.build(points, scalars, seed=123, device=True)

    for th, td in (
        (ecc_h.ctx.records.base, ecc_d.ctx.records.base),
        (ecc_h.ctx.records.range, ecc_d.ctx.records.range),
        (ecc_h.ctx.records.select, ecc_d.ctx.records.select),
    ):
        assert th.height == td.height
        h = th.height
        np.testing.assert_array_equal(th.adv_vals[:h], td.adv_vals[:h])
        np.testing.assert_array_equal(th.adv_set[:h], td.adv_set[:h])
        np.testing.assert_array_equal(th.fix_vals[:h], td.fix_vals[:h])
        np.testing.assert_array_equal(th.fix_set[:h], td.fix_set[:h])
    assert res_h.x.native.val == res_d.x.native.val
    assert res_h.y.native.val == res_d.y.native.val

    ecc_d.ecc_assert_equal(res_d, ecc_d.assign_point(expect))
    run_circuit(ecc_d.ctx, 22)


def test_msm_batch_chain_scan_bit_exact():
    """Second device build (all templates cached) runs the phase-5 final-
    accumulation chain as ONE lax.scan dispatch; Records must be bit-exact
    with the first (per-step) build and verify."""
    import numpy as np

    points, scalars, expect = random_msm_instance(10, seed=5)
    bm = BatchMsm()
    ecc_1, res_1 = bm.build(points, scalars, seed=123, device=True)
    assert not bm._scan_jits  # first build traces per-step
    ecc_2, res_2 = bm.build(points, scalars, seed=123, device=True)
    assert bm._scan_jits, "chain scan did not engage on the warm build"

    for th, td in (
        (ecc_1.ctx.records.base, ecc_2.ctx.records.base),
        (ecc_1.ctx.records.range, ecc_2.ctx.records.range),
        (ecc_1.ctx.records.select, ecc_2.ctx.records.select),
    ):
        assert th.height == td.height
        h = th.height
        np.testing.assert_array_equal(th.adv_vals[:h], td.adv_vals[:h])
        np.testing.assert_array_equal(th.adv_set[:h], td.adv_set[:h])
        np.testing.assert_array_equal(th.fix_vals[:h], td.fix_vals[:h])
        np.testing.assert_array_equal(th.fix_set[:h], td.fix_set[:h])
    assert res_1.x.native.val == res_2.x.native.val
    assert res_1.y.native.val == res_2.y.native.val
    ecc_2.ecc_assert_equal(res_2, ecc_2.assign_point(expect))
    run_circuit(ecc_2.ctx, 22)


def test_msm_batch_chain_scan_window_phase():
    """65 points (13 groups) engages the phase-4 window-chain scan on the
    warm build; result matches the oracle and verifies. XSLOW."""
    import os

    if "HALO2ECC_TPU_RUN_XSLOW" not in os.environ:
        pytest.skip("set HALO2ECC_TPU_RUN_XSLOW=1")
    points, scalars, expect = random_msm_instance(65, seed=9)
    bm = BatchMsm()
    bm.build(points, scalars, seed=55, device=True)
    ecc, res = bm.build(points, scalars, seed=55, device=True)
    assert any(k[0] == "p4" for k in bm._scan_jits), "phase-4 scan not engaged"
    ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    run_circuit(ecc.ctx, 23)


def test_msm_batch_no_select_chip():
    """Group-2 variant (no select chip, in-circuit bisec candidate trees —
    ecc_chip.rs:91-221); n=5 pads to 8 points / 4 groups."""
    points, scalars, expect = random_msm_instance(5, seed=21)
    bm = BatchMsm(with_select_chip=False)
    ecc, res = bm.build(points, scalars, seed=63)
    assert ecc.ctx.records.select.height == 0  # really no select rows
    ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    run_circuit(ecc.ctx, 22)


def test_msm_batch_no_select_device_bit_exact():
    """Group-2 engine (bisec candidates) through the device-resident
    pipeline: Records must be bit-exact with the host build and verify."""
    import numpy as np

    points, scalars, expect = random_msm_instance(5, seed=21)
    bm = BatchMsm(with_select_chip=False)
    ecc_h, res_h = bm.build(points, scalars, seed=63)
    ecc_d, res_d = bm.build(points, scalars, seed=63, device=True)

    for th, td in (
        (ecc_h.ctx.records.base, ecc_d.ctx.records.base),
        (ecc_h.ctx.records.range, ecc_d.ctx.records.range),
        (ecc_h.ctx.records.select, ecc_d.ctx.records.select),
    ):
        assert th.height == td.height
        h = th.height
        np.testing.assert_array_equal(th.adv_vals[:h], td.adv_vals[:h])
        np.testing.assert_array_equal(th.adv_set[:h], td.adv_set[:h])
        np.testing.assert_array_equal(th.fix_vals[:h], td.fix_vals[:h])
        np.testing.assert_array_equal(th.fix_set[:h], td.fix_set[:h])
    assert res_h.x.native.val == res_d.x.native.val
    assert res_h.y.native.val == res_d.y.native.val
    ecc_d.ecc_assert_equal(res_d, ecc_d.assign_point(expect))
    run_circuit(ecc_d.ctx, 22)


def test_msm_batch_no_select_chain_scan():
    """26 points (13 groups, group size 2) engages the phase-4 window-chain
    scan for the bisec engine on the warm build; Records bit-exact vs the
    per-step device build. XSLOW."""
    import os

    if "HALO2ECC_TPU_RUN_XSLOW" not in os.environ:
        pytest.skip("set HALO2ECC_TPU_RUN_XSLOW=1")
    import numpy as np

    points, scalars, expect = random_msm_instance(26, seed=17)
    bm = BatchMsm(with_select_chip=False)
    ecc_1, res_1 = bm.build(points, scalars, seed=31, device=True)
    ecc_2, res_2 = bm.build(points, scalars, seed=31, device=True)
    assert any(k[0] == "p4" for k in bm._scan_jits), "phase-4 scan not engaged"
    for th, td in (
        (ecc_1.ctx.records.base, ecc_2.ctx.records.base),
        (ecc_1.ctx.records.range, ecc_2.ctx.records.range),
        (ecc_1.ctx.records.select, ecc_2.ctx.records.select),
    ):
        assert th.height == td.height
        h = th.height
        np.testing.assert_array_equal(th.adv_vals[:h], td.adv_vals[:h])
        np.testing.assert_array_equal(th.fix_vals[:h], td.fix_vals[:h])
    assert res_1.x.native.val == res_2.x.native.val
    assert res_1.y.native.val == res_2.y.native.val
    ecc_2.ecc_assert_equal(res_2, ecc_2.assign_point(expect))
    run_circuit(ecc_2.ctx, 23)


def test_msm_batch_arbitrary_n():
    """n=7 pads to 10 (generator, scalar-0 pairs); result must match the
    host oracle and verify."""
    points, scalars, expect = random_msm_instance(7, seed=12)
    bm = BatchMsm()
    ecc, res = bm.build(points, scalars, seed=42)
    ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    run_circuit(ecc.ctx, 22)


def test_msm_batch_sharded_bit_exact():
    """Mesh-sharded device pipeline (8 virtual CPU devices): Records must be
    bit-exact with the single-device build; result verifies. XSLOW: compiles
    two full evaluator sets (padded + unpadded) on the 4-core CPU host."""
    import os

    if "HALO2ECC_TPU_RUN_XSLOW" not in os.environ:
        pytest.skip("set HALO2ECC_TPU_RUN_XSLOW=1")
    import numpy as np

    from halo2ecc_s_tpu.parallel.mesh import make_mesh

    points, scalars, expect = random_msm_instance(10, seed=6)
    bm = BatchMsm()
    ecc_s, res_s = bm.build(points, scalars, seed=321, device=True)
    mesh = make_mesh(axis="shard")
    ecc_m, res_m = bm.build(points, scalars, seed=321, mesh=mesh)

    for th, td in (
        (ecc_s.ctx.records.base, ecc_m.ctx.records.base),
        (ecc_s.ctx.records.range, ecc_m.ctx.records.range),
        (ecc_s.ctx.records.select, ecc_m.ctx.records.select),
    ):
        assert th.height == td.height
        h = th.height
        np.testing.assert_array_equal(th.adv_vals[:h], td.adv_vals[:h])
        np.testing.assert_array_equal(th.fix_vals[:h], td.fix_vals[:h])
    assert res_s.x.native.val == res_m.x.native.val
    assert res_s.y.native.val == res_m.y.native.val

    ecc_m.ecc_assert_equal(res_m, ecc_m.assign_point(expect))
    run_circuit(ecc_m.ctx, 22)


def test_msm_batch_1000_points():
    """Reference scale demo: 1000-point MSM at k=23
    (native_scalar_ecc_chip.rs:60), end-to-end verified. XSLOW."""
    import os

    if "HALO2ECC_TPU_RUN_XSLOW" not in os.environ:
        pytest.skip("set HALO2ECC_TPU_RUN_XSLOW=1")
    import time

    points, scalars, expect = random_msm_instance(1000, seed=10)
    bm = BatchMsm()
    t0 = time.time()
    ecc, res = bm.build(points, scalars, seed=44, device=True)
    build_secs = time.time() - t0
    ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    rows = ecc.ctx.offsets()
    # capacity is per REGION (independent column sets), like the
    # reference's k=23 table height (context.rs:36)
    assert max(rows) < (1 << 23)
    print(f"1000-pt MSM: {build_secs:.1f}s build, rows per region {rows}")
    run_circuit(ecc.ctx, 23)


def test_msm_batch_multi_instance():
    """build_many: 2 independent 10-point MSMs witnessed in one pipeline run
    (every phase's lane axis carries instance x own-axis); each result must
    match its host oracle and the combined trace verifies."""
    insts = [random_msm_instance(10, seed=s) for s in (31, 32)]
    bm = BatchMsm()
    ecc, results = bm.build_many(
        [(p, s) for p, s, _ in insts], seed=77, device=True,
    )
    assert len(results) == 2
    for (_, _, expect), res in zip(insts, results):
        ecc.ecc_assert_equal(res, ecc.assign_point(expect))
    run_circuit(ecc.ctx, 23)


def test_msm_batch_general_scalar_bls():
    """Batched general-scalar MSM: bls12-381 points/scalars witnessed over
    bn254 Fr (general_scalar_ecc_chip.rs:93-169) — 4-limb coordinates,
    per-limb-halving decomposition (324 windows)."""
    from halo2ecc_s_tpu.utils.fields import bls12_381

    points, scalars, expect = random_msm_instance(5, curve=bls12_381(), seed=13)
    bm = BatchMsm(curve=bls12_381(), general_scalar=True)
    ecc, res = bm.build(points, scalars, seed=31)
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


def test_msm_batch_serving_mode_matches_device_build():
    """write_tables=False (serving mode): advice slabs stay in HBM and host
    Records — masks and fixed columns included, which are static layout a
    server caches from one write_tables=True build — are never materialised.
    Results, row bookkeeping, and the UnsafeError safety flags must match the
    table-writing device build exactly."""
    points, scalars, _ = random_msm_instance(10, seed=21)
    bm = BatchMsm()
    ecc_w, res_w = bm.build(points, scalars, seed=77, device=True)
    ecc_s, res_s = bm.build(
        points, scalars, seed=77, device=True, write_tables=False
    )
    assert (res_s.x.val, res_s.y.val, res_s.z.val) == (
        res_w.x.val, res_w.y.val, res_w.z.val,
    )
    assert ecc_s.ctx.offsets() == ecc_w.ctx.offsets()
    # tables were skipped: the select region never grew to the full build
    assert (
        ecc_s.ctx.records.select.adv_vals.shape[0]
        < ecc_w.ctx.records.select.adv_vals.shape[0]
    )
