"""Bit-exactness of the whole-template Pallas slab kernel
(kernels/tape_pallas.py) against the XLA evaluator + table assembly path,
in interpret mode on CPU."""

import numpy as np
import pytest

from halo2ecc_s_tpu.kernels.tape_pallas import build_slab_kernel
from halo2ecc_s_tpu.models.int_mul import int_mul_template
from halo2ecc_s_tpu.utils.fields import BN254_FQ


def test_int_mul_slabs_bit_exact():
    tmpl = int_mul_template()
    call = build_slab_kernel(tmpl, W=128, reference=True)
    assert call is not None, "int_mul tape must be pallas-supported"

    B = 8 * 128
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF

    got = call({"a": a, "b": b})
    want = tmpl.device_emitter()({"a": a, "b": b})
    assert set(got) == set(want)
    for ridx in want:
        g = np.asarray(got[ridx])
        w = np.asarray(want[ridx])
        assert g.shape == w.shape, (ridx, g.shape, w.shape)
        if not np.array_equal(g, w):
            bad = np.argwhere(g != w)
            raise AssertionError(
                f"region {ridx}: {len(bad)} mismatching cells, first at "
                f"{bad[0]}: got {g[tuple(bad[0])]:#x} want {w[tuple(bad[0])]:#x}"
            )


def test_with_outputs_matches_slab_value_emitter():
    import jax

    tmpl = int_mul_template()
    call = build_slab_kernel(tmpl, W=128, reference=True, with_outputs=True)
    assert call is not None

    B = 8 * 128
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF

    slabs, outvals, flags = call({"a": a, "b": b})
    w_slabs, w_outvals, w_flags = tmpl.slab_value_emitter()({"a": a, "b": b})
    for ridx in w_slabs:
        assert np.array_equal(np.asarray(slabs[ridx]), np.asarray(w_slabs[ridx])), ridx
    assert set(outvals) == set(w_outvals)
    for k in w_outvals:
        assert np.array_equal(np.asarray(outvals[k]), np.asarray(w_outvals[k])), k
    assert bool(flags["diverged"]) == bool(np.asarray(w_flags["diverged"]))
    assert bool(flags["width_bad"]) == bool(np.asarray(w_flags["width_bad"]))
    assert not flags["diverged"] and not flags["width_bad"]


def _inv_template():
    from halo2ecc_s_tpu.batch.template import Template
    from halo2ecc_s_tpu.ops.integer_ops import IntegerContext

    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        return ictx.int_unsafe_invert(a)

    return Template.trace(build, {"a": (254, 123456789)})


def test_inv_tape_bit_exact_nonaligned_batch():
    """Fermat-inversion tapes (EC slope witnesses) run in-kernel via the
    square-and-multiply fori_loop / static-bit reference loop; checked
    bit-exact against the XLA evaluator path at a NON-tile-aligned batch
    (exercises the shim's lane-0-replication padding; ecc_chip.rs:840-882
    is the op family this unlocks for the MSM window templates)."""
    tmpl = _inv_template()
    call = build_slab_kernel(tmpl, W=8, reference=True, with_outputs=True)
    assert call is not None, "inv tape must now be pallas-supported"

    B = 37  # deliberately not a multiple of the 64-lane tile
    rng = np.random.default_rng(5)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF

    slabs, outvals, flags = call({"a": a})
    w_slabs, w_outvals, w_flags = tmpl.slab_value_emitter()({"a": a})
    for ridx in w_slabs:
        assert np.array_equal(
            np.asarray(slabs[ridx]), np.asarray(w_slabs[ridx])
        ), ridx
    assert set(outvals) == set(w_outvals)
    for k in w_outvals:
        assert np.array_equal(np.asarray(outvals[k]), np.asarray(w_outvals[k])), k
    assert bool(flags["diverged"]) == bool(np.asarray(w_flags["diverged"]))
    assert bool(flags["width_bad"]) == bool(np.asarray(w_flags["width_bad"]))


def test_gather_tape_bit_exact():
    """Data-dependent candidate gathers (pick_candidate_non_zero's index
    mix, ecc_chip.rs:935-953) lower to an XLA-clamp-matching select tree."""
    from halo2ecc_s_tpu.batch.symbolic import gather
    from halo2ecc_s_tpu.batch.template import Template
    from halo2ecc_s_tpu.utils.fields import BN254_FR

    K = 8

    def build(ctx, ins):
        vs = [ins[f"v{k}"] for k in range(K)]
        g = gather(vs, ins["idx"], ins["idx"].v0)
        return ctx.assign(g * g)

    inputs = {f"v{k}": (254, 1000 + k) for k in range(K)}
    inputs["idx"] = (8, 3)
    tmpl = Template.trace(build, inputs)
    call = build_slab_kernel(tmpl, W=8, reference=True)
    assert call is not None

    B = 64
    rng = np.random.default_rng(9)
    ins = {}
    for k in range(K):
        v = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
        v[:, -1] &= 0x1FFF
        ins[f"v{k}"] = v
    idx = np.zeros((B, 1), dtype=np.uint32)
    idx[:, 0] = rng.integers(0, K, B)
    ins["idx"] = idx

    got = call(ins)
    want = tmpl.device_emitter()(ins)
    for ridx in want:
        assert np.array_equal(np.asarray(got[ridx]), np.asarray(want[ridx])), ridx


def test_true_pallas_call_interpret_mode():
    """The REAL pl.pallas_call path — block specs, scalar-prefetch pow
    schedule, input/slab relayouts, non-tile-aligned-batch padding, and a
    multi-region (base + range) output set — executed via the Pallas
    interpreter on CPU (the numpy shim cannot catch Mosaic-side
    spec/relayout bugs; this can). The interpreter costs ~45s per 16-limb
    Barrett modmul, so the template keeps values narrow: small-width adds,
    range-chunk rows, and a powm over a 20-bit modulus (2-limb modmuls)
    exercise every structural path without the 253-iteration Fermat chain."""
    from halo2ecc_s_tpu.batch.template import Template
    from halo2ecc_s_tpu.ops.integer_ops import IntegerContext

    M_SMALL = 1000003  # 20-bit prime: 2-limb pow chain

    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        s = ins["a"] + ins["b"]  # 101 bits < n: assign's mod is an identity
        p5 = pow(ins["a"] & ((1 << 32) - 1), 5, M_SMALL)
        lb = ictx.assign_nonleading_limb(ins["c"])  # 3 range rows
        ctx.assign(p5 % ctx.n)
        ctx.assign(s % ctx.n)
        return lb

    tmpl = Template.trace(
        build,
        {"a": (100, 987654321), "b": (100, 1234567), "c": (108, 55555)},
    )
    call = build_slab_kernel(tmpl, W=8, interpret=True, with_outputs=True)
    assert call is not None

    B = 20  # not a multiple of the 64-lane tile
    rng = np.random.default_rng(13)
    a = rng.integers(0, 1 << 16, (B, 7), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 7), dtype=np.int64).astype(np.uint32)
    c = rng.integers(0, 1 << 16, (B, 7), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0xF
    b[:, -1] &= 0xF
    c[:, -1] &= 0xFFF

    slabs, outvals, flags = call({"a": a, "b": b, "c": c})
    w_slabs, w_outvals, w_flags = tmpl.slab_value_emitter()(
        {"a": a, "b": b, "c": c}
    )
    assert set(slabs) == set(w_slabs) and len(slabs) == 2  # base + range
    for ridx in w_slabs:
        assert np.array_equal(
            np.asarray(slabs[ridx]), np.asarray(w_slabs[ridx])
        ), ridx
    for k in w_outvals:
        assert np.array_equal(np.asarray(outvals[k]), np.asarray(w_outvals[k])), k
    assert not bool(np.asarray(flags["diverged"]))
    assert not bool(np.asarray(flags["width_bad"]))


def test_raw_slab_layout_bit_exact():
    """raw_slabs=True returns the kernel-native lane-major layout
    u32[S*8, 8, Bs]; unpack_raw_slab() must reproduce the batch-major
    slabs bit-exactly (the serving deliverable the TPU headline measures —
    skipping this transpose on device is ~73% of emit time)."""
    from halo2ecc_s_tpu.kernels.tape_pallas import unpack_raw_slab

    tmpl = int_mul_template()
    call_raw = build_slab_kernel(tmpl, W=8, reference=True, raw_slabs=True)
    call_bm = build_slab_kernel(tmpl, W=8, reference=True)
    assert call_raw is not None and call_bm is not None

    B = 100  # non-tile-aligned
    rng = np.random.default_rng(23)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF

    raw = call_raw({"a": a, "b": b})
    bm = call_bm({"a": a, "b": b})
    rinfo = tmpl._region_const_info()
    for ridx, o in raw.items():
        stride, n_adv, _c, _cap = rinfo[ridx]
        got = unpack_raw_slab(np.asarray(o), stride, n_adv, B)
        assert np.array_equal(got, np.asarray(bm[ridx])), ridx

    # the template-level emitter (XLA fallback path on CPU) honours the
    # same contract
    remit = tmpl.device_emitter_raw_slabs()
    raw2 = remit({"a": a, "b": b})
    for ridx, o in raw2.items():
        stride, n_adv, _c, _cap = rinfo[ridx]
        got = unpack_raw_slab(np.asarray(o), stride, n_adv, B)
        assert np.array_equal(got, np.asarray(bm[ridx])), ridx
