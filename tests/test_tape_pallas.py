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


def test_unsupported_tape_returns_none():
    # a tape with an inv node (ecc tangent) must fall back to the XLA path
    from halo2ecc_s_tpu.batch.template import Template
    from halo2ecc_s_tpu.ops.integer_ops import IntegerContext

    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        return ictx.int_unsafe_invert(a)

    tmpl = Template.trace(build, {"a": (254, 123456789)})
    assert build_slab_kernel(tmpl, reference=True) is None
