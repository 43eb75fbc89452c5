"""Deferred (device-resident) template instantiation must produce Records
bit-exact with the host path, and preserve the deferred safety checks."""

import numpy as np
import pytest

from halo2ecc_s_tpu.batch.symbolic import assume_bits
from halo2ecc_s_tpu.batch.template import Template, finalize_deferred, tree_to_numpy
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.fields import BN254_FQ


def _int_mul_template():
    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        b = ictx.assign_w(ins["b"])
        return ictx.int_mul(a, b)

    return Template.trace(
        build, {"a": (254, 123456789 % BN254_FQ), "b": (254, 987654321 % BN254_FQ)}
    )


def _rand_inputs(B, seed=3):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF
    return a, b


def _tables_equal(ra, rb):
    for ta, tb in ((ra.base, rb.base), (ra.range, rb.range), (ra.select, rb.select)):
        h = max(ta.height, tb.height)
        assert ta.height == tb.height
        np.testing.assert_array_equal(ta.adv_vals[:h], tb.adv_vals[:h])
        np.testing.assert_array_equal(ta.adv_set[:h], tb.adv_set[:h])
        np.testing.assert_array_equal(ta.fix_vals[:h], tb.fix_vals[:h])
        np.testing.assert_array_equal(ta.fix_set[:h], tb.fix_set[:h])


def test_deferred_bit_exact_with_host_path():
    tmpl = _int_mul_template()
    a, b = _rand_inputs(6)

    ctx_host = Context()
    out_host = tmpl.instantiate(ctx_host, {"a": a, "b": b})

    ctx_dev = Context()
    deferred = []
    out_dev = tmpl.instantiate(ctx_dev, {"a": a, "b": b}, deferred=deferred)
    assert len(deferred) == 1
    finalize_deferred(deferred)
    out_dev = tree_to_numpy(out_dev)

    _tables_equal(ctx_host.records, ctx_dev.records)

    def leaves(t):
        return [t["native"]] + list(t["limbs"])

    for lh, ld in zip(leaves(out_host), leaves(out_dev)):
        np.testing.assert_array_equal(lh[0], ld[0])
        assert lh[1][0] == ld[1][0] and lh[1][1] == ld[1][1]
        np.testing.assert_array_equal(lh[1][2], ld[1][2])


def test_deferred_width_check_fires_at_finalize():
    def build(ctx, ins):
        v = assume_bits(ins["a"], 16)
        return ctx.assign(v * 3)

    tmpl = Template.trace(build, {"a": (254, 1000)})
    ctx = Context()
    deferred = []
    arr = ff.ints_to_limbs([1000, 1 << 20], 16)
    tmpl.instantiate(ctx, {"a": arr}, deferred=deferred)
    with pytest.raises(ValueError, match="assume_bits"):
        finalize_deferred(deferred)
