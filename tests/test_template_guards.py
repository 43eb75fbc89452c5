"""Template-compiler guard rails: width declarations and input validation."""

import numpy as np
import pytest

from halo2ecc_s_tpu.batch.template import Template
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.utils.fields import BN254_FR


def _simple_template():
    def build(ctx, ins):
        a = ctx.assign(ins["a"])
        return ctx.add(a, a)

    return Template.trace(build, {"a": (64, 12345)})


def test_trace_rejects_oversized_sample():
    def build(ctx, ins):
        return ctx.assign(ins["a"])

    with pytest.raises(AssertionError, match="exceeds declared"):
        Template.trace(build, {"a": (16, 1 << 20)})


def test_instantiate_rejects_oversized_inputs():
    tmpl = _simple_template()
    ctx = Context()
    # value wider than the declared 64 bits
    bad = ff.ints_to_limbs([1 << 70, 5], 16)
    with pytest.raises(ValueError, match="wider than its declared"):
        tmpl.instantiate(ctx, {"a": bad})


def test_instantiate_rejects_top_limb_overflow():
    def build(ctx, ins):
        a = ctx.assign(ins["a"])
        return ctx.add(a, a)

    tmpl = Template.trace(build, {"a": (20, 7)})
    ctx = Context()
    bad = ff.ints_to_limbs([1 << 22, 5], 16)  # 20-bit declared, 23-bit value
    with pytest.raises(ValueError, match="top limb exceeds"):
        tmpl.instantiate(ctx, {"a": bad})


def test_valid_inputs_pass():
    tmpl = _simple_template()
    ctx = Context()
    out = tmpl.instantiate(ctx, {"a": ff.ints_to_limbs([7, 9], 16)})
    vals, _ = out
    assert ff.limbs_to_int(vals[0]) == 14
    assert ff.limbs_to_int(vals[1]) == 18
