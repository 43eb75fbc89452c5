"""assume_bits must fail loudly when a non-trace lane violates the width
assumption (symbolic-tape invariant: never silently corrupt witnesses)."""

import numpy as np
import pytest

from halo2ecc_s_tpu.batch.symbolic import assume_bits
from halo2ecc_s_tpu.batch.template import Template
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.kernels import ff_jax as ff


def _tmpl():
    def build(ctx, ins):
        v = assume_bits(ins["a"], 16)
        return ctx.assign(v * 3)

    return Template.trace(build, {"a": (254, 1000)})


def test_assume_bits_ok_lanes():
    tmpl = _tmpl()
    ctx = Context()
    arr = ff.ints_to_limbs([1000, 65535, 0], 16)
    out = tmpl.instantiate(ctx, {"a": arr})
    vals, _ = out
    assert [ff.limbs_to_int(v) for v in vals] == [3000, 3 * 65535, 0]


def test_assume_bits_violating_lane_raises():
    tmpl = _tmpl()
    ctx = Context()
    # lane 1 exceeds 2^16: the assume node would silently truncate it
    arr = ff.ints_to_limbs([1000, 1 << 20, 4], 16)
    with pytest.raises(ValueError, match="assume_bits"):
        tmpl.instantiate(ctx, {"a": arr})
