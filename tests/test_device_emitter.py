"""Device-resident emission must agree with the host instantiate path."""

import numpy as np

from halo2ecc_s_tpu.batch.template import Template
from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.fields import BN254_FQ


def test_device_tables_match_host_records():
    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        b = ictx.assign_w(ins["b"])
        return ictx.int_mul(a, b)

    tmpl = Template.trace(
        build, {"a": (254, 31337 % BN254_FQ), "b": (254, 271828 % BN254_FQ)}
    )

    rng = np.random.default_rng(3)
    B = 4
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF

    # host path
    ctx = Context()
    tmpl.instantiate(ctx, {"a": a, "b": b})

    # device path
    tables = {k: np.asarray(v) for k, v in tmpl.device_emitter()({"a": a, "b": b}).items()}

    for ridx, tbl in ((0, ctx.records.base), (1, ctx.records.range)):
        stride = tmpl.strides[ridx]
        dev = tables[ridx]  # [B, stride, n_adv, 8] u32 packed limb pairs
        assert dev.shape == (B, stride, tbl.n_adv, 8)
        host = tbl.adv_vals[: B * stride].reshape(B, stride, tbl.n_adv, 4)
        dev64 = dev.astype(np.uint64)
        dev64 = dev64[..., 0::2] | (dev64[..., 1::2] << np.uint64(32))
        np.testing.assert_array_equal(dev64, host)


def test_profiling_and_sanity_helpers():
    import os

    from halo2ecc_s_tpu.utils.profiling import Timer, timer

    t = Timer()
    with t.section("a"):
        pass
    assert "a" in t.totals
    with timer("noop"):
        pass

    ctx = Context()
    v = ctx.assign(5)
    ctx.records.check_row_has_some(ctx.base_offset, 0, 0)
    assert "base_fix" in ctx.records.dump_fix_rows(0, 1)
    ctx.add(v, v)
    assert "<->" in ctx.records.dump_permutations() or ctx.records.permutations
