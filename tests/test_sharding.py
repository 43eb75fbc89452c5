"""Multi-device sharding of the witness pipeline (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax

from halo2ecc_s_tpu.batch.template import Template
from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.parallel.mesh import (
    make_mesh,
    sharded_field_sum,
    sharded_int_mul_witness,
    sharded_template_witness,
)
from halo2ecc_s_tpu.utils.fields import BN254_FQ, BN254_FR


def _needs_devices(n):
    return pytest.mark.skipif(
        len(jax.devices()) < n, reason=f"needs {n} devices"
    )


@_needs_devices(8)
def test_sharded_int_mul_witness_runs():
    from halo2ecc_s_tpu.models.int_mul import int_mul_template

    mesh = make_mesh(8)
    step = sharded_int_mul_witness(mesh)
    rng = np.random.default_rng(0)
    B = 16
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF
    tables, digest = step(a, b)
    # digest must equal the u32 fold of the single-device emitter's slabs
    single = int_mul_template().device_emitter()({"a": a, "b": b})
    expect = sum(
        int(np.sum(np.asarray(v), dtype=np.uint32)) for v in single.values()
    ) & 0xFFFFFFFF
    assert int(digest) == expect
    for ridx, v in single.items():
        np.testing.assert_array_equal(np.asarray(tables[ridx]), np.asarray(v))


@_needs_devices(8)
def test_sharded_field_sum_exact():
    mesh = make_mesh(8)
    reduce_fn = sharded_field_sum(mesh)
    rng = np.random.default_rng(1)
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(64)]
    arr = ff.ints_to_limbs(vals, 16)
    out = np.asarray(reduce_fn(arr))
    assert ff.limbs_to_int(out) == sum(vals) % BN254_FR


@_needs_devices(8)
def test_sharded_template_witness_matches_single_device():
    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        b = ictx.assign_w(ins["b"])
        return ictx.int_mul(a, b)

    tmpl = Template.trace(
        build, {"a": (254, 111222333 % BN254_FQ), "b": (254, 444555666 % BN254_FQ)}
    )

    rng = np.random.default_rng(2)
    B = 16
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF

    single = {k: np.asarray(v) for k, v in tmpl.device_emitter()({"a": a, "b": b}).items()}

    mesh = make_mesh(8)
    fn = sharded_template_witness(mesh, tmpl)
    sharded = {k: np.asarray(v) for k, v in fn({"a": a, "b": b}).items()}

    assert set(single) == set(sharded)
    for k in single:
        np.testing.assert_array_equal(single[k], sharded[k])
