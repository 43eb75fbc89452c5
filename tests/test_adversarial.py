"""Adversarial verifier coverage: tamper every class of witness data (base
gate cells, range chunks, select lookup rows/encodes, permutation pairs,
batched permutation blocks, batched-emitted slabs) and assert BOTH verifier
backends (numpy reference and native C++) catch each."""

import numpy as np
import pytest

from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.core.records import (
    SELECT_COL_VALUE,
    SELECT_FIX_ENCODE,
    pack_u64x4,
)
from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
from halo2ecc_s_tpu.utils.fields import BN254_FQ
from halo2ecc_s_tpu.verify import native as _native
from halo2ecc_s_tpu.verify.mock_prover import verify_context

BACKENDS = [False] + ([True] if _native.get_lib() is not None else [])


def _select_circuit():
    """Context exercising base, range, select (cache + get rows), pairs."""
    ctx = Context()
    ictx = IntegerContext(ctx, BN254_FQ)
    a = ictx.assign_w(123456789)
    b = ictx.assign_w(987654321)
    ictx.int_mul(a, b)
    v1 = ctx.assign(111)
    v2 = ctx.assign(222)
    sel = ctx.assign(1)
    # cache encodes: (offset << 128) | (group << 64) | limb; the get row
    # passes (group << 64) | limb with selector = offset (select_chip.rs:11-18)
    ctx.assign_cache_value(v1, 17)
    ctx.assign_cache_value(v2, (1 << 128) + 17)
    ctx.assign_select_value(v2, 17, sel)
    # an extra cache row never selected (tampering it breaks ONLY its
    # permutation pair, isolating the copy-constraint check)
    spare = ctx.assign(3333)
    ctx.assign_cache_value(spare, (2 << 64) + 17)
    return ctx


@pytest.mark.parametrize("use_native", BACKENDS)
class TestAdversarial:
    def test_valid_baseline(self, use_native):
        ctx = _select_circuit()
        assert verify_context(ctx, k=18, use_native=use_native) == []

    def test_base_gate_tamper(self, use_native):
        ctx = _select_circuit()
        ctx.records.base.adv_vals[2, 0] = pack_u64x4(999999)
        errs = verify_context(ctx, k=18, use_native=use_native)
        assert errs != []

    def test_range_chunk_tamper(self, use_native):
        ctx = _select_circuit()
        # bump a range chunk beyond its tag bound
        ctx.records.range.adv_vals[0, 0] = pack_u64x4((1 << 19) + 5)
        errs = verify_context(ctx, k=18, use_native=use_native)
        assert errs != []

    def test_select_get_row_tamper(self, use_native):
        ctx = _select_circuit()
        tbl = ctx.records.select
        # row 2 is the 'get' row (assign_select_value): change its value so
        # the (value, sel*2^128+encode) tuple matches no 'set' row
        tbl.adv_vals[2, SELECT_COL_VALUE] = pack_u64x4(424242)
        errs = verify_context(ctx, k=18, use_native=use_native)
        assert any("select" in e or "lookup" in e for e in errs), errs

    def test_select_encode_tamper(self, use_native):
        ctx = _select_circuit()
        tbl = ctx.records.select
        tbl.fix_vals[2, SELECT_FIX_ENCODE] = pack_u64x4(999)
        errs = verify_context(ctx, k=18, use_native=use_native)
        assert any("select" in e or "lookup" in e for e in errs), errs

    def test_permutation_pair_tamper(self, use_native):
        ctx = _select_circuit()
        tbl = ctx.records.select
        # last select row is the never-selected spare cache row: changing its
        # value leaves gates+lookups satisfied... (its own (v,enc) row is a
        # 'set' row, self-consistent) but breaks its copy constraint
        tbl.adv_vals[3, SELECT_COL_VALUE] = pack_u64x4(4444)
        errs = verify_context(ctx, k=18, use_native=use_native)
        assert any("permutation" in e for e in errs), errs

    def test_permutation_block_tamper(self, use_native):
        from halo2ecc_s_tpu.batch.template import AssignedInput, Template

        def build(ctx, ins):
            return ctx.add(ins["x"], ins["x"])

        tmpl = Template.trace(
            build, {}, assigned_inputs=[AssignedInput("x", 32, 77)]
        )
        ctx = Context()
        src = [ctx.assign(v) for v in (7, 8, 9)]
        from halo2ecc_s_tpu.kernels import ff_jax as ff

        arrs = {"x": ff.ints_to_limbs([7, 8, 9], 16)}
        rows = {
            "x": (
                src[0].cell.region,
                src[0].cell.col,
                np.array([s.cell.row for s in src], dtype=np.int64),
            )
        }
        out = tmpl.instantiate(ctx, arrs, assigned_rows=rows)
        assert ctx.records.permutation_blocks
        assert verify_context(ctx, k=18, use_native=use_native) == []
        # break one lane of the block: change the SOURCE cell value (and fix
        # its own gate-free standing by tampering only the copy equality)
        _, (_, col, rws) = out
        ctx.records.base.adv_vals[src[1].cell.row, src[1].cell.col] = pack_u64x4(
            999
        )
        errs = verify_context(ctx, k=18, use_native=use_native)
        assert errs != []

    def test_batched_slab_tamper(self, use_native):
        """Tamper inside a batched-emitted advice slab (deferred path)."""
        from halo2ecc_s_tpu.batch.template import Template, finalize_deferred
        from halo2ecc_s_tpu.kernels import ff_jax as ff

        def build(ctx, ins):
            ictx = IntegerContext(ctx, BN254_FQ)
            a = ictx.assign_w(ins["a"])
            b = ictx.assign_w(ins["b"])
            return ictx.int_mul(a, b)

        tmpl = Template.trace(
            build, {"a": (254, 11111), "b": (254, 22222)}
        )
        ctx = Context()
        deferred = []
        a = ff.ints_to_limbs([5, 6], 16)
        b = ff.ints_to_limbs([7, 8], 16)
        tmpl.instantiate(ctx, {"a": a, "b": b}, deferred=deferred)
        finalize_deferred(deferred)
        assert verify_context(ctx, k=18, use_native=use_native) == []
        # flip a limb product cell in the middle of instance 1's slab
        row = tmpl.strides[0] + 3
        ctx.records.base.adv_vals[row, 1] = pack_u64x4(31337)
        errs = verify_context(ctx, k=18, use_native=use_native)
        assert errs != []
