"""Op-granular batched contexts: the integer-ops interface over batched
values, each op a cached witness template.

Because the tower and pairing algorithm cores (core/tower.py,
core/pairing_core.py) are written against the small int-ops interface, this
class makes them run BATCHED unchanged: B independent pairing checks /
tower computations share one trace per (op, times-signature) and evaluate as
XLA programs — the proof-aggregation workload shape.

Templates are cached per (op, static times signature); the lazy-reduction
`times` state fully determines each op's row layout (same property the
batched MSM exploits)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np

from ..core.assign import AssignedCondition, AssignedG2Affine
from ..core.context import Context
from ..core.pairing_core import PairingOps
from ..core.range_info import range_info
from ..core.tower import TowerOps
from ..kernels import ff_jax as ff
from ..ops.ecc_ops import NativeScalarEccContext
from ..ops.integer_ops import IntegerContext
from ..utils.fields import PairingCurve
from .assigned_io import (
    BInt,
    Leaf,
    declare_int,
    int_arrays,
    int_from_ins,
    leaf_rows,
    leaf_vals,
    unbatch_value,
)
from .template import AssignedInput, Template


@dataclass
class BG1:
    """Batched non-identity G1 point for pairing terms."""

    x: BInt
    y: BInt
    z: Leaf  # condition leaf, all lanes 0


class BatchedPairingOps(TowerOps, PairingOps):
    """Tower + pairing ops over batched values (B lanes)."""

    def __init__(self, ctx: Context, curve: PairingCurve, B: int,
                 device: bool = False):
        """device=True runs every op's witness emission device-resident: each
        template's slabs are queued (template.py deferred mode) and output
        leaves carry device arrays, so the whole op stream — thousands of
        dispatches for a pairing — pipelines through JAX async dispatch with
        NO host sync per op (critical on a remote-attached TPU, where each
        sync costs a tunnel round trip). Call drain() after the last op to
        check divergence flags and (optionally) write the host Records;
        Records are then bit-exact with device=False."""
        self.ctx = ctx
        self.curve = curve
        self.B = B
        self.info = range_info(curve.p, ctx.n)
        self._tmpl: Dict[object, Template] = {}
        self.deferred = [] if device else None

    def drain(self, write: bool = True) -> None:
        """Drain the device pipeline (device=True): one stacked fetch checks
        every op's divergence/width flags (UnsafeError retry protocol), then
        the advice slabs are written to the host Records (write=False keeps
        them in HBM — serving mode)."""
        if self.deferred:
            from .template import finalize_deferred

            finalize_deferred(self.deferred, write=write)

    @property
    def pairing_curve(self) -> PairingCurve:
        return self.curve

    def _limb_params(self):
        info = self.info
        return info.limb_bits, info.w_ceil_bits - (info.limbs - 1) * info.limb_bits

    # ------------------------------------------------------------------
    # template plumbing
    # ------------------------------------------------------------------

    def _int_template(self, key, samples, build_body):
        """samples: dict name -> AssignedInteger (lane 0), or a zero-arg
        callable returning it — callables are only invoked on a cache miss,
        so device-mode ops don't pay a lane-0 device fetch per cache HIT
        (in the op-granular pipeline that would be one tunnel round trip per
        op, exactly what device mode exists to avoid)."""
        if key in self._tmpl:
            return self._tmpl[key]
        if callable(samples):
            samples = samples()
        lb, lead = self._limb_params()
        w = self.curve.p
        n_limbs = self.info.limbs

        def build(c, ins):
            ictx = IntegerContext(c, w)
            ints = {
                name: int_from_ins(ins, name, samples[name].times, n_limbs)
                for name in samples
            }
            return build_body(ictx, ints, c, ins)

        assigned = []
        for name, sample in samples.items():
            assigned += declare_int(name, sample, lb, lead)
        tmpl = Template.trace(build, {}, assigned_inputs=assigned, n_modulus=self.ctx.n)
        self._tmpl[key] = tmpl
        return tmpl

    def _run(self, tmpl: Template, operands: Dict[str, BInt], extra_ins=None,
             extra_rows=None):
        ins: Dict[str, np.ndarray] = dict(extra_ins or {})
        rows: Dict[str, object] = dict(extra_rows or {})
        for name, b in operands.items():
            int_arrays(name, b, ins, rows)
        return tmpl.instantiate(self.ctx, ins, assigned_rows=rows,
                                deferred=self.deferred)

    # Every op result is normalised back to times == 1 (an eager `reduce`
    # inside the same template). The scalar path's lazy-reduction times
    # states would otherwise fan out into hundreds of distinct layouts (each
    # needing its own compiled evaluator — observed: 283 templates and OOM
    # for two pairing steps); with eager reduction the whole pairing runs on
    # ~15 templates. Cost: more reduce rows per op — the batched-aggregation
    # profile trades circuit rows for bounded compile count.

    def _binop(self, opname: str, a: BInt, b: BInt) -> BInt:
        key = (opname, a.times, b.times)

        def body(ictx, ints, c, ins):
            out = getattr(ictx, opname)(ints["a"], ints["b"])
            return ictx.reduce(out)

        tmpl = self._int_template(
            key, lambda: {"a": a.lane(0), "b": b.lane(0)}, body
        )
        return BInt.from_tree(self._run(tmpl, {"a": a, "b": b}))

    def _unop(self, opname: str, a: BInt) -> BInt:
        key = (opname, a.times)

        def body(ictx, ints, c, ins):
            out = getattr(ictx, opname)(ints["a"])
            return ictx.reduce(out)

        tmpl = self._int_template(key, lambda: {"a": a.lane(0)}, body)
        return BInt.from_tree(self._run(tmpl, {"a": a}))

    # ------------------------------------------------------------------
    # integer-ops interface (consumed by TowerOps / PairingOps)
    # ------------------------------------------------------------------

    def int_add(self, a: BInt, b: BInt) -> BInt:
        return self._binop("int_add", a, b)

    def int_sub(self, a: BInt, b: BInt) -> BInt:
        return self._binop("int_sub", a, b)

    def int_mul(self, a: BInt, b: BInt) -> BInt:
        return self._binop("int_mul", a, b)

    def int_neg(self, a: BInt) -> BInt:
        return self._unop("int_neg", a)

    def int_square(self, a: BInt) -> BInt:
        return self._unop("int_square", a)

    def int_unsafe_invert(self, a: BInt) -> BInt:
        return self._unop("int_unsafe_invert", a)

    def reduce(self, a: BInt) -> BInt:
        if a.times == 1:
            return a
        return self._unop("reduce", a)

    def assign_int_constant(self, v: int) -> BInt:
        v = v % self.curve.p
        key = ("const", v)
        tmpl = self._int_template(
            key, {}, lambda ictx, ints, c, ins: ictx.assign_int_constant(v)
        )
        return BInt.from_tree(self._instantiate_const(tmpl))

    def _instantiate_const(self, tmpl: Template):
        # no symbolic inputs: synthesise the batch dimension explicitly
        probe_ins = {"__lanes__": np.zeros((self.B, 1), dtype=np.uint32)}
        return tmpl.instantiate(self.ctx, probe_ins, deferred=self.deferred)

    def assert_int_equal(self, a: BInt, b: BInt) -> None:
        key = ("assert_int_equal", a.times, b.times)
        tmpl = self._int_template(
            key,
            lambda: {"a": a.lane(0), "b": b.lane(0)},
            lambda ictx, ints, c, ins: (ictx.assert_int_equal(ints["a"], ints["b"]), None)[1],
        )
        self._run(tmpl, {"a": a, "b": b})

    def assert_false_cond(self, cond: Leaf) -> None:
        key = "assert_false"
        if key not in self._tmpl:
            sample = unbatch_value(cond, 0)

            def build(c, ins):
                c.assert_false(AssignedCondition(ins["c"]))
                return None

            self._tmpl[key] = Template.trace(
                build, {}, assigned_inputs=[AssignedInput("c", 1, sample.val)],
                n_modulus=self.ctx.n,
            )
        tmpl = self._tmpl[key]
        tmpl.instantiate(
            self.ctx, {"c": leaf_vals(cond)}, assigned_rows={"c": leaf_rows(cond)},
            deferred=self.deferred,
        )

    # ------------------------------------------------------------------
    # batched point assignment for pairing terms
    # ------------------------------------------------------------------

    def assign_g1(self, xs, ys) -> BG1:
        """Batched non-identity G1 points with on-curve checks.
        xs, ys: lists of ints (length B)."""
        key = "assign_g1"
        if key not in self._tmpl:
            curve = self.curve

            def build(c, ins):
                e = NativeScalarEccContext(curve, ctx=c, with_select_chip=False)
                p = e.assign_point_xyz(ins["x"], ins["y"], 0)
                return p

            fb = self.curve.fq_bits
            self._tmpl[key] = Template.trace(
                build, {"x": (fb, xs[0]), "y": (fb, ys[0])}, n_modulus=self.ctx.n
            )
        tmpl = self._tmpl[key]
        Lw = ff.n_limbs_for(self.curve.p)
        out = tmpl.instantiate(
            self.ctx,
            {"x": ff.ints_to_limbs(xs, Lw), "y": ff.ints_to_limbs(ys, Lw)},
            deferred=self.deferred,
        )
        return BG1(BInt.from_tree(out["x"]), BInt.from_tree(out["y"]), out["z"])

    def assign_g2(self, g2_points) -> AssignedG2Affine:
        """Batched G2 points ((x0,x1),(y0,y1)) with on-curve checks; returns
        AssignedG2Affine with BInt fq2 components."""
        key = "assign_g2"
        if key not in self._tmpl:
            curve = self.curve
            (x0, x1), (y0, y1) = g2_points[0]

            def build(c, ins):
                e = NativeScalarEccContext(curve, ctx=c, with_select_chip=False)
                g = e.assign_g2(((ins["x0"], ins["x1"]), (ins["y0"], ins["y1"])))
                return {"x": g.x, "y": g.y, "z": g.z}

            fb = self.curve.fq_bits
            self._tmpl[key] = Template.trace(
                build,
                {"x0": (fb, x0), "x1": (fb, x1), "y0": (fb, y0), "y1": (fb, y1)},
                n_modulus=self.ctx.n,
            )
        tmpl = self._tmpl[key]
        Lw = ff.n_limbs_for(self.curve.p)
        out = tmpl.instantiate(
            self.ctx,
            {
                "x0": ff.ints_to_limbs([p[0][0] for p in g2_points], Lw),
                "x1": ff.ints_to_limbs([p[0][1] for p in g2_points], Lw),
                "y0": ff.ints_to_limbs([p[1][0] for p in g2_points], Lw),
                "y1": ff.ints_to_limbs([p[1][1] for p in g2_points], Lw),
            },
            deferred=self.deferred,
        )
        x = (BInt.from_tree(out["x"][0]), BInt.from_tree(out["x"][1]))
        y = (BInt.from_tree(out["y"][0]), BInt.from_tree(out["y"][1]))
        return AssignedG2Affine(x, y, out["z"])

    # -- value extraction for tests --

    def fq12_values(self, f, lane: int):
        lb = self.info.limb_bits

        def fq(b: BInt):
            return b.value(lane, lb) % self.curve.p

        return tuple(
            tuple(tuple(fq(c) for c in fq2) for fq2 in fq6) for fq6 in f
        )
