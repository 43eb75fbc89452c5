"""Batched MSM witness generation (select-chip variant, native scalar).

The MSM's parallel axes (SURVEY §2): points for assignment/decomposition,
groups for candidate precompute, windows for the per-window group chains.
Each phase is a witness template (batch/template.py) traced once from the
ordinary chip code and instantiated for the whole axis at once; window-chain
templates are cached per overflow-times signature (the `times` lazy-reduction
state cycles with period 4, so only a handful of distinct row layouts exist —
the static-layout property the reference asserts per window,
ecc_chip.rs:186-191, generalised).

Layout: batch-major slabs per phase (a valid, deterministic layout of this
framework's own; the verifier checks it like any other trace). Host oracle
equality and full constraint verification are the correctness criteria
(tests/test_msm_batch.py).
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.assign import (
    AssignedCondition,
    AssignedInteger,
    AssignedNonZeroPoint,
    AssignedValue,
    Cell,
    Region,
)
from ..core.context import Context
from ..core.records import SELECT_FIX_ENCODE, pack_u64x4
from ..kernels import ff_jax as ff
from ..ops.ecc_ops import NativeScalarEccContext, UnsafeError
from ..utils.curves import G1
from ..utils.fields import PairingCurve, bn254
from .template import AssignedInput, Template

_DUMMY = Cell(Region.BASE, 0, 0)


def _leaf_vals(leaf) -> np.ndarray:
    return leaf[0]


def _leaf_rows(leaf):
    return leaf[1]


def _unbatch_value(leaf, lane: int) -> AssignedValue:
    vals, (region, col, rows) = leaf
    return AssignedValue(
        Cell(region, col, int(rows[lane])), ff.limbs_to_int(vals[lane])
    )


def _unbatch_integer(tree, lane: int) -> AssignedInteger:
    limbs = [_unbatch_value(l, lane) for l in tree["limbs"]]
    native = _unbatch_value(tree["native"], lane)
    return AssignedInteger(limbs, native, tree["times"])


def _unbatch_nonzero_point(tree, lane: int) -> AssignedNonZeroPoint:
    return AssignedNonZeroPoint(
        _unbatch_integer(tree["x"], lane), _unbatch_integer(tree["y"], lane)
    )


def _int_inputs(prefix: str, v0_int: AssignedInteger, limb_bits: int, lead_bits: int):
    """AssignedInput declarations for an AssignedInteger's 4 leaves."""
    t_bits = max(v0_int.times.bit_length(), 1) + 1
    decls = []
    for j, limb in enumerate(v0_int.limbs_le):
        bits = (limb_bits if j < len(v0_int.limbs_le) - 1 else lead_bits) + t_bits
        decls.append(AssignedInput(f"{prefix}_l{j}", bits, limb.val))
    decls.append(AssignedInput(f"{prefix}_native", 254, v0_int.native.val))
    return decls


def _int_from_ins(ins, prefix: str, times: int) -> AssignedInteger:
    limbs = [ins[f"{prefix}_l{j}"] for j in range(3)]
    native = ins[f"{prefix}_native"]
    return AssignedInteger(list(limbs), native, times)


def _int_input_arrays(prefix: str, tree, out: Dict, rows: Dict):
    for j in range(3):
        out[f"{prefix}_l{j}"] = _leaf_vals(tree["limbs"][j])
        rows[f"{prefix}_l{j}"] = _leaf_rows(tree["limbs"][j])
    out[f"{prefix}_native"] = _leaf_vals(tree["native"])
    rows[f"{prefix}_native"] = _leaf_rows(tree["native"])


def _broadcast_scalar_int(prefix: str, v: AssignedInteger, B: int, out, rows):
    for j in range(3):
        out[f"{prefix}_l{j}"] = np.broadcast_to(
            ff.ints_to_limbs([v.limbs_le[j].val], 16), (B, 16)
        )
        rows[f"{prefix}_l{j}"] = (
            v.limbs_le[j].cell.region,
            v.limbs_le[j].cell.col,
            np.full(B, v.limbs_le[j].cell.row, dtype=np.int64),
        )
    out[f"{prefix}_native"] = np.broadcast_to(
        ff.ints_to_limbs([v.native.val], 16), (B, 16)
    )
    rows[f"{prefix}_native"] = (
        v.native.cell.region,
        v.native.cell.col,
        np.full(B, v.native.cell.row, dtype=np.int64),
    )


class BatchMsm:
    """Reusable batched MSM witness generator for one curve.

    Templates are traced lazily and cached across calls (compiles persist via
    the jax compilation cache)."""

    def __init__(self, curve: Optional[PairingCurve] = None):
        self.curve = curve or bn254()
        self.g1 = G1(self.curve)
        self._templates: Dict[object, Template] = {}

    # ------------------------------------------------------------------
    # templates
    # ------------------------------------------------------------------

    def _limb_params(self, ecc):
        info = ecc.base_ictx.info
        return info.limb_bits, info.w_ceil_bits - (info.limbs - 1) * info.limb_bits

    def _t_assign(self, ecc, sample_pt, sample_s, s_zero, non_zero_p):
        key = "assign"
        if key in self._templates:
            return self._templates[key]

        curve = self.curve

        def build(ctx, ins):
            e = NativeScalarEccContext(curve, ctx=ctx, with_select_chip=True)
            p = e.assign_point_xyz(ins["x"], ins["y"], ins["z"])
            s = ctx.assign(ins["s"])
            s_z = ins["s_zero"]
            s_norm = ctx.bisec(p.z, s_z, s)
            nzp = _int_from_ins(ins, "nzx", 1), _int_from_ins(ins, "nzy", 1)
            pnz = e.ecc_bisec_to_non_zero_point(
                p, AssignedNonZeroPoint(nzp[0], nzp[1])
            )
            return {"pnz": pnz, "s": s_norm}

        lb, lead = self._limb_params(ecc)
        x0, y0 = sample_pt
        assigned = [AssignedInput("s_zero", 254, s_zero.val)]
        assigned += _int_inputs("nzx", non_zero_p.x, lb, lead)
        assigned += _int_inputs("nzy", non_zero_p.y, lb, lead)
        tmpl = Template.trace(
            build,
            {"x": (254, x0), "y": (254, y0), "z": (1, 0), "s": (254, sample_s)},
            assigned_inputs=assigned,
            n_modulus=ecc.ctx.n,
        )
        self._templates[key] = tmpl
        return tmpl

    def _t_decompose(self, ecc, sample_s_assigned):
        key = "decompose"
        if key in self._templates:
            return self._templates[key]
        curve = self.curve

        def build(ctx, ins):
            e = NativeScalarEccContext(curve, ctx=ctx, with_select_chip=True)
            bits = e.decompose_scalar(ins["s"], 1)
            return [b[0] for b in bits]  # windows-major list of conditions

        tmpl = Template.trace(
            build,
            {},
            assigned_inputs=[AssignedInput("s", 254, sample_s_assigned.val)],
            n_modulus=ecc.ctx.n,
        )
        self._templates[key] = tmpl
        return tmpl

    def _t_cand(self, ecc, a0: AssignedNonZeroPoint, b0: AssignedNonZeroPoint,
                g0: int, sc0: int):
        key = "cand"
        if key in self._templates:
            return self._templates[key]
        curve = self.curve
        lb, lead = self._limb_params(ecc)

        def build(ctx, ins):
            e = NativeScalarEccContext(curve, ctx=ctx, with_select_chip=True)
            a = AssignedNonZeroPoint(_int_from_ins(ins, "ax", 1), _int_from_ins(ins, "ay", 1))
            b = AssignedNonZeroPoint(_int_from_ins(ins, "bx", 1), _int_from_ins(ins, "by", 1))
            s = e.ecc_add_unsafe(a, b)
            r = e.ecc_reduce_non_zero(s)
            e.assign_cache_point_non_zero(r, g0, sc0)
            return r

        assigned = (
            _int_inputs("ax", a0.x, lb, lead)
            + _int_inputs("ay", a0.y, lb, lead)
            + _int_inputs("bx", b0.x, lb, lead)
            + _int_inputs("by", b0.y, lb, lead)
        )
        tmpl = Template.trace(build, {}, assigned_inputs=assigned, n_modulus=ecc.ctx.n)
        tmpl._g0sc = (g0, sc0)
        self._templates[key] = tmpl
        return tmpl

    def _t_window(self, ecc, group_size: int, cands0, bits0, acc0, g0: int):
        tx, ty = acc0.x.times, acc0.y.times
        key = ("win", tx, ty)
        if key in self._templates:
            return self._templates[key]
        curve = self.curve
        lb, lead = self._limb_params(ecc)

        def build(ctx, ins):
            e = NativeScalarEccContext(curve, ctx=ctx, with_select_chip=True)
            bits = [AssignedCondition(ins[f"bit{i}"]) for i in range(group_size)]
            cands = []
            for k in range(1 << group_size):
                x = AssignedInteger(
                    [AssignedValue(_DUMMY, ins[f"c{k}_xl{j}"]) for j in range(3)],
                    AssignedValue(_DUMMY, ins[f"c{k}_xn"]), 1,
                )
                y = AssignedInteger(
                    [AssignedValue(_DUMMY, ins[f"c{k}_yl{j}"]) for j in range(3)],
                    AssignedValue(_DUMMY, ins[f"c{k}_yn"]), 1,
                )
                cands.append(AssignedNonZeroPoint(x, y))
            acc = AssignedNonZeroPoint(
                _int_from_ins(ins, "accx", tx), _int_from_ins(ins, "accy", ty)
            )
            index, ci = e.pick_candidate_non_zero(cands, bits)
            ci = e.assign_selected_point_non_zero(ci, index, g0)
            return e.ecc_add_unsafe(ci, acc)

        # plain (cell-free) inputs: candidate coordinates
        plain = {}
        for k, c in enumerate(cands0):
            for j in range(3):
                plain[f"c{k}_xl{j}"] = (lb + 2, c.x.limbs_le[j].val)
                plain[f"c{k}_yl{j}"] = (lb + 2, c.y.limbs_le[j].val)
            plain[f"c{k}_xn"] = (254, c.x.native.val)
            plain[f"c{k}_yn"] = (254, c.y.native.val)
        # leading limbs are narrower; widths above are safe upper bounds
        for k, c in enumerate(cands0):
            plain[f"c{k}_xl2"] = (lead + 2, c.x.limbs_le[2].val)
            plain[f"c{k}_yl2"] = (lead + 2, c.y.limbs_le[2].val)

        assigned = [
            AssignedInput(f"bit{i}", 1, bits0[i].val) for i in range(group_size)
        ]
        assigned += _int_inputs("accx", acc0.x, lb, lead)
        assigned += _int_inputs("accy", acc0.y, lb, lead)
        tmpl = Template.trace(build, plain, assigned_inputs=assigned, n_modulus=ecc.ctx.n)
        tmpl._g0 = g0
        self._templates[key] = tmpl
        return tmpl

    # ------------------------------------------------------------------
    # build
    # ------------------------------------------------------------------

    def build(self, points, scalars, max_tries: int = 10, seed: Optional[int] = None):
        base_seed = seed if seed is not None else random.SystemRandom().randrange(1 << 62)
        last = None
        for attempt in range(max_tries):
            try:
                return self._attempt(points, scalars, random.Random(base_seed + attempt))
            except UnsafeError as e:
                last = e
        raise last

    def _attempt(self, points, scalars, rng):
        curve = self.curve
        g1 = self.g1
        n_pts = len(points)
        group_size = 5
        assert n_pts % group_size == 0, "batched MSM v1 requires n % 5 == 0"
        n_groups = n_pts // group_size
        assert n_groups % 2 == 0, "batched MSM v1 requires an even group count"

        ecc = NativeScalarEccContext(curve, with_select_chip=True, rng=rng)
        ctx = ecc.ctx
        n = ctx.n

        # ---- scalar setup: shared constants ----
        s_zero = ecc.ecc_assign_constant_zero_scalar()
        non_zero_p = ecc.assign_non_zero_point(g1.generator)

        # ---- phase 1: batched point+scalar assignment ----
        xs = [0 if p is None else p[0] for p in points]
        ys = [0 if p is None else p[1] for p in points]
        zs = [1 if p is None else 0 for p in points]
        sample_pt = g1.generator
        t_assign = self._t_assign(ecc, sample_pt, scalars[0] % curve.r, s_zero, non_zero_p)

        B = n_pts
        inputs = {
            "x": ff.ints_to_limbs(xs, 16),
            "y": ff.ints_to_limbs(ys, 16),
            "z": ff.ints_to_limbs(zs, 16),
            "s": ff.ints_to_limbs([s % curve.r for s in scalars], 16),
        }
        arrs: Dict[str, np.ndarray] = {}
        rows: Dict[str, Tuple] = {}
        _broadcast_scalar_int("nzx", non_zero_p.x, B, arrs, rows)
        _broadcast_scalar_int("nzy", non_zero_p.y, B, arrs, rows)
        arrs["s_zero"] = np.broadcast_to(ff.ints_to_limbs([s_zero.val], 16), (B, 16))
        rows["s_zero"] = (
            s_zero.cell.region, s_zero.cell.col,
            np.full(B, s_zero.cell.row, dtype=np.int64),
        )
        out_assign = t_assign.instantiate(ctx, {**inputs, **arrs}, assigned_rows=rows)

        # ---- phase 2: batched scalar decomposition ----
        t_dec = self._t_decompose(ecc, _unbatch_value(out_assign["s"], 0))
        out_dec = t_dec.instantiate(
            ctx,
            {"s": _leaf_vals(out_assign["s"])},
            assigned_rows={"s": _leaf_rows(out_assign["s"])},
        )
        windows = len(out_dec)

        # ---- scalar setup: random blinding points ----
        r1 = g1.mul(g1.generator, rng.randrange(1, curve.r))
        r2 = g1.mul(g1.generator, rng.randrange(1, curve.r))
        rand_acc = ecc.assign_non_zero_point(r1)
        rand_line = ecc.assign_non_zero_point(r2)
        rand_acc_neg = ecc.ecc_reduce_non_zero(ecc.ecc_neg_non_zero(rand_acc))
        rand_line_neg = ecc.ecc_reduce_non_zero(ecc.ecc_neg_non_zero(rand_line))
        group_prefix = ecc.get_and_increase_msm_prefix()

        # ---- phase 3: candidate precompute (batch over groups) ----
        # host values of points (for candidate host math cross-checks)
        # initial cache rows for candidate 0 (per group, scalar emission)
        for gi in range(n_groups):
            init = rand_line if gi % 2 == 0 else rand_line_neg
            ecc.assign_cache_point_non_zero(init, group_prefix + gi, 0)

        # candidate tables as value/row arrays [n_groups]
        # build per-group candidate 0 arrays (alternating rand_line / neg)
        cand_arrays: List[Dict] = [None] * (1 << group_size)
        cand_rows: List[Dict] = [None] * (1 << group_size)

        def mk_point_arrays(pts_scalar: List[AssignedNonZeroPoint]):
            a, r = {}, {}
            for name, get in (("x", lambda p: p.x), ("y", lambda p: p.y)):
                for j in range(3):
                    cells = [get(p).limbs_le[j].cell for p in pts_scalar]
                    assert all(
                        (c.region, c.col) == (cells[0].region, cells[0].col)
                        for c in cells
                    )
                    a[f"{name}l{j}"] = ff.ints_to_limbs(
                        [get(p).limbs_le[j].val for p in pts_scalar], 16
                    )
                    r[f"{name}l{j}"] = (
                        cells[0].region, cells[0].col,
                        np.array([c.row for c in cells], dtype=np.int64),
                    )
                cells = [get(p).native.cell for p in pts_scalar]
                assert all(
                    (c.region, c.col) == (cells[0].region, cells[0].col) for c in cells
                )
                a[f"{name}n"] = ff.ints_to_limbs([get(p).native.val for p in pts_scalar], 16)
                r[f"{name}n"] = (
                    cells[0].region, cells[0].col,
                    np.array([c.row for c in cells], dtype=np.int64),
                )
            return a, r

        init_pts = [rand_line if gi % 2 == 0 else rand_line_neg for gi in range(n_groups)]
        cand_arrays[0], cand_rows[0] = mk_point_arrays(init_pts)

        # the assigned input points, grouped: chunk[pos] for group gi
        pnz_tree = out_assign["pnz"]

        def chunk_point_arrays(pos: int):
            idx = np.arange(n_groups) * group_size + pos
            a, r = {}, {}
            for name, sub in (("x", "x"), ("y", "y")):
                for j in range(3):
                    leaf = pnz_tree[sub]["limbs"][j]
                    a[f"{name}l{j}"] = _leaf_vals(leaf)[idx]
                    reg, col, rws = _leaf_rows(leaf)
                    r[f"{name}l{j}"] = (reg, col, rws[idx])
                leaf = pnz_tree[sub]["native"]
                a[f"{name}n"] = _leaf_vals(leaf)[idx]
                reg, col, rws = _leaf_rows(leaf)
                r[f"{name}n"] = (reg, col, rws[idx])
            return a, r

        chunk_arrays = [chunk_point_arrays(p) for p in range(group_size)]

        g_arr = group_prefix + np.arange(n_groups, dtype=np.int64)
        t_cand = None
        for i in range(1, 1 << group_size):
            pos = (i & -i).bit_length() - 1
            other = i - (1 << pos)
            if t_cand is None:
                a0 = _unbatch_point_from_arrays(cand_arrays[other], cand_rows[other], 0)
                b0 = _unbatch_point_from_arrays(*chunk_arrays[pos], 0)
                t_cand = self._t_cand(ecc, a0, b0, group_prefix, 1)
            ins = {}
            arows = {}
            for pre, (a, r) in (("a", (cand_arrays[other], cand_rows[other])),
                                ("b", chunk_arrays[pos])):
                for name in ("x", "y"):
                    for j in range(3):
                        ins[f"{pre}{name}_l{j}"] = a[f"{name}l{j}"]
                        arows[f"{pre}{name}_l{j}"] = r[f"{name}l{j}"]
                    ins[f"{pre}{name}_native"] = a[f"{name}n"]
                    arows[f"{pre}{name}_native"] = r[f"{name}n"]
            sel_start = ctx.select_offset
            out_c = t_cand.instantiate(ctx, ins, assigned_rows=arows)
            self._patch_cand_encodes(ctx, t_cand, sel_start, n_groups, g_arr, i)

            a, r = {}, {}
            for name in ("x", "y"):
                for j in range(3):
                    leaf = out_c[name]["limbs"][j]
                    a[f"{name}l{j}"] = _leaf_vals(leaf)
                    r[f"{name}l{j}"] = _leaf_rows(leaf)
                leaf = out_c[name]["native"]
                a[f"{name}n"] = _leaf_vals(leaf)
                r[f"{name}n"] = _leaf_rows(leaf)
            cand_arrays[i], cand_rows[i] = a, r

        # ---- phase 4: window chains (batch over windows) ----
        # bits arrays: bit (window-major) values/rows for scalar j
        bit_vals = []  # [n_pts] of u32[windows,16]
        bit_rows = []
        # all windows' decomposed bits must share (region, col) — the rows
        # below are rebased against window 0's leaf (same uniformity check
        # mk_point_arrays performs; a layout change must fail here, loudly)
        _reg0, _col0, _ = _leaf_rows(out_dec[0])
        for wi in range(windows):
            _r, _c, _ = _leaf_rows(out_dec[wi])
            assert (_r, _c) == (_reg0, _col0), (
                "decompose_scalar bit cells must share (region, col) across windows"
            )
        for j in range(n_pts):
            vals = np.stack([_leaf_vals(out_dec[wi])[j] for wi in range(windows)])
            reg, col, _ = _leaf_rows(out_dec[0])
            rws = np.array(
                [_leaf_rows(out_dec[wi])[2][j] for wi in range(windows)], dtype=np.int64
            )
            bit_vals.append(vals)
            bit_rows.append((reg, col, rws))

        # acc starts at rand_acc_neg broadcast over windows
        acc_arrays, acc_rows_d = {}, {}
        _broadcast_scalar_int("accx", rand_acc_neg.x, windows, acc_arrays, acc_rows_d)
        _broadcast_scalar_int("accy", rand_acc_neg.y, windows, acc_arrays, acc_rows_d)
        acc_times = (1, 1)
        acc_tree = None

        for gi in range(n_groups):
            # template keyed by times signature; trace lazily with lane-0 data
            cands0 = [
                _unbatch_point_from_arrays(cand_arrays[k], cand_rows[k], gi)
                for k in range(1 << group_size)
            ]
            bits0 = [
                AssignedCondition(_unbatch_value(
                    (bit_vals[gi * group_size + i],
                     bit_rows[gi * group_size + i]), 0))
                for i in range(group_size)
            ]
            if acc_tree is None:
                acc0 = AssignedNonZeroPoint(
                    AssignedInteger(list(rand_acc_neg.x.limbs_le), rand_acc_neg.x.native, 1),
                    AssignedInteger(list(rand_acc_neg.y.limbs_le), rand_acc_neg.y.native, 1),
                )
            else:
                acc0 = AssignedNonZeroPoint(
                    AssignedInteger(
                        [_unbatch_value(acc_tree["x"]["limbs"][j], 0) for j in range(3)],
                        _unbatch_value(acc_tree["x"]["native"], 0), acc_times[0]),
                    AssignedInteger(
                        [_unbatch_value(acc_tree["y"]["limbs"][j], 0) for j in range(3)],
                        _unbatch_value(acc_tree["y"]["native"], 0), acc_times[1]),
                )
            tmpl = self._t_window(ecc, group_size, cands0, bits0, acc0, group_prefix + gi)

            ins: Dict[str, np.ndarray] = {}
            arows: Dict[str, Tuple] = {}
            # candidates (plain values, broadcast over windows)
            for k in range(1 << group_size):
                a = cand_arrays[k]
                for j in range(3):
                    ins[f"c{k}_xl{j}"] = np.broadcast_to(a[f"xl{j}"][gi], (windows, 16))
                    ins[f"c{k}_yl{j}"] = np.broadcast_to(a[f"yl{j}"][gi], (windows, 16))
                ins[f"c{k}_xn"] = np.broadcast_to(a["xn"][gi], (windows, 16))
                ins[f"c{k}_yn"] = np.broadcast_to(a["yn"][gi], (windows, 16))
            # bits
            for i in range(group_size):
                ins[f"bit{i}"] = bit_vals[gi * group_size + i]
                arows[f"bit{i}"] = bit_rows[gi * group_size + i]
            # acc
            if acc_tree is None:
                ins.update(acc_arrays)
                arows.update(acc_rows_d)
            else:
                _int_input_arrays("accx", acc_tree["x"], ins, arows)
                _int_input_arrays("accy", acc_tree["y"], ins, arows)

            sel_start = ctx.select_offset
            acc_tree = tmpl.instantiate(ctx, ins, assigned_rows=arows)
            self._patch_window_encodes(ctx, tmpl, sel_start, windows, group_prefix, gi)
            acc_times = (acc_tree["x"]["times"], acc_tree["y"]["times"])

        # ---- phase 5: final accumulation (scalar path) ----
        line_accs = [
            AssignedNonZeroPoint(
                AssignedInteger(
                    [_unbatch_value(acc_tree["x"]["limbs"][j], wi) for j in range(3)],
                    _unbatch_value(acc_tree["x"]["native"], wi), acc_times[0]),
                AssignedInteger(
                    [_unbatch_value(acc_tree["y"]["limbs"][j], wi) for j in range(3)],
                    _unbatch_value(acc_tree["y"]["native"], wi), acc_times[1]),
            )
            for wi in range(windows)
        ]

        acc = rand_acc
        for wi in range(windows):
            acc = ecc.ecc_double_unsafe(acc)
            acc = ecc.ecc_add_unsafe(line_accs[wi], acc)

        accp = ecc.ecc_non_zero_point_downgrade(acc)
        accp = ecc.to_point_with_curvature(accp)
        carry = ecc.ecc_non_zero_point_downgrade(rand_acc_neg)
        res = ecc.ecc_add(accp, carry)
        return ecc, res

    # -- fixed-cell patches: per-instance select encodes --

    @staticmethod
    def _probe_encode(probe, r) -> int:
        v = probe.fix_vals[r, SELECT_FIX_ENCODE]
        return (
            int(v[0]) | (int(v[1]) << 64) | (int(v[2]) << 128) | (int(v[3]) << 192)
        )

    def _patch_cand_encodes(self, ctx, tmpl, sel_start, B, g_arr, sc):
        """Candidate cache rows: encode = (sc<<128) + (g<<64) + off; the probe
        traced with (g0, sc0) — shift per instance (group) and step."""
        probe = tmpl.ctx.records.select
        stride = tmpl.strides[2]
        if stride == 0:
            return
        g0, sc0 = tmpl._g0sc
        n = ctx.n
        tbl = ctx.records.select
        deltas = [((int(g) - g0) << 64) + ((sc - sc0) << 128) for g in g_arr]
        for r in range(stride):
            if not probe.fix_set[r, SELECT_FIX_ENCODE]:
                continue
            v_probe = self._probe_encode(probe, r)
            for i in range(B):
                tbl.fix_vals[sel_start + i * stride + r, SELECT_FIX_ENCODE] = (
                    pack_u64x4((v_probe + deltas[i]) % n)
                )

    def _patch_window_encodes(self, ctx, tmpl, sel_start, B, group_prefix, gi):
        """Window select rows: encode's g differs from the probe's g0 by a
        per-instantiation constant (same for every window lane)."""
        probe = tmpl.ctx.records.select
        stride = tmpl.strides[2]
        if stride == 0:
            return
        delta = ((group_prefix + gi) - tmpl._g0) << 64
        if delta == 0:
            return
        n = ctx.n
        tbl = ctx.records.select
        ar = np.arange(B, dtype=np.int64)
        for r in range(stride):
            if not probe.fix_set[r, SELECT_FIX_ENCODE]:
                continue
            v_probe = self._probe_encode(probe, r)
            rows = sel_start + ar * stride + r
            tbl.fix_vals[rows, SELECT_FIX_ENCODE] = pack_u64x4((v_probe + delta) % n)


def _unbatch_point_from_arrays(a: Dict, r: Dict, lane: int) -> AssignedNonZeroPoint:
    def integer(name):
        limbs = []
        for j in range(3):
            reg, col, rws = r[f"{name}l{j}"]
            limbs.append(
                AssignedValue(
                    Cell(reg, col, int(rws[lane])),
                    ff.limbs_to_int(a[f"{name}l{j}"][lane]),
                )
            )
        reg, col, rws = r[f"{name}n"]
        native = AssignedValue(
            Cell(reg, col, int(rws[lane])), ff.limbs_to_int(a[f"{name}n"][lane])
        )
        return AssignedInteger(limbs, native, 1)

    return AssignedNonZeroPoint(integer("x"), integer("y"))
