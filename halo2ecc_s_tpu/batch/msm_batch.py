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

import os
import random
import sys
import time
from typing import Dict, List, Optional, Tuple

_PROFILE = bool(os.environ.get("HALO2ECC_TPU_PROFILE"))
# PROFILE_SYNC additionally blocks on all queued device work at each mark, so
# per-phase times include device execution (otherwise async dispatch defers
# everything to the drain)
_PROFILE_SYNC = bool(os.environ.get("HALO2ECC_TPU_PROFILE_SYNC"))
# per-step component timing for the first few steps of phases 4/5
_PROFILE_STEPS = int(os.environ.get("HALO2ECC_TPU_PROFILE_STEPS", "0"))


def _phase_mark(label: str, t0: float, sync_obj=None) -> float:
    if _PROFILE:
        if _PROFILE_SYNC and sync_obj is not None:
            import jax

            jax.block_until_ready(sync_obj)
        t = time.perf_counter()
        print(f"# msm phase {label}: {t - t0:.3f}s", file=sys.stderr, flush=True)
        return t
    return t0

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
from ..core.records import SELECT_FIX_ENCODE, mod_add_u64x4, pack_u64x4
from ..kernels import ff_jax as ff
from ..ops.ecc_ops import (
    GeneralScalarEccContext,
    NativeScalarEccContext,
    UnsafeError,
)
from ..utils.curves import G1
from ..utils.fields import PairingCurve, bn254
from .chain_scan import (
    chain_layout,
    discover_cycle,
    outputs_local_cells,
    outputs_nid_map,
    run_chain_scan,
    slice_tree_lanes,
)
from .template import AssignedInput, Template, finalize_deferred, tree_to_numpy

_DUMMY = Cell(Region.BASE, 0, 0)


def _cand_in_name(sel: bool, k: int, coord: str, j) -> str:
    """Window-template input name for candidate k's coord leaf (j=0..2 limb,
    None=native). Select variant uses plain inputs; bisec variant assigned."""
    if sel:
        return f"c{k}_{coord}n" if j is None else f"c{k}_{coord}l{j}"
    return f"c{k}{coord}_native" if j is None else f"c{k}{coord}_l{j}"



def _leaf_vals(leaf) -> np.ndarray:
    return leaf[0]


def _leaf_rows(leaf):
    return leaf[1]


def _unbatch_value(leaf, lane: int) -> AssignedValue:
    vals, (region, col, rows) = leaf
    vals = np.asarray(vals)  # device arrays sync here (trace-time only)
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
    limbs = []
    while f"{prefix}_l{len(limbs)}" in ins:
        limbs.append(ins[f"{prefix}_l{len(limbs)}"])
    native = ins[f"{prefix}_native"]
    return AssignedInteger(limbs, native, times)


def _int_input_arrays(prefix: str, tree, out: Dict, rows: Dict):
    for j in range(len(tree["limbs"])):
        out[f"{prefix}_l{j}"] = _leaf_vals(tree["limbs"][j])
        rows[f"{prefix}_l{j}"] = _leaf_rows(tree["limbs"][j])
    out[f"{prefix}_native"] = _leaf_vals(tree["native"])
    rows[f"{prefix}_native"] = _leaf_rows(tree["native"])


def _broadcast_scalar_int(prefix: str, v: AssignedInteger, B: int, out, rows):
    for j in range(len(v.limbs_le)):
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


def _stack_scalar_int(prefix: str, vs: List[AssignedInteger], reps: int,
                      out, rows):
    """Per-instance AssignedIntegers, each broadcast over `reps` lanes
    (instance-major): lane i*reps+r carries vs[i]. Cells must share
    (region, col) across instances (scalar-path emission guarantees this)."""
    for j in range(len(vs[0].limbs_le)):
        cells = [v.limbs_le[j].cell for v in vs]
        assert all(
            (c.region, c.col) == (cells[0].region, cells[0].col) for c in cells
        )
        out[f"{prefix}_l{j}"] = np.repeat(
            ff.ints_to_limbs([v.limbs_le[j].val for v in vs], 16), reps, axis=0
        )
        rows[f"{prefix}_l{j}"] = (
            cells[0].region, cells[0].col,
            np.repeat(np.array([c.row for c in cells], dtype=np.int64), reps),
        )
    cells = [v.native.cell for v in vs]
    assert all(
        (c.region, c.col) == (cells[0].region, cells[0].col) for c in cells
    )
    out[f"{prefix}_native"] = np.repeat(
        ff.ints_to_limbs([v.native.val for v in vs], 16), reps, axis=0
    )
    rows[f"{prefix}_native"] = (
        cells[0].region, cells[0].col,
        np.repeat(np.array([c.row for c in cells], dtype=np.int64), reps),
    )


class BatchMsm:
    """Reusable batched MSM witness generator for one curve.

    Templates are traced lazily and cached across calls (compiles persist via
    the jax compilation cache)."""

    def __init__(self, curve: Optional[PairingCurve] = None,
                 with_select_chip: bool = True, general_scalar: bool = False):
        """with_select_chip=False is the reference's group-2 variant
        (ecc_chip.rs:91-221): candidates chosen by in-circuit binary bisec
        trees instead of select-chip lookups; group size 2.

        general_scalar=True is the reference's GeneralScalarEccContext
        engine (general_scalar_ecc_chip.rs:93-169): the curve's scalar field
        is non-native (e.g. bls12-381 Fr over bn254 Fr), so scalars are
        AssignedIntegers decomposed by per-limb halving; coordinates use the
        curve's base-field limb schema (4 limbs for bls12-381)."""
        self.curve = curve or bn254()
        self.g1 = G1(self.curve)
        self.general = general_scalar
        if general_scalar:
            assert with_select_chip, "general-scalar engine uses the select chip"
        self.with_select = with_select_chip
        self.group_size = 5 if with_select_chip else 2
        self._templates: Dict[object, Template] = {}
        self._scan_jits: Dict[object, object] = {}
        probe = self._make_ecc()
        self._nl = probe.base_ictx.info.limbs

    def _make_ecc(self, ctx=None, rng=None):
        if self.general:
            return GeneralScalarEccContext(self.curve, ctx=ctx, rng=rng)
        return NativeScalarEccContext(
            self.curve, ctx=ctx, with_select_chip=self.with_select, rng=rng
        )

    def _scalar_limb_params(self, ecc):
        info = ecc.scalar_ictx.info
        return info.limb_bits, info.w_ceil_bits - (info.limbs - 1) * info.limb_bits

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

        general = self.general

        def build(ctx, ins):
            e = self._make_ecc(ctx=ctx)
            p = e.assign_point_xyz(ins["x"], ins["y"], ins["z"])
            if general:
                s = e.scalar_ictx.assign_w(ins["s"])
                s_z = _int_from_ins(ins, "sz", s_zero.times)
            else:
                s = ctx.assign(ins["s"])
                s_z = ins["s_zero"]
            s_norm = e.ecc_bisec_scalar(p.z, s_z, s)
            nzp = _int_from_ins(ins, "nzx", 1), _int_from_ins(ins, "nzy", 1)
            pnz = e.ecc_bisec_to_non_zero_point(
                p, AssignedNonZeroPoint(nzp[0], nzp[1])
            )
            return {"pnz": pnz, "s": s_norm}

        lb, lead = self._limb_params(ecc)
        x0, y0 = sample_pt
        if general:
            slb, slead = self._scalar_limb_params(ecc)
            assigned = _int_inputs("sz", s_zero, slb, slead)
        else:
            assigned = [AssignedInput("s_zero", 254, s_zero.val)]
        assigned += _int_inputs("nzx", non_zero_p.x, lb, lead)
        assigned += _int_inputs("nzy", non_zero_p.y, lb, lead)
        from ..utils.fields import field_bits

        s_bits = field_bits(self.curve.r) if general else 254
        c_bits = 254 if not general else ecc.base_ictx.info.w_ceil_bits
        tmpl = Template.trace(
            build,
            {"x": (c_bits, x0), "y": (c_bits, y0), "z": (1, 0),
             "s": (s_bits, sample_s)},
            assigned_inputs=assigned,
            n_modulus=ecc.ctx.n,
        )
        self._templates[key] = tmpl
        return tmpl

    def _t_decompose(self, ecc, sample_s_assigned):
        key = ("decompose", sample_s_assigned.times) if self.general else "decompose"
        if key in self._templates:
            return self._templates[key]
        general = self.general

        def build(ctx, ins):
            e = self._make_ecc(ctx=ctx)
            s = _int_from_ins(ins, "s", sample_s_assigned.times) if general else ins["s"]
            bits = e.decompose_scalar(s, 1)
            return [b[0] for b in bits]  # windows-major list of conditions

        if general:
            slb, slead = self._scalar_limb_params(ecc)
            assigned = _int_inputs("s", sample_s_assigned, slb, slead)
        else:
            assigned = [AssignedInput("s", 254, sample_s_assigned.val)]
        tmpl = Template.trace(
            build, {}, assigned_inputs=assigned, n_modulus=ecc.ctx.n
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

        sel = self.with_select

        def build(ctx, ins):
            e = self._make_ecc(ctx=ctx)
            a = AssignedNonZeroPoint(_int_from_ins(ins, "ax", 1), _int_from_ins(ins, "ay", 1))
            b = AssignedNonZeroPoint(_int_from_ins(ins, "bx", 1), _int_from_ins(ins, "by", 1))
            s = e.ecc_add_unsafe(a, b)
            r = e.ecc_reduce_non_zero(s)
            if sel:
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
        sel = self.with_select

        nl = self._nl

        def build(ctx, ins):
            e = self._make_ecc(ctx=ctx)
            bits = [AssignedCondition(ins[f"bit{i}"]) for i in range(group_size)]
            cands = []
            for k in range(1 << group_size):
                if sel:
                    x = AssignedInteger(
                        [AssignedValue(_DUMMY, ins[f"c{k}_xl{j}"]) for j in range(nl)],
                        AssignedValue(_DUMMY, ins[f"c{k}_xn"]), 1,
                    )
                    y = AssignedInteger(
                        [AssignedValue(_DUMMY, ins[f"c{k}_yl{j}"]) for j in range(nl)],
                        AssignedValue(_DUMMY, ins[f"c{k}_yn"]), 1,
                    )
                    cands.append(AssignedNonZeroPoint(x, y))
                else:
                    cands.append(AssignedNonZeroPoint(
                        _int_from_ins(ins, f"c{k}x", 1),
                        _int_from_ins(ins, f"c{k}y", 1),
                    ))
            acc = AssignedNonZeroPoint(
                _int_from_ins(ins, "accx", tx), _int_from_ins(ins, "accy", ty)
            )
            if sel:
                index, ci = e.pick_candidate_non_zero(cands, bits)
                ci = e.assign_selected_point_non_zero(ci, index, g0)
            else:
                # group-2 variant: in-circuit binary bisec tree
                # (ecc_chip.rs:160-163, 913-933) — no select rows
                ci = e.bisec_candidate_non_zero(cands, bits)
            return e.ecc_add_unsafe(ci, acc)

        plain = {}
        assigned = []
        if sel:
            # select variant: candidate coordinates are plain (cell-free)
            # inputs — the select-chip lookup provides the binding
            for k, c in enumerate(cands0):
                for j in range(nl):
                    plain[f"c{k}_xl{j}"] = (lb + 2, c.x.limbs_le[j].val)
                    plain[f"c{k}_yl{j}"] = (lb + 2, c.y.limbs_le[j].val)
                plain[f"c{k}_xn"] = (254, c.x.native.val)
                plain[f"c{k}_yn"] = (254, c.y.native.val)
            # leading limbs are narrower; widths above are safe upper bounds
            for k, c in enumerate(cands0):
                plain[f"c{k}_xl{nl - 1}"] = (lead + 2, c.x.limbs_le[nl - 1].val)
                plain[f"c{k}_yl{nl - 1}"] = (lead + 2, c.y.limbs_le[nl - 1].val)
        else:
            # bisec variant: candidate cells feed gates directly, so they
            # are assigned inputs (placeholder cells -> real candidate rows)
            for k, c in enumerate(cands0):
                assigned += _int_inputs(f"c{k}x", c.x, lb, lead)
                assigned += _int_inputs(f"c{k}y", c.y, lb, lead)

        assigned += [
            AssignedInput(f"bit{i}", 1, bits0[i].val) for i in range(group_size)
        ]
        assigned += _int_inputs("accx", acc0.x, lb, lead)
        assigned += _int_inputs("accy", acc0.y, lb, lead)
        tmpl = Template.trace(build, plain, assigned_inputs=assigned, n_modulus=ecc.ctx.n)
        tmpl._g0 = g0
        self._templates[key] = tmpl
        return tmpl

    def _t_final_step(self, ecc, acc0: AssignedNonZeroPoint, line0: AssignedNonZeroPoint):
        """One window of the final accumulation: acc = 2*acc + line (the
        double-and-add scan over windows, ecc_chip.rs:355-362), traced as a
        B=1 template so the whole tail runs on device instead of the host
        scalar path. Keyed by the acc/line times signature."""
        key = ("fin", acc0.x.times, acc0.y.times, line0.x.times, line0.y.times)
        if key in self._templates:
            return self._templates[key]
        curve = self.curve
        lb, lead = self._limb_params(ecc)
        sel = self.with_select

        def build(ctx, ins):
            e = self._make_ecc(ctx=ctx)
            acc = AssignedNonZeroPoint(
                _int_from_ins(ins, "accx", acc0.x.times),
                _int_from_ins(ins, "accy", acc0.y.times),
            )
            line = AssignedNonZeroPoint(
                _int_from_ins(ins, "linex", line0.x.times),
                _int_from_ins(ins, "liney", line0.y.times),
            )
            acc = e.ecc_double_unsafe(acc)
            return e.ecc_add_unsafe(line, acc)

        assigned = (
            _int_inputs("accx", acc0.x, lb, lead)
            + _int_inputs("accy", acc0.y, lb, lead)
            + _int_inputs("linex", line0.x, lb, lead)
            + _int_inputs("liney", line0.y, lb, lead)
        )
        tmpl = Template.trace(build, {}, assigned_inputs=assigned, n_modulus=ecc.ctx.n)
        self._templates[key] = tmpl
        return tmpl

    def _final_step_fn(self, tmpl, n_inst: int, windows: int):
        """One jitted final-accumulation step: gathers window wi's line point
        per instance from the stacked leaf tensors and runs the B=n_inst
        double-add emitter — one dispatch per window, no host values."""
        cache = getattr(tmpl, "_fin_steps", None)
        if cache is None:
            cache = tmpl._fin_steps = {}
        key = (n_inst, windows)
        if key in cache:
            return cache[key]
        import jax

        raw = tmpl.slab_value_emitter_raw()
        base = np.arange(n_inst, dtype=np.int32) * windows

        def step(line_stacked, acc_ins, wi):
            ins = dict(acc_ins)
            for name, arr in line_stacked.items():
                ins[name] = arr[base + wi]
            return raw(ins)

        from ..utils.export_cache import cached_jit

        cache[key] = cached_jit(
            step, f"{tmpl.digest()}|finstep|{n_inst}|{windows}", "finstep"
        )
        return cache[key]

    def _window_step_fn(self, tmpl, group_size: int, geom: Tuple[int, int, int, int]):
        """One jitted window step: per-lane gathers of group gi's candidates
        and bits from the stacked tensors (lane = (instance, window),
        instance-major), chained acc inputs slotted in, then the template's
        slab/value emitter — all in a single device dispatch.

        geom = (n_inst, windows, npp, ngp)."""
        cache = getattr(tmpl, "_step_fns", None)
        if cache is None:
            cache = tmpl._step_fns = {}
        if geom in cache:
            return cache[geom]
        import jax
        import jax.numpy as jnp

        raw = tmpl.slab_value_emitter_raw()
        K = 1 << group_size
        sel = self.with_select
        nl = self._nl
        n_inst, windows, npp, ngp = geom
        base_grp = np.repeat(np.arange(n_inst, dtype=np.int32) * ngp, windows)
        base_pts = np.repeat(np.arange(n_inst, dtype=np.int32) * npp, windows)
        w_idx = np.tile(np.arange(windows, dtype=np.int32), n_inst)

        def step(cand_stacked, bit_stack, acc_ins, gi):
            ins = dict(acc_ins)
            gidx = base_grp + gi  # [n_lanes]
            for coord in ("x", "y"):
                for j in range(nl):
                    v = cand_stacked[f"{coord}l{j}"]  # [K, n_groups, 16]
                    g = v[:, gidx]  # [K, n_lanes, 16]
                    for k in range(K):
                        ins[_cand_in_name(sel, k, coord, j)] = g[k]
                v = cand_stacked[f"{coord}n"]
                g = v[:, gidx]
                for k in range(K):
                    ins[_cand_in_name(sel, k, coord, None)] = g[k]
            for b in range(group_size):
                ins[f"bit{b}"] = bit_stack[w_idx, base_pts + gi * group_size + b]
            return raw(ins)

        from ..utils.export_cache import cached_jit

        cache[geom] = cached_jit(
            step, f"{tmpl.digest()}|winstep|{sel}|{nl}|{geom}", "winstep"
        )
        return cache[geom]

    # ------------------------------------------------------------------
    # chain scans: the window-chain (phase 4, over groups) and final-
    # accumulation (phase 5, over windows) chains are sequential template
    # chains whose per-step layout is decided by the accumulator's
    # overflow-`times` signature — a deterministic, eventually-periodic
    # sequence. Once every template on the chain is cached (after one
    # per-step build), the periodic part runs as ONE lax.scan dispatch
    # (batch/chain_scan.py) instead of one dispatch + one host instantiate
    # per step. Bit-exact with the per-step path, including row layout.
    # ------------------------------------------------------------------

    def _plan_chain_scan(self, key_of, first_times, remaining: int,
                         min_chunks: int = 2):
        """Walk cached templates from `first_times` for `remaining` steps.
        Returns (tail, L, C, per-step templates) if the whole chain is
        cached and its periodic part has >= min_chunks full cycles."""
        keys, tmpls = [], []
        t = first_times
        for _ in range(remaining):
            tm = self._templates.get(key_of(t))
            if tm is None:
                return None
            keys.append(t)
            tmpls.append(tm)
            t = (tm.outputs.x.times, tm.outputs.y.times)
        cyc = discover_cycle(keys)
        if cyc is None:
            return None
        tail, L = cyc
        # run one extra full cycle per-step before scanning: the scan's
        # first chunk chains its acc rows from the pre-scan step, which must
        # be the SAME template as cycle[L-1] (identical output cells)
        tail += L
        C = (remaining - tail) // L
        if C < min_chunks:
            return None
        return tail, L, C, tmpls, keys

    def _run_chain_scan_segmented(
        self, ctx, cycle, s0: int, L: int, C: int, B: int,
        gather, gather_args,
        acc_ins: Dict, acc_arows: Dict, step_arows, deferred,
        cache_key, patch=None,
    ):
        """_run_chain_scan_phase in segments of at most
        HALO2ECC_TPU_SCAN_CHUNK cycles per dispatch (default 16): bounds the
        compiled scan program's output size and the live slab footprint; at
        most two distinct segment sizes compile. Returns the last step's
        output tree."""
        cmax = int(os.environ.get("HALO2ECC_TPU_SCAN_CHUNK", "16"))
        done = 0
        tree = None
        while done < C:
            c = min(cmax, C - done)
            tree, _ = self._run_chain_scan_phase(
                ctx, cycle, s0 + done * L, L, c, B,
                gather, gather_args, acc_ins, acc_arows, step_arows,
                deferred, cache_key + (c,), patch=patch,
            )
            acc_ins, acc_arows = {}, {}
            _int_input_arrays("accx", tree["x"], acc_ins, acc_arows)
            _int_input_arrays("accy", tree["y"], acc_ins, acc_arows)
            done += c
        return tree

    def _run_chain_scan_phase(
        self, ctx, cycle, s0: int, L: int, C: int, B: int,
        gather, gather_args,
        acc_ins: Dict, acc_arows: Dict, step_arows, deferred,
        cache_key, patch=None,
    ):
        """Run C*L chained steps as one scan dispatch + L instantiates.

        cycle: L templates (cycle[l] serves steps s0 + c*L + l).
        gather(args, j, l): step-varying plain/assigned input VALUES.
        The chained acc inputs ("accx_l0".."accy_native") are the scan
        carry; their rows chain from the previous step's output cells.
        acc_ins/acc_arows: the chain inputs at step s0 (values [B,16] +
        (region, col, rows[B])); the pre-scan step must have used the same
        template as cycle[L-1] (the planner guarantees this).
        step_arows(j, l): per-step assigned rows for non-chained assigned
        inputs (name -> (region, col, rows[B])).
        patch(tmpl, l, sel_starts, lane_steps): optional fixed-cell patch
        hook per position (select encodes).

        Returns (last step's output tree, per-position output trees)."""
        carry_maps = [outputs_nid_map(t.outputs) for t in cycle]
        carry_names = tuple(carry_maps[0].keys())
        assert all(tuple(m.keys()) == carry_names for m in carry_maps)

        base_starts = ctx.offsets()
        strides = [t.strides for t in cycle]
        per_pos_rows, totals = chain_layout(base_starts, strides, C, B)
        ctx.apply_offset_diff(totals)

        import jax.numpy as jnp

        carry0 = {name: jnp.asarray(acc_ins[name]) for name in carry_names}
        per_position, flags, _final = run_chain_scan(
            cycle, gather, gather_args, carry_names, carry_maps, carry0,
            s0, C, jit_cache=self._scan_jits, cache_key=cache_key,
        )

        # previous-step output cell locations (for chaining acc rows)
        local_cells = [outputs_local_cells(t.outputs) for t in cycle]

        out_trees = []
        for l in range(L):
            tmpl = cycle[l]
            arows: Dict[str, Tuple] = {}
            # step-varying assigned inputs (bits / line rows)
            sv = [step_arows(s0 + c * L + l, l) for c in range(C)]
            for name in sv[0]:
                reg, col, _ = sv[0][name]
                rows = np.concatenate(
                    [np.asarray(s[name][2], dtype=np.int64) for s in sv]
                )
                arows[name] = (reg, col, rows)
            # chained acc rows
            prev_l = l - 1 if l > 0 else L - 1
            prev_cells = local_cells[prev_l]
            prev_rows = per_pos_rows[prev_l]
            for name, (reg, pcol, prow) in prev_cells.items():
                ridx = int(reg)
                if l > 0:
                    rows = prev_rows[ridx] + prow
                else:
                    # chunk 0 chains from the pre-scan acc; chunks 1.. from
                    # the previous chunk's last position
                    areg, acol, arows0 = acc_arows[name]
                    assert (areg, acol) == (reg, pcol), (
                        "chain input cells must match the cycle's output cells"
                    )
                    rows = np.empty(C * B, dtype=np.int64)
                    rows[:B] = np.asarray(arows0, dtype=np.int64)
                    if C > 1:
                        rows[B:] = prev_rows[ridx][: (C - 1) * B] + prow
                arows[name] = (reg, pcol, rows)

            slabs_l, outvals_l = per_position[l]
            tree = tmpl.instantiate(
                ctx, {}, assigned_rows=arows, deferred=deferred,
                _precomputed=(slabs_l, outvals_l, flags), _B=C * B,
                instance_rows=per_pos_rows[l],
            )
            if patch is not None:
                # AFTER instantiate: it tiles the probe's fixed pattern over
                # the slab rows, which would overwrite patched encodes
                lane_steps = s0 + np.repeat(
                    np.arange(C, dtype=np.int64), B
                ) * L + l
                patch(tmpl, l, per_pos_rows[l][2], lane_steps)
            out_trees.append(tree)

        last = slice_tree_lanes(out_trees[L - 1], (C - 1) * B, C * B)
        return last, out_trees

    # ------------------------------------------------------------------
    # build
    # ------------------------------------------------------------------

    def build(self, points, scalars, max_tries: int = 10, seed: Optional[int] = None,
              device: bool = False, mesh=None, write_tables: bool = True,
              smoke_windows: Optional[int] = None):
        """device=True runs the value pipeline fully device-resident: every
        phase's witness values AND advice slabs are computed by jitted
        emitters chaining device arrays (no host round-trip between phases);
        one fetch at the end writes the Records and checks divergence flags.
        The resulting Records are bit-exact with device=False.

        mesh (implies device=True): a jax.sharding.Mesh with one axis. Each
        phase's batch dimension (points / groups / windows — the reference's
        own parallel axes, ecc_chip.rs:150-204) is sharded over it via
        NamedSharding; XLA GSPMD partitions every emitter so each device
        computes and materialises its own slab shard, inserting ICI
        collectives where phases reshard (candidate gathers, the replicated
        candidate table, and the final window-accumulator all-gather).
        GSPMD is used rather than shard_map because the window axis (254)
        is not divisible by typical mesh sizes; uneven partitioning is
        handled by the compiler. Records are bit-exact with mesh=None.

        smoke_windows (dryrun/debug only): truncate the accumulation phases
        to the LOWEST smoke_windows 1-bit windows (the decompose still
        constrains every scalar bit, so all emitted rows stay gate-valid).
        The result point is the MSM of (scalar mod 2^smoke_windows) — EXACT
        whenever every scalar < 2^smoke_windows. Used by __graft_entry__'s
        multi-chip dryrun to exercise every sharded phase without the full
        254-window tail on a CPU host. Native-scalar engine only."""
        if smoke_windows is not None:
            assert not self.general, "smoke_windows: native-scalar engine only"
        self._smoke_windows = smoke_windows
        base_seed = seed if seed is not None else random.SystemRandom().randrange(1 << 62)
        if mesh is not None:
            device = True
        self._write_tables = write_tables
        # arbitrary n: pad with (generator, scalar 0) pairs up to a multiple
        # of the group size with an even group count. A zero scalar's bits
        # are all 0, so every window selects only the group's blinding
        # candidate (candidates[0]), which telescopes out — the padded MSM
        # computes the same point with uniform template shapes (the
        # reference instead emits short last groups + an odd-parity
        # correction, ecc_chip.rs:248-252,355-362; padding is the
        # shape-static TPU equivalent).
        n_orig = len(points)
        assert n_orig >= 1
        gs = self.group_size
        pad = (-n_orig) % gs
        if ((n_orig + pad) // gs) % 2 and smoke_windows is None:
            # an odd group count leaves one untelescoped blinding line point
            # per window; smoke configs accept that (the caller corrects the
            # expected point by (2^W - 1) * rand_line, see dryrun)
            pad += gs
        if pad:
            points = list(points) + [self.g1.generator] * pad
            scalars = list(scalars) + [0] * pad
        last = None
        for attempt in range(max_tries):
            try:
                return self._attempt(
                    points, scalars, random.Random(base_seed + attempt), device,
                    mesh,
                )
            except UnsafeError as e:
                last = e
        raise last

    def build_many(self, instances, max_tries: int = 10,
                   seed: Optional[int] = None, device: bool = True,
                   write_tables: bool = True):
        """Witness B independent MSMs of a common size in ONE pipeline run:
        every phase's lane axis carries (instance x its own axis), so the
        fixed per-dispatch launch cost (the dominant cost on remote-attached
        TPUs) is amortised across instances — the proof-batching serving
        shape. instances: [(points, scalars), ...], equal lengths.

        Returns (ecc, [result point per instance]); blinding is fresh per
        instance (one UnsafeError lane retries the whole batch)."""
        assert instances and all(
            len(p) == len(instances[0][0]) for p, _ in instances
        ), "instances must share a common size"
        assert self.with_select, "multi-instance uses the select-chip engine"
        self._smoke_windows = None
        base_seed = seed if seed is not None else random.SystemRandom().randrange(1 << 62)
        self._write_tables = write_tables
        gs = self.group_size
        n_orig = len(instances[0][0])
        pad = (-n_orig) % gs
        if ((n_orig + pad) // gs) % 2:
            pad += gs
        flat_pts: List = []
        flat_scalars: List[int] = []
        for pts, scs in instances:
            flat_pts.extend(list(pts) + [self.g1.generator] * pad)
            flat_scalars.extend(list(scs) + [0] * pad)
        last = None
        for attempt in range(max_tries):
            try:
                return self._attempt(
                    flat_pts, flat_scalars, random.Random(base_seed + attempt),
                    device, None, n_inst=len(instances),
                )
            except UnsafeError as e:
                last = e
        raise last

    def _attempt(self, points, scalars, rng, device: bool = False, mesh=None,
                 n_inst: int = 1):
        curve = self.curve
        g1 = self.g1
        n_pts = len(points)  # TOTAL points across instances
        group_size = self.group_size
        assert n_pts % n_inst == 0
        npp = n_pts // n_inst  # points per instance
        assert npp % group_size == 0  # build() pads to this shape
        ngp = npp // group_size  # groups per instance
        n_groups = n_pts // group_size  # total groups (phase-3 lane count)
        assert ngp % 2 == 0 or getattr(self, "_smoke_windows", None)
        if n_inst > 1:
            assert mesh is None and self.with_select

        ecc = self._make_ecc(rng=rng)
        ctx = ecc.ctx
        if device and not getattr(self, "_write_tables", True):
            # serving mode: host Records (masks/fixed/advice) are never
            # materialised — layout is static per shape and a server caches
            # it from one write_tables=True build; the per-build work is the
            # device value/slab pipeline + cursor bookkeeping only
            ctx.serving_mode = True
        nl = self._nl  # base-field limb count (3 bn254 / 4 bls12-381)
        n = ctx.n
        deferred = [] if device else None
        if device:
            import jax.numpy as jnp
            xp = jnp
        else:
            xp = np
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            n_dev = mesh.devices.size

            def pad_up(b: int) -> int:
                return -(-b // n_dev) * n_dev

            def pad0(arr, b_pad: int):
                """Pad the batch dim to b_pad lanes by repeating lane 0
                (valid values -> no spurious divergence flags; dropped at
                finalize via _Deferred.lanes)."""
                b = arr.shape[0]
                if b == b_pad:
                    return arr
                fill = xp.broadcast_to(arr[:1], (b_pad - b,) + arr.shape[1:])
                return xp.concatenate([xp.asarray(arr), fill], axis=0)

            def shard0(arr, b_pad: Optional[int] = None):
                """Pad (if needed) and place with the batch dim sharded."""
                if b_pad is not None:
                    arr = pad0(arr, b_pad)
                spec = P(axis, *([None] * (np.ndim(arr) - 1)))
                return jax.device_put(arr, NamedSharding(mesh, spec))

            def replicate(arr):
                return jax.device_put(arr, NamedSharding(mesh, P()))
        else:
            pad_up = lambda b: b
            pad0 = lambda arr, b_pad: arr
            shard0 = lambda arr, b_pad=None: arr
            replicate = lambda arr: arr

        # ---- scalar setup: shared constants ----
        s_zero = ecc.ecc_assign_constant_zero_scalar()
        non_zero_p = ecc.assign_non_zero_point(g1.generator)

        _t0 = time.perf_counter()
        # ---- phase 1: batched point+scalar assignment ----
        xs = [0 if p is None else p[0] for p in points]
        ys = [0 if p is None else p[1] for p in points]
        zs = [1 if p is None else 0 for p in points]
        sample_pt = g1.generator
        t_assign = self._t_assign(ecc, sample_pt, scalars[0] % curve.r, s_zero, non_zero_p)

        B = n_pts
        # coordinate input arrays carry the full base-field width (381-bit
        # bls coordinates need 24 u16 limbs; bn254 fits the default 16)
        Lw = max(16, ff.n_limbs_for(curve.p)) if self.general else 16
        inputs = {
            "x": ff.ints_to_limbs(xs, Lw),
            "y": ff.ints_to_limbs(ys, Lw),
            "z": ff.ints_to_limbs(zs, 16),
            "s": ff.ints_to_limbs([s % curve.r for s in scalars], 16),
        }
        arrs: Dict[str, np.ndarray] = {}
        rows: Dict[str, Tuple] = {}
        _broadcast_scalar_int("nzx", non_zero_p.x, B, arrs, rows)
        _broadcast_scalar_int("nzy", non_zero_p.y, B, arrs, rows)
        if self.general:
            _broadcast_scalar_int("sz", s_zero, B, arrs, rows)
        else:
            arrs["s_zero"] = np.broadcast_to(
                ff.ints_to_limbs([s_zero.val], 16), (B, 16)
            )
            rows["s_zero"] = (
                s_zero.cell.region, s_zero.cell.col,
                np.full(B, s_zero.cell.row, dtype=np.int64),
            )
        n_pad = pad_up(n_pts)
        if mesh is not None:
            inputs = {k: shard0(np.ascontiguousarray(v), n_pad) for k, v in inputs.items()}
            arrs = {k: shard0(np.ascontiguousarray(v), n_pad) for k, v in arrs.items()}
        out_assign = t_assign.instantiate(
            ctx, {**inputs, **arrs}, assigned_rows=rows, deferred=deferred,
            _B=n_pts if mesh is not None else None,
        )

        _t0 = _phase_mark("1 assign", _t0, deferred and deferred[-1].slabs)
        # ---- phase 2: batched scalar decomposition ----
        if self.general:
            # scalars are AssignedIntegers (bls Fr over bn254 Fr); the
            # decompose template is keyed by the incoming times signature
            dkey = ("decompose", out_assign["s"]["times"])
            if dkey in self._templates:
                t_dec = self._templates[dkey]
            else:
                t_dec = self._t_decompose(ecc, _unbatch_integer(out_assign["s"], 0))
            dec_ins: Dict[str, np.ndarray] = {}
            dec_rows: Dict[str, Tuple] = {}
            _int_input_arrays("s", out_assign["s"], dec_ins, dec_rows)
            out_dec = t_dec.instantiate(
                ctx, dec_ins, assigned_rows=dec_rows, deferred=deferred,
                _B=n_pts if mesh is not None else None,
            )
        else:
            if "decompose" in self._templates:
                t_dec = self._templates["decompose"]
            else:
                t_dec = self._t_decompose(ecc, _unbatch_value(out_assign["s"], 0))
            out_dec = t_dec.instantiate(
                ctx,
                {"s": _leaf_vals(out_assign["s"])},
                assigned_rows={"s": _leaf_rows(out_assign["s"])},
                deferred=deferred,
                _B=n_pts if mesh is not None else None,
            )
        smoke = getattr(self, "_smoke_windows", None)
        if smoke:
            # keep the LOWEST `smoke` windows: out_dec[0] is the MSB window
            # (decompose_scalar reverses, ecc_ops.py); the dropped high
            # windows stay fully constrained by the decompose rows
            out_dec = out_dec[-smoke:]
        windows = len(out_dec)

        # ---- scalar setup: random blinding points (fresh per instance) ----
        rand_accs, rand_lines, rand_acc_negs, rand_line_negs = [], [], [], []
        for _ in range(n_inst):
            r1 = g1.mul(g1.generator, rng.randrange(1, curve.r))
            r2 = g1.mul(g1.generator, rng.randrange(1, curve.r))
            ra = ecc.assign_non_zero_point(r1)
            rl = ecc.assign_non_zero_point(r2)
            rand_accs.append(ra)
            rand_lines.append(rl)
            rand_acc_negs.append(ecc.ecc_reduce_non_zero(ecc.ecc_neg_non_zero(ra)))
            rand_line_negs.append(ecc.ecc_reduce_non_zero(ecc.ecc_neg_non_zero(rl)))
        rand_acc, rand_line = rand_accs[0], rand_lines[0]
        rand_acc_neg, rand_line_neg = rand_acc_negs[0], rand_line_negs[0]
        # host values of the blinding line points (smoke configs with an odd
        # group count need them to compute the expected point)
        self._last_rand_lines = [
            (ecc.base_ictx.get_w_bn(p.x) % curve.p,
             ecc.base_ictx.get_w_bn(p.y) % curve.p)
            for p in rand_lines
        ]
        group_prefix = ecc.get_and_increase_msm_prefix() if self.with_select else 0

        def _grp_init(gi: int):
            """Candidate-0 blinding point for global group gi (parity resets
            per instance)."""
            i, g = divmod(gi, ngp)
            return rand_lines[i] if g % 2 == 0 else rand_line_negs[i]

        _t0 = _phase_mark("2 decompose", _t0, deferred and deferred[-1].slabs)
        # ---- phase 3: candidate precompute (batch over groups) ----
        # host values of points (for candidate host math cross-checks)
        # initial cache rows for candidate 0 (per group, scalar emission)
        if self.with_select:
            for gi in range(n_groups):
                ecc.assign_cache_point_non_zero(_grp_init(gi), group_prefix + gi, 0)

        # candidate tables as value/row arrays [n_groups]
        # build per-group candidate 0 arrays (alternating rand_line / neg)
        cand_arrays: List[Dict] = [None] * (1 << group_size)
        cand_rows: List[Dict] = [None] * (1 << group_size)

        def mk_point_arrays(pts_scalar: List[AssignedNonZeroPoint]):
            a, r = {}, {}
            for name, get in (("x", lambda p: p.x), ("y", lambda p: p.y)):
                for j in range(nl):
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

        init_pts = [_grp_init(gi) for gi in range(n_groups)]
        cand_arrays[0], cand_rows[0] = mk_point_arrays(init_pts)
        g_pad = pad_up(n_groups)
        if mesh is not None:
            cand_arrays[0] = {k: shard0(v, g_pad) for k, v in cand_arrays[0].items()}

        # the assigned input points, grouped: chunk[pos] for group gi
        pnz_tree = out_assign["pnz"]

        def chunk_point_arrays(pos: int):
            idx = np.arange(n_groups) * group_size + pos
            a, r = {}, {}
            for name, sub in (("x", "x"), ("y", "y")):
                for j in range(nl):
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
        if mesh is not None:
            chunk_arrays = [
                ({k: shard0(v, g_pad) for k, v in a.items()}, r)
                for (a, r) in chunk_arrays
            ]

        g_arr = group_prefix + np.arange(n_groups, dtype=np.int64)
        t_cand = None
        for i in range(1, 1 << group_size):
            pos = (i & -i).bit_length() - 1
            other = i - (1 << pos)
            if t_cand is None:
                if "cand" in self._templates:
                    t_cand = self._templates["cand"]
                else:
                    a0 = _unbatch_point_from_arrays(
                        cand_arrays[other], cand_rows[other], 0
                    )
                    b0 = _unbatch_point_from_arrays(*chunk_arrays[pos], 0)
                    t_cand = self._t_cand(ecc, a0, b0, group_prefix, 1)
            ins = {}
            arows = {}
            for pre, (a, r) in (("a", (cand_arrays[other], cand_rows[other])),
                                ("b", chunk_arrays[pos])):
                for name in ("x", "y"):
                    for j in range(nl):
                        ins[f"{pre}{name}_l{j}"] = a[f"{name}l{j}"]
                        arows[f"{pre}{name}_l{j}"] = r[f"{name}l{j}"]
                    ins[f"{pre}{name}_native"] = a[f"{name}n"]
                    arows[f"{pre}{name}_native"] = r[f"{name}n"]
            sel_start = ctx.select_offset
            out_c = t_cand.instantiate(
                ctx, ins, assigned_rows=arows, deferred=deferred,
                _B=n_groups if mesh is not None else None,
            )
            self._patch_cand_encodes(ctx, t_cand, sel_start, n_groups, g_arr, i)

            a, r = {}, {}
            for name in ("x", "y"):
                for j in range(nl):
                    leaf = out_c[name]["limbs"][j]
                    a[f"{name}l{j}"] = _leaf_vals(leaf)
                    r[f"{name}l{j}"] = _leaf_rows(leaf)
                leaf = out_c[name]["native"]
                a[f"{name}n"] = _leaf_vals(leaf)
                r[f"{name}n"] = _leaf_rows(leaf)
            cand_arrays[i], cand_rows[i] = a, r

        _t0 = _phase_mark("3 candidates", _t0, deferred and deferred[-1].slabs)
        # ---- phase 4: window chains (batch over windows) ----
        # stacked bit arrays: [windows, n_pts, 16] values + [windows, n_pts]
        # rows. All windows' bits must share (region, col) — the rows below
        # are rebased against window 0's leaf (same uniformity check
        # mk_point_arrays performs; a layout change must fail here, loudly)
        _reg0, _col0, _ = _leaf_rows(out_dec[0])
        for wi in range(windows):
            _r, _c, _ = _leaf_rows(out_dec[wi])
            assert (_r, _c) == (_reg0, _col0), (
                "decompose_scalar bit cells must share (region, col) across windows"
            )
        bit_stack = xp.stack([_leaf_vals(out_dec[wi]) for wi in range(windows)])
        w_pad = pad_up(windows)
        if mesh is not None:
            bit_stack = shard0(bit_stack, w_pad)  # windows axis over the mesh
        rws_stack = np.stack(
            [np.asarray(_leaf_rows(out_dec[wi])[2], dtype=np.int64) for wi in range(windows)]
        )

        # phase-4/5 lane geometry: lane l = (instance, window) with
        # instance-major order; per-lane gather bases map a step's group
        # index to each lane's own candidate/bit slices
        n_lanes = n_inst * windows
        base_grp = np.repeat(np.arange(n_inst, dtype=np.int64) * ngp, windows)
        base_pts = np.repeat(np.arange(n_inst, dtype=np.int64) * npp, windows)
        w_idx = np.tile(np.arange(windows, dtype=np.int64), n_inst)

        # acc starts at each instance's rand_acc_neg broadcast over windows
        acc_arrays, acc_rows_d = {}, {}
        _stack_scalar_int("accx", [p.x for p in rand_acc_negs], windows,
                          acc_arrays, acc_rows_d)
        _stack_scalar_int("accy", [p.y for p in rand_acc_negs], windows,
                          acc_arrays, acc_rows_d)
        if mesh is not None:
            acc_arrays = {
                k: shard0(np.ascontiguousarray(v), w_pad) for k, v in acc_arrays.items()
            }
        acc_times = (1, 1)
        acc_tree = None

        _cand_names = tuple(
            f"{c}l{j}" for c in ("x", "y") for j in range(nl)
        ) + ("xn", "yn")
        if device:
            cand_stacked = {
                nm: xp.stack([cand_arrays[k][nm] for k in range(1 << group_size)])
                for nm in _cand_names
            }
            if mesh is not None:
                # every device needs every group's candidates inside the
                # window steps: replicate once (one ICI all-gather)
                cand_stacked = {k: replicate(v) for k, v in cand_stacked.items()}

        # scan plan: once every window template is cached (after one
        # per-step build), the periodic part of the group chain runs as one
        # lax.scan dispatch instead of n_groups dispatches + instantiates.
        # The phase-4 scan body (4 full window templates) crashes the axon
        # remote TPU worker's compiler; default-on only off-TPU until the
        # toolchain handles it (opt in via HALO2ECC_TPU_SCAN_P4=1).
        import jax as _jax

        _p4_ok = (
            os.environ.get("HALO2ECC_TPU_SCAN_P4") == "1"
            or _jax.devices()[0].platform not in ("tpu",)
        )
        scan4 = None
        if (device and mesh is None and _p4_ok
                and not os.environ.get("HALO2ECC_TPU_NO_SCAN")):
            scan4 = self._plan_chain_scan(
                lambda t: ("win", t[0], t[1]), acc_times, ngp
            )

        # the chain has ngp steps: step j processes group j of EVERY
        # instance at once (lane = (instance, window))
        gi = 0
        while gi < ngp:
            if scan4 is not None and gi == scan4[0]:
                s0, L4, C4, _tmpls4, keys4 = scan4
                cycle4 = _tmpls4[s0 : s0 + L4]
                acc_ins_s, acc_arows_s = {}, {}
                _int_input_arrays("accx", acc_tree["x"], acc_ins_s, acc_arows_s)
                _int_input_arrays("accy", acc_tree["y"], acc_ins_s, acc_arows_s)

                K = 1 << group_size
                sel = self.with_select
                _bg32 = base_grp.astype(np.int32)
                _bp32 = base_pts.astype(np.int32)
                _wi32 = w_idx.astype(np.int32)

                def gather4(args, j, l):
                    cand_st, bits_st = args
                    ins = {}
                    gidx = _bg32 + j
                    for coord in ("x", "y"):
                        for jj in range(nl):
                            g = cand_st[f"{coord}l{jj}"][:, gidx]  # [K, n_lanes, 16]
                            for k in range(K):
                                ins[_cand_in_name(sel, k, coord, jj)] = g[k]
                        g = cand_st[f"{coord}n"][:, gidx]
                        for k in range(K):
                            ins[_cand_in_name(sel, k, coord, None)] = g[k]
                    for i in range(group_size):
                        ins[f"bit{i}"] = bits_st[
                            _wi32, _bp32 + j * group_size + i
                        ]
                    return ins

                def step_arows4(j, l):
                    out = {
                        f"bit{i}": (
                            _reg0, _col0,
                            rws_stack[w_idx, base_pts + j * group_size + i],
                        )
                        for i in range(group_size)
                    }
                    if not sel:
                        # bisec variant: candidate cells are assigned inputs
                        # (no select-chip binding); n_inst == 1 here (guarded
                        # in _attempt) so step j's candidates sit at one row
                        # shared by every window lane
                        for k in range(K):
                            r = cand_rows[k]
                            for coord in ("x", "y"):
                                for jj in range(nl):
                                    reg, col, rws = r[f"{coord}l{jj}"]
                                    out[_cand_in_name(False, k, coord, jj)] = (
                                        reg, col,
                                        np.full(n_lanes, rws[j], dtype=np.int64),
                                    )
                                reg, col, rws = r[f"{coord}n"]
                                out[_cand_in_name(False, k, coord, None)] = (
                                    reg, col,
                                    np.full(n_lanes, rws[j], dtype=np.int64),
                                )
                    return out

                def patch4(tmpl, l, sel_starts, lane_steps):
                    # lane_steps holds the chunk step index repeated per
                    # lane; each lane's group id adds its instance base
                    self._patch_window_encodes_lanes(
                        ctx, tmpl, sel_starts,
                        (group_prefix + np.tile(base_grp, len(lane_steps) // n_lanes)
                         + lane_steps) - tmpl._g0,
                    )

                acc_tree = self._run_chain_scan_segmented(
                    ctx, cycle4, s0, L4, C4, n_lanes,
                    gather4, (cand_stacked, bit_stack),
                    acc_ins_s, acc_arows_s, step_arows4, deferred,
                    cache_key=("p4", tuple(keys4[s0 : s0 + L4]),
                               n_lanes, n_inst, group_size),
                    patch=patch4,
                )
                acc_times = (
                    cycle4[-1].outputs.x.times, cycle4[-1].outputs.y.times
                )
                gi += C4 * L4
                scan4 = None
                continue
            # template keyed by times signature; traced lazily with lane-0
            # data ONLY on a cache miss (tracing syncs device values)
            key = ("win", acc_times[0], acc_times[1])
            if key in self._templates:
                tmpl = self._templates[key]
            else:
                cands0 = [
                    _unbatch_point_from_arrays(cand_arrays[k], cand_rows[k], gi)
                    for k in range(1 << group_size)
                ]
                bits0 = [
                    AssignedCondition(_unbatch_value(
                        (bit_stack[:, gi * group_size + i],
                         (_reg0, _col0, rws_stack[:, gi * group_size + i])), 0))
                    for i in range(group_size)
                ]
                if acc_tree is None:
                    acc0 = AssignedNonZeroPoint(
                        AssignedInteger(
                            list(rand_acc_neg.x.limbs_le), rand_acc_neg.x.native, 1
                        ),
                        AssignedInteger(
                            list(rand_acc_neg.y.limbs_le), rand_acc_neg.y.native, 1
                        ),
                    )
                else:
                    acc0 = AssignedNonZeroPoint(
                        AssignedInteger(
                            [_unbatch_value(acc_tree["x"]["limbs"][j], 0) for j in range(nl)],
                            _unbatch_value(acc_tree["x"]["native"], 0), acc_times[0]),
                        AssignedInteger(
                            [_unbatch_value(acc_tree["y"]["limbs"][j], 0) for j in range(nl)],
                            _unbatch_value(acc_tree["y"]["native"], 0), acc_times[1]),
                    )
                tmpl = self._t_window(
                    ecc, group_size, cands0, bits0, acc0, group_prefix + gi
                )

            arows: Dict[str, Tuple] = {}
            for i in range(group_size):
                arows[f"bit{i}"] = (
                    _reg0, _col0,
                    rws_stack[w_idx, base_pts + gi * group_size + i],
                )
            if acc_tree is None:
                acc_ins = dict(acc_arrays)
                arows.update(acc_rows_d)
            else:
                acc_ins = {}
                _int_input_arrays("accx", acc_tree["x"], acc_ins, arows)
                _int_input_arrays("accy", acc_tree["y"], acc_ins, arows)

            sel_start = ctx.select_offset
            if device:
                # per-step jitted gather wrapper: candidate/bit gathers
                # happen inside ONE dispatch per step
                geom = (n_inst, w_pad if mesh is not None else windows, npp, ngp)
                step_fn = self._window_step_fn(tmpl, group_size, geom)
                if not self.with_select:
                    for k in range(1 << group_size):
                        r = cand_rows[k]
                        for coord in ("x", "y"):
                            for j in range(nl):
                                reg, col, rws = r[f"{coord}l{j}"]
                                arows[_cand_in_name(False, k, coord, j)] = (
                                    reg, col, np.full(n_lanes, rws[gi], dtype=np.int64)
                                )
                            reg, col, rws = r[f"{coord}n"]
                            arows[_cand_in_name(False, k, coord, None)] = (
                                reg, col, np.full(n_lanes, rws[gi], dtype=np.int64)
                            )
                res = step_fn(
                    cand_stacked, bit_stack, acc_ins, np.uint32(gi)
                )
                acc_tree = tmpl.instantiate(
                    ctx, {}, assigned_rows=arows, deferred=deferred,
                    _precomputed=res, _B=n_lanes,
                )
            else:
                ins: Dict[str, np.ndarray] = dict(acc_ins)
                gidx = base_grp + gi
                for k in range(1 << group_size):
                    a = cand_arrays[k]
                    for coord in ("x", "y"):
                        for j in range(nl):
                            ins[_cand_in_name(self.with_select, k, coord, j)] = (
                                np.asarray(a[f"{coord}l{j}"])[gidx]
                            )
                        ins[_cand_in_name(self.with_select, k, coord, None)] = (
                            np.asarray(a[f"{coord}n"])[gidx]
                        )
                    if not self.with_select:
                        r = cand_rows[k]
                        for coord in ("x", "y"):
                            for j in range(nl):
                                reg, col, rws = r[f"{coord}l{j}"]
                                arows[_cand_in_name(False, k, coord, j)] = (
                                    reg, col, np.full(n_lanes, rws[gi], dtype=np.int64)
                                )
                            reg, col, rws = r[f"{coord}n"]
                            arows[_cand_in_name(False, k, coord, None)] = (
                                reg, col, np.full(n_lanes, rws[gi], dtype=np.int64)
                            )
                for i in range(group_size):
                    ins[f"bit{i}"] = np.asarray(bit_stack)[
                        w_idx, base_pts + gi * group_size + i
                    ]
                acc_tree = tmpl.instantiate(ctx, ins, assigned_rows=arows)
            lane_gids = base_grp + gi
            self._patch_window_encodes_lanes(
                ctx, tmpl,
                sel_start + np.arange(n_lanes, dtype=np.int64) * tmpl.strides[2],
                (group_prefix + lane_gids) - tmpl._g0,
            )
            acc_times = (acc_tree["x"]["times"], acc_tree["y"]["times"])
            gi += 1

        _t0 = _phase_mark("4 windows", _t0, deferred and deferred[-1].slabs)

        # ---- phase 5: final accumulation (double-and-add over windows) ----
        if device and smoke:
            # smoke tail (dryrun): the sequential double-add over the few
            # smoke windows has trivial lane count (n_inst=1) — drain the
            # device pipeline here and run it through the ordinary scalar
            # chip ops (the device=False branch below). Avoids compiling the
            # per-times-signature "fin" templates, which dominate a cold
            # CPU-mesh dryrun (~2min each on a 4-core host) while adding no
            # sharding coverage (phase-5 inputs are replicated anyway).
            if mesh is not None:
                # still exercise the EC window-accumulator all-gather
                for coord in ("x", "y"):
                    t = acc_tree[coord]
                    t["limbs"] = [(replicate(v), rc) for (v, rc) in t["limbs"]]
                    t["native"] = (replicate(t["native"][0]), t["native"][1])
            finalize_deferred(deferred, write=getattr(self, "_write_tables", True))
            acc_tree = tree_to_numpy(acc_tree)
            device = False
        if device:
            if mesh is not None:
                # EC window-accumulator aggregation: all-gather the window
                # partial points' coordinate limb vectors over ICI so every
                # device holds the full set for the sequential tail
                for coord in ("x", "y"):
                    t = acc_tree[coord]
                    t["limbs"] = [(replicate(v), rc) for (v, rc) in t["limbs"]]
                    t["native"] = (replicate(t["native"][0]), t["native"][1])
            # device tail: per-window B=1 final-step templates chained on
            # device (the host scalar loop costs ~10ms/op; this is one
            # dispatch per window and joins the single pipeline drain)
            line_stacked, line_rows = {}, {}
            for coord, pre in (("x", "linex"), ("y", "liney")):
                t = acc_tree[coord]
                for j in range(nl):
                    line_stacked[f"{pre}_l{j}"] = _leaf_vals(t["limbs"][j])
                    line_rows[f"{pre}_l{j}"] = _leaf_rows(t["limbs"][j])
                line_stacked[f"{pre}_native"] = _leaf_vals(t["native"])
                line_rows[f"{pre}_native"] = _leaf_rows(t["native"])
            line_times = acc_times

            acc5_ins, acc5_rows = {}, {}
            _stack_scalar_int("accx", [p.x for p in rand_accs], 1,
                              acc5_ins, acc5_rows)
            _stack_scalar_int("accy", [p.y for p in rand_accs], 1,
                              acc5_ins, acc5_rows)
            acc5_times = (rand_acc.x.times, rand_acc.y.times)
            acc5_tree = None
            base_line = np.arange(n_inst, dtype=np.int64) * windows

            # scan plan for the 254-step double-add tail (one dispatch for
            # the periodic part once all "fin" templates are cached)
            scan5 = None
            if mesh is None and not os.environ.get("HALO2ECC_TPU_NO_SCAN"):
                _lt = line_times
                scan5 = self._plan_chain_scan(
                    lambda t: ("fin", t[0], t[1], _lt[0], _lt[1]),
                    acc5_times, windows,
                )

            wi = 0
            while wi < windows:
                if scan5 is not None and wi == scan5[0]:
                    s0, L5, C5, _tmpls5, keys5 = scan5
                    cycle5 = _tmpls5[s0 : s0 + L5]
                    acc_ins_s, acc_arows_s = {}, {}
                    _int_input_arrays("accx", acc5_tree["x"], acc_ins_s, acc_arows_s)
                    _int_input_arrays("accy", acc5_tree["y"], acc_ins_s, acc_arows_s)

                    _bl32 = base_line.astype(np.int32)

                    def gather5(args, j, l):
                        return {
                            name: arr[_bl32 + j] for name, arr in args.items()
                        }

                    def step_arows5(j, l):
                        return {
                            name: (reg, col, rws[base_line + j])
                            for name, (reg, col, rws) in line_rows.items()
                        }

                    acc5_tree = self._run_chain_scan_segmented(
                        ctx, cycle5, s0, L5, C5, n_inst,
                        gather5, line_stacked,
                        acc_ins_s, acc_arows_s, step_arows5, deferred,
                        cache_key=("p5", tuple(keys5[s0 : s0 + L5]),
                                   n_inst, line_times),
                    )
                    acc5_times = (
                        cycle5[-1].outputs.x.times, cycle5[-1].outputs.y.times
                    )
                    # refresh the chained VALUE inputs for any leftover
                    # per-step iterations (they read acc5_ins)
                    acc5_ins = {}
                    _d2: Dict = {}
                    _int_input_arrays("accx", acc5_tree["x"], acc5_ins, _d2)
                    _int_input_arrays("accy", acc5_tree["y"], acc5_ins, _d2)
                    wi += C5 * L5
                    scan5 = None
                    continue
                key = ("fin", acc5_times[0], acc5_times[1],
                       line_times[0], line_times[1])
                if key in self._templates:
                    tmpl = self._templates[key]
                else:
                    if acc5_tree is None:
                        acc0 = AssignedNonZeroPoint(
                            AssignedInteger(
                                list(rand_acc.x.limbs_le), rand_acc.x.native,
                                rand_acc.x.times),
                            AssignedInteger(
                                list(rand_acc.y.limbs_le), rand_acc.y.native,
                                rand_acc.y.times),
                        )
                    else:
                        acc0 = AssignedNonZeroPoint(
                            AssignedInteger(
                                [_unbatch_value(acc5_tree["x"]["limbs"][j], 0)
                                 for j in range(nl)],
                                _unbatch_value(acc5_tree["x"]["native"], 0),
                                acc5_times[0]),
                            AssignedInteger(
                                [_unbatch_value(acc5_tree["y"]["limbs"][j], 0)
                                 for j in range(nl)],
                                _unbatch_value(acc5_tree["y"]["native"], 0),
                                acc5_times[1]),
                        )
                    line0 = AssignedNonZeroPoint(
                        AssignedInteger(
                            [_unbatch_value(
                                (line_stacked[f"linex_l{j}"],
                                 line_rows[f"linex_l{j}"]), wi)
                             for j in range(nl)],
                            _unbatch_value(
                                (line_stacked["linex_native"],
                                 line_rows["linex_native"]), wi),
                            line_times[0]),
                        AssignedInteger(
                            [_unbatch_value(
                                (line_stacked[f"liney_l{j}"],
                                 line_rows[f"liney_l{j}"]), wi)
                             for j in range(nl)],
                            _unbatch_value(
                                (line_stacked["liney_native"],
                                 line_rows["liney_native"]), wi),
                            line_times[1]),
                    )
                    tmpl = self._t_final_step(ecc, acc0, line0)
                step_fn = self._final_step_fn(tmpl, n_inst, windows)
                if _PROFILE_STEPS and wi < _PROFILE_STEPS:
                    import jax as _j

                    _ts = time.perf_counter()
                    res5 = step_fn(line_stacked, acc5_ins, np.uint32(wi))
                    _td = time.perf_counter()
                    _j.block_until_ready(res5)
                    _te = time.perf_counter()
                    print(
                        f"# p5 step {wi}: dispatch {_td-_ts:.3f}s "
                        f"device {_te-_td:.3f}s",
                        file=sys.stderr, flush=True,
                    )
                else:
                    res5 = step_fn(line_stacked, acc5_ins, np.uint32(wi))
                arows5 = {}
                for name, (reg, col, rws) in line_rows.items():
                    arows5[name] = (reg, col, rws[base_line + wi])
                if acc5_tree is None:
                    arows5.update(acc5_rows)
                else:
                    _tmp = {}
                    _int_input_arrays("accx", acc5_tree["x"], _tmp, arows5)
                    _int_input_arrays("accy", acc5_tree["y"], _tmp, arows5)
                _ti = time.perf_counter() if _PROFILE_STEPS and wi < _PROFILE_STEPS else 0
                acc5_tree = tmpl.instantiate(
                    ctx, {}, assigned_rows=arows5, deferred=deferred,
                    _precomputed=res5, _B=n_inst,
                )
                if _ti:
                    print(
                        f"# p5 step {wi}: instantiate {time.perf_counter()-_ti:.3f}s",
                        file=sys.stderr, flush=True,
                    )
                acc5_ins = {}
                _d = {}
                _int_input_arrays("accx", acc5_tree["x"], acc5_ins, _d)
                _int_input_arrays("accy", acc5_tree["y"], acc5_ins, _d)
                acc5_times = (acc5_tree["x"]["times"], acc5_tree["y"]["times"])
                wi += 1

            _t0 = _phase_mark("5 final dispatch", _t0, deferred and deferred[-1].slabs)
            # drain the WHOLE pipeline: one flags check + slab fetch
            # (write_tables=False keeps the advice slabs device-resident)
            finalize_deferred(deferred, write=getattr(self, "_write_tables", True))
            acc5_tree = tree_to_numpy(acc5_tree)
            _t0 = _phase_mark("drain", _t0)
            accs = [
                AssignedNonZeroPoint(
                    AssignedInteger(
                        [_unbatch_value(acc5_tree["x"]["limbs"][j], i) for j in range(nl)],
                        _unbatch_value(acc5_tree["x"]["native"], i), acc5_times[0]),
                    AssignedInteger(
                        [_unbatch_value(acc5_tree["y"]["limbs"][j], i) for j in range(nl)],
                        _unbatch_value(acc5_tree["y"]["native"], i), acc5_times[1]),
                )
                for i in range(n_inst)
            ]
        else:
            accs = []
            for inst in range(n_inst):
                line_accs = [
                    AssignedNonZeroPoint(
                        AssignedInteger(
                            [_unbatch_value(acc_tree["x"]["limbs"][j],
                                            inst * windows + wi) for j in range(nl)],
                            _unbatch_value(acc_tree["x"]["native"],
                                           inst * windows + wi), acc_times[0]),
                        AssignedInteger(
                            [_unbatch_value(acc_tree["y"]["limbs"][j],
                                            inst * windows + wi) for j in range(nl)],
                            _unbatch_value(acc_tree["y"]["native"],
                                           inst * windows + wi), acc_times[1]),
                    )
                    for wi in range(windows)
                ]

                acc_i = rand_accs[inst]
                for wi in range(windows):
                    acc_i = ecc.ecc_double_unsafe(acc_i)
                    acc_i = ecc.ecc_add_unsafe(line_accs[wi], acc_i)
                accs.append(acc_i)

        _t0 = _phase_mark("5 final", _t0)
        results = []
        for inst, acc_i in enumerate(accs):
            accp = ecc.ecc_non_zero_point_downgrade(acc_i)
            accp = ecc.to_point_with_curvature(accp)
            carry = ecc.ecc_non_zero_point_downgrade(rand_acc_negs[inst])
            results.append(ecc.ecc_add(accp, carry))
        return ecc, (results if n_inst > 1 else results[0])

    # -- fixed-cell patches: per-instance select encodes (vectorized block
    # rewrites of the probe's encode column; no per-row Python loops) --

    @staticmethod
    def _encode_patch_rows(tmpl) -> np.ndarray:
        """Template-local select rows whose encode fixed cell is set (cached)."""
        if getattr(tmpl, "_enc_rows", None) is None:
            probe = tmpl.ctx.records.select
            stride = tmpl.strides[2]
            tmpl._enc_rows = np.nonzero(probe.fix_set[:stride, SELECT_FIX_ENCODE])[0]
        return tmpl._enc_rows

    def _patch_cand_encodes(self, ctx, tmpl, sel_start, B, g_arr, sc):
        """Candidate cache rows: encode = (sc<<128) + (g<<64) + off; the probe
        traced with (g0, sc0) — shift per instance (group) and step."""
        stride = tmpl.strides[2]
        enc_rows = self._encode_patch_rows(tmpl)
        if stride == 0 or enc_rows.size == 0:
            return
        if getattr(ctx, "serving_mode", False):
            return  # fixed encode columns are static layout; not materialised
        probe = tmpl.ctx.records.select
        g0, sc0 = tmpl._g0sc
        v_probe = probe.fix_vals[enc_rows, SELECT_FIX_ENCODE]  # [R, 4]
        dg = np.asarray(g_arr, dtype=np.int64) - g0
        assert np.all(dg >= 0) and sc >= sc0, "encode deltas must be non-negative"
        deltas = np.zeros((B, 4), dtype=np.uint64)
        deltas[:, 1] = dg.astype(np.uint64)  # (g - g0) << 64
        deltas[:, 2] = np.uint64(sc - sc0)  # (sc - sc0) << 128
        new = mod_add_u64x4(v_probe[None, :, :], deltas[:, None, :], ctx.n)  # [B,R,4]
        rows = (
            sel_start
            + np.arange(B, dtype=np.int64)[:, None] * stride
            + enc_rows[None, :]
        ).reshape(-1)
        ctx.records.select.fix_vals[rows, SELECT_FIX_ENCODE] = new.reshape(-1, 4)

    def _patch_window_encodes_lanes(self, ctx, tmpl, sel_starts, delta_gs):
        """Scanned form of _patch_window_encodes: per-lane select-slab start
        rows + per-lane group deltas (lanes span multiple chain steps)."""
        stride = tmpl.strides[2]
        enc_rows = self._encode_patch_rows(tmpl)
        if stride == 0 or enc_rows.size == 0:
            return
        if getattr(ctx, "serving_mode", False):
            return  # fixed encode columns are static layout; not materialised
        delta_gs = np.asarray(delta_gs, dtype=np.int64)
        assert np.all(delta_gs >= 0), "encode deltas must be non-negative"
        if not delta_gs.any():
            return  # probe pattern already carries these encodes
        probe = tmpl.ctx.records.select
        v_probe = probe.fix_vals[enc_rows, SELECT_FIX_ENCODE]  # [R, 4]
        deltas = np.zeros((len(sel_starts), 4), dtype=np.uint64)
        deltas[:, 1] = delta_gs.astype(np.uint64)  # (g - g0) << 64
        new = mod_add_u64x4(v_probe[None, :, :], deltas[:, None, :], ctx.n)
        rows = (
            np.asarray(sel_starts, dtype=np.int64)[:, None] + enc_rows[None, :]
        ).reshape(-1)
        ctx.records.select.fix_vals[rows, SELECT_FIX_ENCODE] = new.reshape(-1, 4)

    def _patch_window_encodes(self, ctx, tmpl, sel_start, B, group_prefix, gi):
        """Window select rows: encode's g differs from the probe's g0 by a
        per-instantiation constant (same for every window lane)."""
        stride = tmpl.strides[2]
        enc_rows = self._encode_patch_rows(tmpl)
        if stride == 0 or enc_rows.size == 0:
            return
        if getattr(ctx, "serving_mode", False):
            return  # fixed encode columns are static layout; not materialised
        delta_g = (group_prefix + gi) - tmpl._g0
        if delta_g == 0:
            return
        assert delta_g > 0, "encode deltas must be non-negative"
        probe = tmpl.ctx.records.select
        v_probe = probe.fix_vals[enc_rows, SELECT_FIX_ENCODE]  # [R, 4]
        delta = np.zeros(4, dtype=np.uint64)
        delta[1] = np.uint64(delta_g)
        new = mod_add_u64x4(v_probe, delta[None, :], ctx.n)  # [R, 4]
        rows = (
            sel_start
            + np.arange(B, dtype=np.int64)[:, None] * stride
            + enc_rows[None, :]
        ).reshape(-1)
        ctx.records.select.fix_vals[rows, SELECT_FIX_ENCODE] = np.broadcast_to(
            new[None, :, :], (B, enc_rows.size, 4)
        ).reshape(-1, 4)


def _unbatch_point_from_arrays(a: Dict, r: Dict, lane: int) -> AssignedNonZeroPoint:
    def integer(name):
        limbs = []
        for j in range(sum(1 for k in a if k.startswith(f"{name}l"))):
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
