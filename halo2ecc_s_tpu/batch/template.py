"""Witness templates: trace ordinary chip code once with symbolic values,
instantiate for B lanes with device-computed values.

trace_template() runs a builder against a capture-enabled Context; the probe
trace yields (a) the fixed/constant cell pattern, (b) the advice cells whose
values are symbolic (captured as tape nodes), (c) copy-constraint pairs,
(d) per-instance row strides. instantiate() bulk-copies the pattern into B
row slabs, evaluates the tape on device, scatters value blocks, and rebases
permutations — including cross-template chaining through "assigned inputs"
(placeholder cells resolved to caller-provided row arrays).
"""

from __future__ import annotations

import os

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from ..core.assign import (
    AssignedCondition,
    AssignedInteger,
    AssignedNonZeroPoint,
    AssignedPoint,
    AssignedValue,
    Cell,
    Region,
)
from ..core.context import Context
from ..core.records import RegionTable, Records
from ..kernels import ff_jax as ff
from ..ops.ecc_ops import UnsafeError
from .evaluator import build_evaluator
from .symbolic import SymVal, Tape


class _CaptureTable(RegionTable):
    """RegionTable that records symbolic advice writes as (row, col, node)."""

    def __init__(self, n_adv, n_fix, cap=1 << 10):
        super().__init__(n_adv, n_fix, cap)
        self.captures: List[Tuple[int, int, int]] = []

    def write_adv(self, row, col, val):
        if isinstance(val, SymVal):
            self.captures.append((row, col, val.nid))
            super().write_adv(row, col, val.v0 % val.tape.n)
        else:
            super().write_adv(row, col, val)

    def write_fix(self, row, col, val):
        assert not isinstance(val, SymVal), "fixed cells must be trace constants"
        super().write_fix(row, col, val)


class _CaptureRecords(Records):
    def __init__(self):
        from ..core.records import (
            FIXED_COLUMNS,
            RANGE_ADV_COLUMNS,
            RANGE_FIX_COLUMNS,
            SELECT_ADV_COLUMNS,
            SELECT_FIX_COLUMNS,
            VAR_COLUMNS,
        )

        self.base = _CaptureTable(VAR_COLUMNS, FIXED_COLUMNS)
        self.range = _CaptureTable(RANGE_ADV_COLUMNS, RANGE_FIX_COLUMNS)
        self.select = _CaptureTable(SELECT_ADV_COLUMNS, SELECT_FIX_COLUMNS)
        self.permutations = []
        self.permutation_blocks = []


@dataclass
class AssignedInput:
    """Declaration for a template input that is an already-assigned value
    (chains templates: the cell is a placeholder rebased at instantiation)."""

    name: str
    bits: int
    v0: int
    region: Region = Region.BASE
    col: int = 0


@dataclass
class _CapturedOut:
    region: Region
    col: int
    row: int  # template-local
    nid: int


class Template:
    def __init__(self, n_modulus: int):
        self.n = n_modulus
        self.tape = Tape(n_modulus)
        self.ctx: Optional[Context] = None
        self.strides: Tuple[int, int, int] = (0, 0, 0)
        self.outputs = None  # pytree with AssignedValue leaves
        self._eval = None
        self._placeholder_cells: Dict[Cell, str] = {}

    # -- tracing --

    @classmethod
    def trace(
        cls,
        build: Callable,
        inputs: Dict[str, Tuple[int, int]],
        assigned_inputs: Optional[List[AssignedInput]] = None,
        n_modulus: Optional[int] = None,
    ) -> "Template":
        """build(ctx, ins) runs chip code; ins maps names to SymVal or (for
        assigned inputs) AssignedValue-with-placeholder-cell.

        inputs: name -> (bits, sample_v0).
        """
        from ..utils.fields import BN254_FR

        t = cls(n_modulus or BN254_FR)
        ctx = Context(t.n, _CaptureRecords())
        t.ctx = ctx

        ins: Dict[str, object] = {}
        for name, (bits, v0) in inputs.items():
            ins[name] = t.tape.input(name, v0, bits)
        for k, ai in enumerate(assigned_inputs or []):
            sym = t.tape.input(ai.name, ai.v0, ai.bits)
            cell = Cell(ai.region, ai.col, -(k + 1))  # placeholder row < 0
            t._placeholder_cells[cell] = ai.name
            ins[ai.name] = AssignedValue(cell, sym)

        t.outputs = build(ctx, ins)
        t.strides = ctx.offsets()
        return t

    # -- instantiation --

    def _roots(self) -> List[int]:
        roots = []
        for tbl in (self.ctx.records.base, self.ctx.records.range, self.ctx.records.select):
            roots.extend(nid for (_, _, nid) in tbl.captures)
        for leaf in _iter_leaves(self.outputs):
            if isinstance(leaf.val, SymVal):
                roots.append(leaf.val.nid)
        for nid, _ in self.tape.assume_equal_const:
            roots.append(nid)
        for nid, _ in self.tape.assume_checks:
            roots.append(nid)
        return sorted(set(roots))

    def _validate_input_widths(self, inputs: Dict[str, np.ndarray]):
        """Raise if a host input array is wider than its declared bits — the
        evaluator truncates to the declared limb count, so oversized values
        would otherwise silently corrupt witnesses."""
        declared = {name: bits for (_, name, bits) in self.tape.inputs}
        for name, arr in inputs.items():
            bits = declared.get(name)
            if bits is None or not isinstance(arr, np.ndarray):
                continue
            L = (bits + 15) // 16
            if arr.shape[-1] > L and np.any(arr[..., L:]):
                raise ValueError(
                    f"input '{name}' has values wider than its declared {bits} bits"
                )
            rem = bits % 16
            if rem and np.any(arr[..., L - 1] >> rem):
                raise ValueError(
                    f"input '{name}' top limb exceeds declared {bits} bits"
                )

    def evaluator(self):
        if self._eval is None:
            fuse = bool(os.environ.get("HALO2ECC_TPU_PALLAS_FUSE"))
            self._eval = jax.jit(
                build_evaluator(self.tape, tuple(self._roots()), fuse_pallas_modmul=fuse)
            )
        return self._eval

    # -- fully device-resident emission (no host transfer) --

    def device_emitter_raw(self):
        """Unjitted emission fn (for wrapping in shard_map; see
        parallel/mesh.py)."""
        self.device_emitter()
        return self._dev_emit_raw

    def device_emitter(self):
        """Returns a jitted fn(inputs) -> {region: u32[B, stride, n_adv, 16]}
        materialising each instance's advice slab in device memory. Constant
        advice cells come from the probe pattern; fixed columns are identical
        for every instance (static circuit data) and stay host-side.

        This is the full TPU witness path: values AND table layout live in
        HBM, where a device-side prover would consume them.

        Input contract: numpy inputs are validated against declared widths
        before dispatch; callers passing device arrays (e.g. bench.py's jitted
        generator, shard_map via device_emitter_raw) must themselves guarantee
        the declared widths — oversized values are truncated by the evaluator.
        """
        if getattr(self, "_dev_emit", None) is not None:
            return self._dev_emit

        import jax.numpy as jnp

        probe = self.ctx.records
        strides = self.strides
        roots = tuple(self._roots())
        fuse = bool(os.environ.get("HALO2ECC_TPU_PALLAS_FUSE"))
        ev = build_evaluator(self.tape, roots, fuse_pallas_modmul=fuse)

        region_info = []
        for ridx, ptbl in enumerate([probe.base, probe.range, probe.select]):
            stride = strides[ridx]
            if stride == 0:
                region_info.append(None)
                continue
            # constant advice pattern as u32 16-bit limbs
            const = np.zeros((stride, ptbl.n_adv, 16), dtype=np.uint32)
            u64 = ptbl.adv_vals[:stride]
            for j in range(4):
                for k in range(4):
                    const[..., 4 * j + k] = (
                        (u64[..., j] >> np.uint64(16 * k)) & np.uint64(0xFFFF)
                    ).astype(np.uint32)
            region_info.append((stride, ptbl.n_adv, const, list(ptbl.captures)))

        def emit(inputs):
            out = ev(inputs)
            B = next(iter(inputs.values())).shape[0]
            tables = {}
            for ridx, info in enumerate(region_info):
                if info is None:
                    continue
                stride, n_adv, const, captures = info
                tbl = jnp.broadcast_to(
                    jnp.asarray(const), (B, stride, n_adv, 16)
                )
                for (row, col, nid) in captures:
                    v = out[nid]
                    if v.shape[-1] < 16:
                        v = jnp.concatenate(
                            [v, jnp.zeros(v.shape[:-1] + (16 - v.shape[-1],), jnp.uint32)],
                            axis=-1,
                        )
                    tbl = tbl.at[:, row, col, :].set(v[..., :16])
                tables[ridx] = tbl
            return tables

        import jax

        self._dev_emit_raw = emit
        jitted = jax.jit(emit)

        def checked(inputs):
            # validate host-resident (numpy) inputs against declared widths;
            # device arrays / tracers are the caller's contract (validating
            # them would force a host sync per dispatch) — see device_emitter
            # docstring.
            self._validate_input_widths(inputs)
            return jitted(inputs)

        self._dev_emit = checked
        return self._dev_emit

    def instantiate(
        self,
        ctx: Context,
        inputs: Dict[str, np.ndarray],
        assigned_rows: Optional[Dict[str, Tuple[Region, int, np.ndarray]]] = None,
        instance_rows: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    ):
        """Emit B instances. inputs: name -> u32[B, limbs]. assigned_rows maps
        assigned-input names to their actual (region, col, rows[B]).

        instance_rows optionally gives each instance's absolute slab start per
        region (default: consecutive slabs from the current cursors, which are
        then advanced; with explicit rows the caller manages cursors — used
        e.g. to interleave instances group-major like the reference layout).

        Returns the output pytree with each AssignedValue leaf replaced by
        (values u32[B, 16-limb], (region, col, rows[B])).
        """
        B = next(iter(inputs.values())).shape[0]
        rec = ctx.records
        probe = self.ctx.records
        strides = self.strides
        ar = np.arange(B, dtype=np.int64)

        if instance_rows is None:
            starts = ctx.offsets()
            slab0 = tuple(starts[r] + ar * strides[r] for r in range(3))
            ctx.apply_offset_diff(tuple(B * s for s in strides))
        else:
            slab0 = tuple(np.asarray(x, dtype=np.int64) for x in instance_rows)

        # 1. bulk-copy the probe pattern (fixed + constant advice + masks)
        for ridx, (tbl, ptbl) in enumerate(
            [(rec.base, probe.base), (rec.range, probe.range), (rec.select, probe.select)]
        ):
            stride = strides[ridx]
            if stride == 0:
                continue
            end = int(slab0[ridx].max()) + stride
            tbl.ensure(end)
            tbl.bump_height(end)
            rows = (
                slab0[ridx][:, None] + np.arange(stride, dtype=np.int64)[None, :]
            ).reshape(-1)
            tbl.adv_vals[rows] = np.tile(ptbl.adv_vals[:stride], (B, 1, 1))
            tbl.adv_set[rows] = np.tile(ptbl.adv_set[:stride], (B, 1))
            tbl.fix_vals[rows] = np.tile(ptbl.fix_vals[:stride], (B, 1, 1))
            tbl.fix_set[rows] = np.tile(ptbl.fix_set[:stride], (B, 1))

        # 2. evaluate the tape (after validating arrays fit declared widths —
        # the evaluator truncates to the declared limb count, so oversized
        # values would silently corrupt witnesses)
        self._validate_input_widths(inputs)
        out = self.evaluator()(inputs)
        out = {k: np.asarray(v) for k, v in out.items()}

        # 3. divergence checks (UnsafeError retry protocol)
        for nid, const in self.tape.assume_equal_const:
            arr = out[nid]
            want = ff.int_to_limbs(const, arr.shape[-1])
            if not np.array_equal(arr, np.broadcast_to(want, arr.shape)):
                raise UnsafeError("lane diverged from traced control flow")
        # width assumptions (assume_bits): pre-truncation value must fit k
        # bits on EVERY lane, else the 'assume' node silently truncated —
        # fail loudly per the symbolic-tape invariant
        for nid, k in set(self.tape.assume_checks):
            arr = out[nid]
            L = (k + 15) // 16
            bad = False
            if arr.shape[-1] > L and np.any(arr[..., L:]):
                bad = True
            rem = k % 16
            if not bad and rem and np.any(arr[..., L - 1] >> rem):
                bad = True
            if bad:
                raise ValueError(
                    f"assume_bits({k}) violated on a lane (node {nid}): "
                    "input invariants do not hold for this batch"
                )

        # 4. scatter captured value blocks
        for ridx, (tbl, ptbl) in enumerate(
            [(rec.base, probe.base), (rec.range, probe.range), (rec.select, probe.select)]
        ):
            for (row, col, nid) in ptbl.captures:
                rows = slab0[ridx] + row
                tbl.adv_vals[rows, col] = _to_u64(out[nid])
                tbl.adv_set[rows, col] = 1

        # 5. permutations (probe pairs -> blocks, placeholders rebased)
        def rebase(cell: Cell):
            if cell.row < 0:
                name = self._placeholder_cells[cell]
                region, col, rows = assigned_rows[name]
                return (region, col, np.asarray(rows, dtype=np.int64))
            return (cell.region, cell.col, slab0[int(cell.region)] + cell.row)

        for a, b in probe.permutations:
            rec.permutation_blocks.append((rebase(a), rebase(b)))

        # 6. map outputs (values normalised to 16 limbs)
        def map_leaf(leaf: AssignedValue):
            cell = leaf.cell
            if isinstance(leaf.val, SymVal):
                vals = out[leaf.val.nid]
                if vals.shape[-1] < 16:
                    vals = np.concatenate(
                        [vals, np.zeros(vals.shape[:-1] + (16 - vals.shape[-1],), np.uint32)],
                        axis=-1,
                    )
                else:
                    vals = vals[..., :16]
            else:
                vals = ff.ints_to_limbs([leaf.val] * B, 16)
            region, col, rows = rebase(cell)
            return vals, (region, col, rows)

        return _map_leaves(self.outputs, map_leaf)


def _to_u64(arr: np.ndarray) -> np.ndarray:
    if arr.shape[-1] < 16:
        arr = np.concatenate(
            [arr, np.zeros(arr.shape[:-1] + (16 - arr.shape[-1],), np.uint32)], axis=-1
        )
    return ff.limbs16_to_u64x4(arr[..., :16])


def _iter_leaves(tree):
    if tree is None:
        return
    if isinstance(tree, AssignedValue):
        yield tree
    elif isinstance(tree, AssignedCondition):
        yield tree.value
    elif isinstance(tree, AssignedInteger):
        yield from tree.limbs_le
        yield tree.native
    elif isinstance(tree, (AssignedPoint, AssignedNonZeroPoint)):
        yield from _iter_leaves(tree.x)
        yield from _iter_leaves(tree.y)
        if isinstance(tree, AssignedPoint):
            yield tree.z.value
    elif isinstance(tree, (list, tuple)):
        for t in tree:
            yield from _iter_leaves(t)
    elif isinstance(tree, dict):
        for t in tree.values():
            yield from _iter_leaves(t)
    else:
        raise TypeError(type(tree))


def _map_leaves(tree, fn):
    if tree is None:
        return None
    if isinstance(tree, AssignedValue):
        return fn(tree)
    if isinstance(tree, AssignedCondition):
        return fn(tree.value)
    if isinstance(tree, AssignedInteger):
        return {
            "limbs": [fn(l) for l in tree.limbs_le],
            "native": fn(tree.native),
            "times": tree.times,
        }
    if isinstance(tree, AssignedNonZeroPoint):
        return {"x": _map_leaves(tree.x, fn), "y": _map_leaves(tree.y, fn)}
    if isinstance(tree, AssignedPoint):
        return {
            "x": _map_leaves(tree.x, fn),
            "y": _map_leaves(tree.y, fn),
            "z": fn(tree.z.value),
        }
    if isinstance(tree, (list, tuple)):
        return [_map_leaves(t, fn) for t in tree]
    if isinstance(tree, dict):
        return {k: _map_leaves(t, fn) for k, t in tree.items()}
    raise TypeError(type(tree))
