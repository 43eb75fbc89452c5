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
from .evaluator import build_evaluator_packed
from .symbolic import SymVal, Tape


def _lane_mode(fuse: bool) -> bool:
    """Evaluation layout dispatch, resolved at template-build (trace) time
    like ff_jax._backend(): lane-major (limb axis second-minor, batch minor;
    kernels/ff_lane.py) on accelerators, where it measures 2x on mul_mod and
    ~order-of-magnitude on table packing; batch-major on CPU, where the
    lane forms compile and run slower (scripts/lane_microbench.py --cpu).
    HALO2ECC_TPU_LANE_MAJOR=0/1 overrides; the pallas fusion peephole is
    batch-major only."""
    if fuse:
        return False
    ov = os.environ.get("HALO2ECC_TPU_LANE_MAJOR")
    if ov is not None:
        return ov not in ("", "0")
    return jax.default_backend() != "cpu"


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
class AssignedInputVec:
    """K already-assigned values bound to ONE evaluator array u32[B, K, L]
    (keeps wide chained state — e.g. keccak's 1600 bits — as a single jit
    argument). assigned_rows entry: (region, cols[K] | col, rows[B, K])."""

    name: str
    bits: int
    v0s: list
    region: Region = Region.BASE


class AssignedVec:
    """Marks a template-output group whose leaves are stacked into one
    device tensor u32[B, K, 16] (instead of K separate arrays). All leaves
    must live in one region. The mapped output leaf is
    (vals u32[B, K, 16], (region, cols int64[K], rows int64[B, K]))."""

    def __init__(self, leaves):
        self.leaves = [
            l.value if isinstance(l, AssignedCondition) else l for l in leaves
        ]


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
        self._eval_slot = None  # nid -> (L, slot) for packed roots
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
        ph = 0
        for ai in assigned_inputs or []:
            if isinstance(ai, AssignedInputVec):
                syms = t.tape.input_vec(ai.name, ai.v0s, ai.bits)
                vals = []
                for k, sym in enumerate(syms):
                    ph += 1
                    cell = Cell(ai.region, 0, -ph)  # placeholder row < 0
                    t._placeholder_cells[cell] = (ai.name, k)
                    vals.append(AssignedValue(cell, sym))
                ins[ai.name] = vals
            else:
                ph += 1
                sym = t.tape.input(ai.name, ai.v0, ai.bits)
                cell = Cell(ai.region, ai.col, -ph)
                t._placeholder_cells[cell] = (ai.name, None)
                ins[ai.name] = AssignedValue(cell, sym)

        t.outputs = build(ctx, ins)
        t.strides = ctx.offsets()
        return t

    # -- instantiation --

    def digest(self) -> str:
        """Semantic hash of everything that determines the emitters'
        lowering: tape contents, probe layout (strides, constant patterns,
        captures), outputs structure, and the lowering-affecting env flags.
        Keys the cross-process export cache (utils/export_cache.py)."""
        if getattr(self, "_digest", None) is not None:
            return self._digest
        import hashlib

        h = hashlib.sha256()

        def put(*parts):
            for p in parts:
                h.update(repr(p).encode())
                h.update(b"\0")

        put("n", self.n, "strides", self.strides)
        for node in self.tape.nodes:
            put(node.op, node.args, node.const, node.bits, node.pad)
        put("inputs", self.tape.inputs)
        put("aec", self.tape.assume_equal_const)
        put("achk", sorted(set(self.tape.assume_checks)))
        for info in self._region_const_info():
            if info is None:
                put(None)
                continue
            stride, n_adv, const, captures = info
            put(stride, n_adv, captures)
            h.update(const.tobytes())
        # outputs structure: leaf cells + nids in traversal order
        for leaf in _iter_leaves(self.outputs):
            c = leaf.cell
            put(int(c.region), c.col, c.row,
                leaf.val.nid if isinstance(leaf.val, SymVal) else leaf.val)
        for v in _iter_vecs(self.outputs):
            put("vec", [l.val.nid for l in v.leaves])
        put("ph", sorted(
            (int(c.region), c.col, c.row, v)
            for c, v in self._placeholder_cells.items()
        ))
        put(
            "env",
            os.environ.get("HALO2ECC_TPU_TAPE_PALLAS_W", "128"),
            bool(os.environ.get("HALO2ECC_TPU_NO_TAPE_PALLAS")),
            bool(os.environ.get("HALO2ECC_TPU_PALLAS_FUSE")),
            os.environ.get("HALO2ECC_TPU_LANE_MAJOR"),
        )
        self._digest = h.hexdigest()[:32]
        return self._digest

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
            if isinstance(bits, tuple):  # vector input: (K, bits)
                bits = bits[1]
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
        """Jitted packed evaluator: fn(inputs) -> (outs {nid: u32[B, L]},
        bufs {L: u32[B, S, L]}); self._eval_slot maps vectorized root nids
        to their (L, slot) in bufs."""
        if self._eval is None:
            fuse = bool(os.environ.get("HALO2ECC_TPU_PALLAS_FUSE"))
            fn, self._eval_slot = build_evaluator_packed(
                self.tape, tuple(self._roots()), fuse_pallas_modmul=fuse
            )
            self._eval = jax.jit(fn)
        return self._eval

    # -- fully device-resident emission (no host transfer) --

    def _region_const_info(self):
        """Per-region (stride, n_adv, constant-pattern u32[..., 8] packed
        16-bit limb pairs, captures) derived from the probe trace; cached.
        Tables are assembled directly in the packed form the Records' u64x4
        layout consumes — half the HBM traffic of a 16-limb table plus a
        repack pass."""
        if getattr(self, "_rinfo", None) is None:
            probe = self.ctx.records
            strides = self.strides
            region_info = []
            for ridx, ptbl in enumerate([probe.base, probe.range, probe.select]):
                stride = strides[ridx]
                if stride == 0:
                    region_info.append(None)
                    continue
                const = np.zeros((stride, ptbl.n_adv, 8), dtype=np.uint32)
                u64 = ptbl.adv_vals[:stride]
                for m in range(8):
                    const[..., m] = (
                        (u64[..., m // 2] >> np.uint64(32 * (m % 2)))
                        & np.uint64(0xFFFFFFFF)
                    ).astype(np.uint32)
                region_info.append((stride, ptbl.n_adv, const, list(ptbl.captures)))
            self._rinfo = region_info
        return self._rinfo

    @staticmethod
    def _pack_pairs16(v):
        """u32[..., 16] 16-bit limbs -> u32[..., 8] packed limb pairs."""
        return v[..., 0::2] | (v[..., 1::2] << 16)

    def _table_pack_plan(self, eslot):
        """Static per-region plan for gather-based advice-table assembly.

        The old path scattered capture blocks into a broadcast constant
        table (`tbl.at[rows, cols].set(...)`), which XLA lowers to chained
        full-table copies — measured 54% of total emit time on TPU
        (scripts/device_profile.py). The gather form builds one packed
        capture buffer [B, n_caps, 8], gathers it per CELL with a static
        index, and selects capture-vs-constant with one fused where — a
        single output-table write pass.

        Returns per region: (stride, n_adv, const_flat u32[S,8],
        cell_src i32[S], is_cap bool[S], src_specs, n_caps) or None.
        src_specs: [("vec", L, slot_idx i32[k])... , ("scalar", [nid...])]
        in capture-buffer order.
        """
        plans = []
        for info in self._region_const_info():
            if info is None:
                plans.append(None)
                continue
            stride, n_adv, const, captures = info
            S = stride * n_adv
            byw: Dict[int, list] = {}
            scalars = []
            for (r, c, nid) in captures:
                if nid in eslot:
                    L, i = eslot[nid]
                    byw.setdefault(L, []).append((r, c, i))
                else:
                    scalars.append((r, c, nid))
            cell_src = np.zeros(S, dtype=np.int32)
            is_cap = np.zeros(S, dtype=bool)
            src_specs = []
            pos = 0
            for L in sorted(byw):
                entries = byw[L]
                idxs = np.array([i for (_, _, i) in entries], dtype=np.int32)
                for k, (r, c, _) in enumerate(entries):
                    cell = r * n_adv + c
                    assert not is_cap[cell], "cell captured twice"
                    cell_src[cell] = pos + k
                    is_cap[cell] = True
                src_specs.append(("vec", L, idxs))
                pos += len(entries)
            if scalars:
                for k, (r, c, _) in enumerate(scalars):
                    cell = r * n_adv + c
                    assert not is_cap[cell], "cell captured twice"
                    cell_src[cell] = pos + k
                    is_cap[cell] = True
                src_specs.append(("scalar", [nid for (_, _, nid) in scalars]))
                pos += len(scalars)
            plans.append(
                (stride, n_adv, const.reshape(S, 8), cell_src, is_cap,
                 src_specs, pos)
            )
        return plans

    @staticmethod
    def _pack8(v):
        """u32[..., L] 16-bit limbs -> u32[..., 8] packed pairs (truncating
        past 16 limbs — captured cells are field values < n < 2^256)."""
        import jax.numpy as jnp

        v = v[..., :16]
        L = v.shape[-1]
        if L % 2:
            v = jnp.concatenate(
                [v, jnp.zeros(v.shape[:-1] + (1,), jnp.uint32)], axis=-1
            )
        p = v[..., 0::2] | (v[..., 1::2] << 16)
        if p.shape[-1] < 8:
            p = jnp.concatenate(
                [p, jnp.zeros(p.shape[:-1] + (8 - p.shape[-1],), jnp.uint32)],
                axis=-1,
            )
        return p

    @staticmethod
    def _pack8_lane(v):
        """Lane-major _pack8: u32[..., L, B] -> u32[..., 8, B]."""
        import jax.numpy as jnp

        v = v[..., :16, :]
        L = v.shape[-2]
        if L % 2:
            v = jnp.concatenate(
                [v, jnp.zeros(v.shape[:-2] + (1,) + v.shape[-1:], jnp.uint32)],
                axis=-2,
            )
        p = v[..., 0::2, :] | (v[..., 1::2, :] << 16)
        if p.shape[-2] < 8:
            p = jnp.concatenate(
                [p, jnp.zeros(p.shape[:-2] + (8 - p.shape[-2],) + p.shape[-1:],
                              jnp.uint32)],
                axis=-2,
            )
        return p

    def _assemble_tables_lane(self, plans, take, bufs, B):
        """Lane-major table assembly: capture buffers [ncap, 8, B], a
        leading-axis gather per region (contiguous [8, B] row blocks — no
        cross-lane movement), one fused where against the constant pattern,
        and a single transpose to the Records-facing [B, stride, n_adv, 8]."""
        import jax.numpy as jnp

        def pad16(v):  # [L, B] -> [16, B]
            if v.shape[-2] < 16:
                return jnp.concatenate(
                    [v, jnp.zeros((16 - v.shape[-2],) + v.shape[-1:], jnp.uint32)],
                    axis=-2,
                )
            return v[..., :16, :]

        slabs = {}
        for ridx, plan in enumerate(plans):
            if plan is None:
                continue
            stride, n_adv, const_flat, cell_src, is_cap, src_specs, ncap = plan
            if ncap == 0:
                slabs[ridx] = jnp.broadcast_to(
                    jnp.asarray(const_flat).reshape(stride, n_adv, 8),
                    (B, stride, n_adv, 8),
                )
                continue
            parts = []
            for spec in src_specs:
                if spec[0] == "vec":
                    _, L, idxs = spec
                    parts.append(self._pack8_lane(bufs[L][idxs]))
                else:
                    parts.append(
                        self._pack8_lane(
                            jnp.stack([pad16(take(n)) for n in spec[1]], axis=0)
                        )
                    )
            cap_buf = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
            gathered = cap_buf[jnp.asarray(cell_src)]  # [S, 8, B]
            tbl = jnp.where(
                jnp.asarray(is_cap)[:, None, None],
                gathered,
                jnp.asarray(const_flat)[:, :, None],
            )
            slabs[ridx] = jnp.transpose(tbl, (2, 0, 1)).reshape(
                B, stride, n_adv, 8
            )
        return slabs

    def _assemble_tables(self, plans, take, bufs, B):
        """Gather-based table assembly (see _table_pack_plan)."""
        import jax.numpy as jnp

        def pad16(v):
            if v.shape[-1] < 16:
                return jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-1] + (16 - v.shape[-1],), jnp.uint32)],
                    axis=-1,
                )
            return v[..., :16]

        slabs = {}
        for ridx, plan in enumerate(plans):
            if plan is None:
                continue
            stride, n_adv, const_flat, cell_src, is_cap, src_specs, ncap = plan
            if ncap == 0:
                slabs[ridx] = jnp.broadcast_to(
                    jnp.asarray(const_flat).reshape(stride, n_adv, 8),
                    (B, stride, n_adv, 8),
                )
                continue
            parts = []
            for spec in src_specs:
                if spec[0] == "vec":
                    _, L, idxs = spec
                    parts.append(self._pack8(bufs[L][:, idxs]))
                else:
                    parts.append(
                        self._pack8(
                            jnp.stack([pad16(take(n)) for n in spec[1]], axis=1)
                        )
                    )
            cap_buf = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
            gathered = cap_buf[:, jnp.asarray(cell_src)]  # [B, S, 8]
            tbl = jnp.where(
                jnp.asarray(is_cap)[None, :, None],
                gathered,
                jnp.asarray(const_flat)[None],
            )
            slabs[ridx] = tbl.reshape(B, stride, n_adv, 8)
        return slabs

    def slab_value_emitter(self):
        """Jitted fn(inputs) -> (slabs, outvals, flags) computing, fully on
        device: the advice slabs ({ridx: u32[B, stride, n_adv, 8] —
        packed 16-bit limb pairs}), the
        output-leaf values ({nid: u32[B, 16]}), and deferred safety flags
        ({'diverged': bool, 'width_bad': bool} — checked once at
        finalize_deferred, preserving the UnsafeError retry protocol without
        per-phase host syncs). The device-resident backbone of the batched
        MSM pipeline (instantiate(deferred=...))."""
        if getattr(self, "_slab_emit", None) is not None:
            return self._slab_emit
        self._build_slab_emitter()
        return self._slab_emit

    def slab_value_emitter_raw(self):
        """Unjitted form for composing into outer jits (per-step gather
        wrappers, shard_map)."""
        if getattr(self, "_slab_emit_raw", None) is None:
            self._build_slab_emitter()
        return self._slab_emit_raw

    def _build_slab_emitter(self):
        import jax.numpy as jnp

        roots = tuple(self._roots())
        fuse = bool(os.environ.get("HALO2ECC_TPU_PALLAS_FUSE"))
        lane = _lane_mode(fuse)
        ev, eslot = build_evaluator_packed(
            self.tape, roots, fuse_pallas_modmul=fuse, lane_major=lane
        )
        pallas_kernel = None
        pallas_W = int(os.environ.get("HALO2ECC_TPU_TAPE_PALLAS_W", 128))
        if (
            jax.default_backend() not in ("cpu",)
            and not os.environ.get("HALO2ECC_TPU_NO_TAPE_PALLAS")
        ):
            from ..kernels.tape_pallas import build_slab_kernel

            pallas_kernel = build_slab_kernel(
                self, W=pallas_W, with_outputs=True
            )
        region_info = self._region_const_info()
        vec_groups = []
        for v in _iter_vecs(self.outputs):
            assert all(isinstance(l.val, SymVal) for l in v.leaves)
            vec_groups.append(tuple(l.val.nid for l in v.leaves))
        vec_leaf_nids = {nid for g in vec_groups for nid in g}
        out_nids = sorted(
            {
                leaf.val.nid
                for leaf in _iter_leaves(self.outputs)
                if isinstance(leaf.val, SymVal)
            }
            - vec_leaf_nids
        )
        aec = list(self.tape.assume_equal_const)
        achk = sorted(set(self.tape.assume_checks))

        def pad16(v):
            if v.shape[-1] < 16:
                return jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-1] + (16 - v.shape[-1],), jnp.uint32)],
                    axis=-1,
                )
            return v[..., :16]

        # gather-based table assembly plan (see _table_pack_plan): the
        # tables are assembled packed (u32 limb pairs) — half the HBM
        # traffic, and _write_slab consumes this form directly
        plans = self._table_pack_plan(eslot)

        def pad16_lane(v):  # [..., L, B] -> [..., 16, B]
            if v.shape[-2] < 16:
                return jnp.concatenate(
                    [v, jnp.zeros(v.shape[:-2] + (16 - v.shape[-2],) + v.shape[-1:],
                                  jnp.uint32)],
                    axis=-2,
                )
            return v[..., :16, :]

        def emit(inputs):
            if pallas_kernel is not None:
                return pallas_kernel(inputs)
            B = next(iter(inputs.values())).shape[0]
            outs, bufs = ev(inputs)

            def take(nid):
                v = outs.get(nid)
                if v is None:
                    L, i = eslot[nid]
                    v = bufs[L][i] if lane else bufs[L][:, i]
                return v

            if lane:
                to_b = lambda v: jnp.moveaxis(v, -1, 0)
                slabs = self._assemble_tables_lane(plans, take, bufs, B)
                outvals = {nid: to_b(pad16_lane(take(nid))) for nid in out_nids}
                for i, group in enumerate(vec_groups):
                    ws = {eslot[nid][0] for nid in group if nid in eslot}
                    if len(ws) == 1 and all(nid in eslot for nid in group):
                        L = next(iter(ws))
                        idx = np.array([eslot[nid][1] for nid in group], dtype=np.int32)
                        outvals[("vec", i)] = to_b(pad16_lane(bufs[L][idx]))
                    else:
                        outvals[("vec", i)] = to_b(jnp.stack(
                            [pad16_lane(take(nid)) for nid in group], axis=0
                        ))
                diverged = jnp.zeros((), jnp.bool_)
                for nid, const in aec:
                    arr = take(nid)
                    want = jnp.asarray(ff.int_to_limbs(const, arr.shape[-2]))
                    diverged = diverged | ~jnp.all(arr == want[:, None])
                width_bad = jnp.zeros((), jnp.bool_)
                for nid, k in achk:
                    arr = take(nid)
                    L = (k + 15) // 16
                    if arr.shape[-2] > L:
                        width_bad = width_bad | jnp.any(arr[..., L:, :] != 0)
                    rem = k % 16
                    if rem:
                        width_bad = width_bad | jnp.any(arr[..., L - 1, :] >> rem != 0)
                return slabs, outvals, {"diverged": diverged, "width_bad": width_bad}

            slabs = self._assemble_tables(plans, take, bufs, B)
            outvals = {nid: pad16(take(nid)) for nid in out_nids}
            for i, group in enumerate(vec_groups):
                # stacked leaf group: one gather when all leaves share a
                # packed width, else per-leaf stack
                ws = {eslot[nid][0] for nid in group if nid in eslot}
                if len(ws) == 1 and all(nid in eslot for nid in group):
                    L = next(iter(ws))
                    idx = np.array([eslot[nid][1] for nid in group], dtype=np.int32)
                    outvals[("vec", i)] = pad16(bufs[L][:, idx])
                else:
                    outvals[("vec", i)] = jnp.stack(
                        [pad16(take(nid)) for nid in group], axis=1
                    )
            diverged = jnp.zeros((), jnp.bool_)
            for nid, const in aec:
                arr = take(nid)
                want = jnp.asarray(ff.int_to_limbs(const, arr.shape[-1]))
                diverged = diverged | ~jnp.all(arr == want)
            width_bad = jnp.zeros((), jnp.bool_)
            for nid, k in achk:
                arr = take(nid)
                L = (k + 15) // 16
                if arr.shape[-1] > L:
                    width_bad = width_bad | jnp.any(arr[..., L:] != 0)
                rem = k % 16
                if rem:
                    width_bad = width_bad | jnp.any(arr[..., L - 1] >> rem != 0)
            return slabs, outvals, {"diverged": diverged, "width_bad": width_bad}

        self._slab_emit_raw = emit
        from ..utils.export_cache import cached_jit

        self._slab_emit = cached_jit(
            emit, self.digest() + "|slab_value_emitter", "slab"
        )

    def device_emitter_raw(self):
        """Unjitted emission fn (for wrapping in shard_map; see
        parallel/mesh.py)."""
        self.device_emitter()
        return self._dev_emit_raw

    def device_emitter(self):
        """Returns a jitted fn(inputs) -> {region: u32[B, stride, n_adv, 8]}
        materialising each instance's advice slab in device memory as packed
        16-bit limb pairs (the Records u64x4 layout's word halves). Constant
        advice cells come from the probe pattern; fixed columns are identical
        for every instance (static circuit data) and stay host-side.

        This is the full TPU witness path: values AND table layout live in
        HBM, where a device-side prover would consume them.

        On accelerators, tapes the whole-template Pallas kernel supports run
        through it (kernels/tape_pallas.py: the full tape + slab packing per
        batch tile in VMEM — measured 6.8x the XLA lowering on the int_mul
        template); other tapes, non-tile-aligned batch sizes, and CPU use
        the XLA evaluator + gather-based assembly. Both paths are bit-exact
        (tests/test_tape_pallas.py). HALO2ECC_TPU_NO_TAPE_PALLAS=1 forces
        the XLA path.

        Input contract: numpy inputs are validated against declared widths
        before dispatch; callers passing device arrays (e.g. bench.py's jitted
        generator, shard_map via device_emitter_raw) must themselves guarantee
        the declared widths — oversized values are truncated by the evaluator.
        """
        if getattr(self, "_dev_emit", None) is not None:
            return self._dev_emit

        import jax.numpy as jnp

        roots = tuple(self._roots())
        fuse = bool(os.environ.get("HALO2ECC_TPU_PALLAS_FUSE"))
        lane = _lane_mode(fuse)
        ev, eslot = build_evaluator_packed(
            self.tape, roots, fuse_pallas_modmul=fuse, lane_major=lane
        )
        plans = self._table_pack_plan(eslot)

        pallas_kernel = None
        pallas_W = int(os.environ.get("HALO2ECC_TPU_TAPE_PALLAS_W", 128))
        if (
            jax.default_backend() not in ("cpu",)
            and not os.environ.get("HALO2ECC_TPU_NO_TAPE_PALLAS")
        ):
            from ..kernels.tape_pallas import build_slab_kernel

            pallas_kernel = build_slab_kernel(self, W=pallas_W)

        def emit(inputs):
            if pallas_kernel is not None:
                return pallas_kernel(inputs)
            B = next(iter(inputs.values())).shape[0]
            outs, bufs = ev(inputs)

            def take(nid):
                v = outs.get(nid)
                if v is None:
                    L, i = eslot[nid]
                    v = bufs[L][i] if lane else bufs[L][:, i]
                return v

            if lane:
                return self._assemble_tables_lane(plans, take, bufs, B)
            return self._assemble_tables(plans, take, bufs, B)

        self._dev_emit_raw = emit
        from ..utils.export_cache import cached_jit

        jitted = cached_jit(emit, self.digest() + "|device_emitter", "dev")

        def checked(inputs):
            # validate host-resident (numpy) inputs against declared widths;
            # device arrays / tracers are the caller's contract (validating
            # them would force a host sync per dispatch) — see device_emitter
            # docstring.
            self._validate_input_widths(inputs)
            return jitted(inputs)

        self._dev_emit = checked
        return self._dev_emit

    def device_emitter_raw_slabs(self):
        """Jitted fn(inputs) -> {ridx: u32[S*8, 8, Bs]}: the advice slabs
        in the KERNEL-NATIVE lane-major packed layout (row = cell*8 + pair,
        lane b = sublane*Bs + w, batch padded up to the tile). This is the
        serving deliverable on TPU: skipping the batch-major transpose
        removes ~73% of the emit's device time at B=2^17 (the transpose
        re-reads and rewrites the entire slab; BASELINE.md round 5).
        kernels.tape_pallas.unpack_raw_slab() converts to the
        Records-facing [B, stride, n_adv, 8] when a host write needs it.

        Without the Pallas kernel (CPU / unsupported tape) the XLA path
        emits batch-major and converts — bit-exact, same contract, none of
        the savings."""
        if getattr(self, "_dev_emit_raws", None) is not None:
            return self._dev_emit_raws
        import jax.numpy as jnp

        pallas_kernel = None
        pallas_W = int(os.environ.get("HALO2ECC_TPU_TAPE_PALLAS_W", 128))
        if (
            jax.default_backend() not in ("cpu",)
            and not os.environ.get("HALO2ECC_TPU_NO_TAPE_PALLAS")
        ):
            from ..kernels.tape_pallas import build_slab_kernel

            pallas_kernel = build_slab_kernel(
                self, W=pallas_W, raw_slabs=True
            )
        if pallas_kernel is not None:
            emit = pallas_kernel
        else:
            self.device_emitter()  # builds _dev_emit_raw
            batch_emit = self._dev_emit_raw
            rinfo = self._region_const_info()

            def emit(inputs):
                slabs = batch_emit(inputs)
                out = {}
                for ridx, t in slabs.items():
                    B0, stride, n_adv, _ = t.shape
                    Bs = -(-B0 // 8)
                    if 8 * Bs != B0:
                        pad = jnp.broadcast_to(
                            t[:1], (8 * Bs - B0,) + t.shape[1:]
                        )
                        t = jnp.concatenate([t, pad], axis=0)
                    S = stride * n_adv
                    x = t.reshape(8, Bs, S, 8)
                    out[ridx] = jnp.transpose(x, (2, 3, 0, 1)).reshape(
                        S * 8, 8, Bs
                    )
                return out

        from ..utils.export_cache import cached_jit

        self._dev_emit_raws_raw = emit
        self._dev_emit_raws = cached_jit(
            emit, self.digest() + "|device_emitter_raw_slabs", "rawslab"
        )
        return self._dev_emit_raws

    def device_emitter_raw_slabs_raw(self):
        """Unjitted form of device_emitter_raw_slabs (for outer jits)."""
        self.device_emitter_raw_slabs()
        return self._dev_emit_raws_raw

    def instantiate(
        self,
        ctx: Context,
        inputs: Dict[str, np.ndarray],
        assigned_rows: Optional[Dict[str, Tuple[Region, int, np.ndarray]]] = None,
        instance_rows: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
        deferred: Optional[list] = None,
        _precomputed=None,
        _B: Optional[int] = None,
    ):
        """Emit B instances. inputs: name -> u32[B, limbs]. assigned_rows maps
        assigned-input names to their actual (region, col, rows[B]).

        instance_rows optionally gives each instance's absolute slab start per
        region (default: consecutive slabs from the current cursors, which are
        then advanced; with explicit rows the caller manages cursors — used
        e.g. to interleave instances group-major like the reference layout).

        deferred: device-resident mode. Witness values AND advice slabs are
        computed by the jitted slab_value_emitter; advice-table writes and
        divergence checks are queued on the list and performed once by
        finalize_deferred() (a single device->host fetch for the whole
        pipeline). Output leaves then carry device value arrays, so phases
        chain on-device. _precomputed optionally supplies (slabs, outvals,
        flags) already produced by an outer jit (e.g. a per-window-step
        gather wrapper); _B must then give the lane count.

        Returns the output pytree with each AssignedValue leaf replaced by
        (values u32[B, 16-limb], (region, col, rows[B])).
        """
        if _precomputed is not None:
            assert deferred is not None and _B is not None
        if _B is not None:
            # mesh mode: inputs may be padded along the batch dim to a
            # divisible lane count; _B is the REAL instance count (layout,
            # rows, finalize slicing all use it; padded lanes are dropped)
            B = _B
        else:
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

        # 1. bulk-copy the probe pattern (fixed + masks; constant advice too
        # on the host path — in deferred mode the device slab carries all
        # advice values, so only the presence masks are tiled here).
        # serving_mode (set by engines when write_tables=False): host Records
        # are never materialised at all — masks/fixed columns are static
        # layout data a production server caches from one write_tables=True
        # build, so per-build tiling is pure overhead; only cursor
        # bookkeeping (above) and the device pipeline run.
        serving = getattr(ctx, "serving_mode", False)
        if serving:
            assert deferred is not None, "serving_mode requires the device path"
        else:
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
                if deferred is None:
                    tbl.adv_vals[rows] = np.tile(ptbl.adv_vals[:stride], (B, 1, 1))
                tbl.adv_set[rows] = np.tile(ptbl.adv_set[:stride], (B, 1))
                tbl.fix_vals[rows] = np.tile(ptbl.fix_vals[:stride], (B, 1, 1))
                tbl.fix_set[rows] = np.tile(ptbl.fix_set[:stride], (B, 1))

        if deferred is not None:
            # -- device-resident path: queue slabs, chain device outputs --
            if _precomputed is not None:
                slabs, outvals, flags = _precomputed
            else:
                self._validate_input_widths(inputs)
                slabs, outvals, flags = self.slab_value_emitter()(inputs)
            if os.environ.get("HALO2ECC_TPU_SYNC_DISPATCH"):
                # block per dispatch: on the 8-virtual-device CPU backend a
                # lazy jit compile (minutes, all cores) concurrent with an
                # in-flight collective starves its participant threads past
                # XLA's 40s rendezvous timeout -> hard abort. Serial
                # execution trades pipelining for survival (dryrun only).
                jax.block_until_ready(slabs)
            deferred.append(
                _Deferred(ctx=ctx, slabs=slabs, flags=flags, slab0=slab0,
                          strides=strides, lanes=B)
            )

            def get_out(nid):
                return outvals[nid]

            def get_vec(i):
                return outvals[("vec", i)]

        else:
            # 2. evaluate the tape (after validating arrays fit declared
            # widths — the evaluator truncates to the declared limb count, so
            # oversized values would silently corrupt witnesses). Vectorized
            # roots come back packed per width; fetch the buffers once and
            # slice per use in numpy (no per-root device graph expansion).
            self._validate_input_widths(inputs)
            outs_d, bufs_d = self.evaluator()(inputs)
            outs_np = {k: np.asarray(v) for k, v in outs_d.items()}
            bufs_np = {L: np.asarray(v) for L, v in bufs_d.items()}
            eslot = self._eval_slot

            class _OutView:
                def __getitem__(self, nid):
                    v = outs_np.get(nid)
                    if v is None:
                        L, i = eslot[nid]
                        v = bufs_np[L][:, i]
                    return v

            out = _OutView()

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

            def get_out(nid):
                vals = out[nid]
                if vals.shape[-1] < 16:
                    return np.concatenate(
                        [
                            vals,
                            np.zeros(vals.shape[:-1] + (16 - vals.shape[-1],), np.uint32),
                        ],
                        axis=-1,
                    )
                return vals[..., :16]

            get_vec = None

        # 5. permutations (probe pairs -> blocks, placeholders rebased)
        def rebase(cell: Cell):
            if cell.row < 0:
                name, k = self._placeholder_cells[cell]
                region, col, rows = assigned_rows[name]
                if k is None:
                    return (region, col, np.asarray(rows, dtype=np.int64))
                rows = np.asarray(rows, dtype=np.int64)  # [B, K]
                c = col if isinstance(col, (int, np.integer)) else int(col[k])
                return (region, c, rows[:, k])
            return (cell.region, cell.col, slab0[int(cell.region)] + cell.row)

        for a, b in probe.permutations:
            rec.permutation_blocks.append((rebase(a), rebase(b)))

        # 6. map outputs (values normalised to 16 limbs)
        def map_leaf(leaf: AssignedValue):
            cell = leaf.cell
            if isinstance(leaf.val, SymVal):
                vals = get_out(leaf.val.nid)
            else:
                vals = ff.ints_to_limbs([leaf.val] * B, 16)
            region, col, rows = rebase(cell)
            return vals, (region, col, rows)

        vec_index = {id(v): i for i, v in enumerate(_iter_vecs(self.outputs))}

        def map_vec(vec: AssignedVec):
            # leaves may be template-emitted cells OR pass-through assigned
            # inputs (placeholder cells — e.g. keccak absorb's untouched
            # capacity bits); rebase handles both
            leaves = vec.leaves
            rebased = [rebase(l.cell) for l in leaves]
            region = rebased[0][0]
            assert all(r[0] == region for r in rebased)
            cols = np.array([c for (_, c, _) in rebased], dtype=np.int64)
            rws = np.stack([r for (_, _, r) in rebased], axis=1)
            if get_vec is not None:
                vals = get_vec(vec_index[id(vec)])
            else:
                vals = np.stack([get_out(l.val.nid) for l in leaves], axis=1)
            return vals, (region, cols, rws)

        return _map_leaves(self.outputs, map_leaf, map_vec)


@dataclass
class _Deferred:
    """One queued device-resident instantiation: slabs still in HBM, flags
    unchecked, advice-table writes pending."""

    ctx: Context
    slabs: dict  # ridx -> u32[B_pad, stride, n_adv, 8] (device; packed 16-bit limb pairs)
    flags: dict  # {'diverged': bool0, 'width_bad': bool0} (device)
    slab0: tuple  # per-region int64[B] slab starts
    strides: tuple
    lanes: int = 0  # real instance count (slab lanes beyond this are pad)


def finalize_deferred(deferred: list, write: bool = True) -> None:
    """Drain a deferred device pipeline: check every phase's divergence/width
    flags (UnsafeError retry protocol) in ONE stacked fetch, then bulk-write
    the fetched advice slabs into the host Records.

    write=False skips the slab fetch/writes entirely: the advice tables stay
    device-resident in HBM (where a device-side prover consumes them) and
    only the safety flags + small chained outputs ever cross the wire — the
    production serving mode on remote-attached TPUs. Host Records then hold
    layout (fixed columns, masks, permutations) but not batched advice
    values; use write=True for anything the constraint verifier will check.
    """
    if not deferred:
        return
    import jax.numpy as jnp

    # stack flags in bounded chunks: op-granular pipelines (batched pairing)
    # queue tens of thousands of entries, and a single jnp.stack with that
    # many operands is its own pathological XLA compile
    CHUNK = 512
    div = wid = False
    for lo in range(0, len(deferred), CHUNK):
        part = deferred[lo : lo + CHUNK]
        div = div or bool(
            np.asarray(jnp.stack([d.flags["diverged"] for d in part])).any()
        )
        wid = wid or bool(
            np.asarray(jnp.stack([d.flags["width_bad"] for d in part])).any()
        )
    if div:
        raise UnsafeError("lane diverged from traced control flow")
    if wid:
        raise ValueError(
            "assume_bits violated on a lane: input invariants do not hold"
        )
    if not write:
        deferred.clear()
        return
    for d in deferred:
        tables = (d.ctx.records.base, d.ctx.records.range, d.ctx.records.select)
        for ridx, slab in d.slabs.items():
            tbl = tables[ridx]
            starts = d.slab0[ridx]
            stride = d.strides[ridx]
            lanes = d.lanes or slab.shape[0]
            if getattr(slab, "is_fully_addressable", True):
                _write_slab(tbl, np.asarray(slab)[:lanes], starts, stride)
            else:
                # multi-host (jax.distributed): each process fetches and
                # writes only its own device shards' lane ranges
                for s in slab.addressable_shards:
                    lane0 = s.index[0].start or 0
                    if lane0 >= lanes:
                        continue  # pure pad shard
                    sub = np.asarray(s.data)[: lanes - lane0]
                    _write_slab(
                        tbl, sub, starts[lane0 : lane0 + sub.shape[0]], stride
                    )
    deferred.clear()


def _write_slab(tbl, arr: np.ndarray, starts: np.ndarray, stride: int) -> None:
    # arr carries u32-packed 16-bit limb pairs ([..., 8]); combine into the
    # Records' u64x4 words
    B, _stride, n_adv, _ = arr.shape
    a = arr.reshape(B * _stride, n_adv, 8).astype(np.uint64)
    packed = a[..., 0::2] | (a[..., 1::2] << np.uint64(32))
    s0 = int(starts[0])
    if B == 1 or (np.all(np.diff(starts) == stride) and starts.size == B):
        tbl.adv_vals[s0 : s0 + B * stride] = packed
    else:
        rows = (
            starts[:, None] + np.arange(stride, dtype=np.int64)[None, :]
        ).reshape(-1)
        tbl.adv_vals[rows] = packed


def tree_to_numpy(tree):
    """Convert a template-output tree's device value arrays to numpy (one
    sync per leaf; call after finalize_deferred)."""

    def conv(node):
        if (
            isinstance(node, tuple)
            and len(node) == 2
            and not isinstance(node[0], tuple)
        ):
            vals, rows = node
            return np.asarray(vals), rows
        if isinstance(node, list):
            return [conv(x) for x in node]
        if isinstance(node, dict):
            return {k: conv(v) if k != "times" else v for k, v in node.items()}
        return node

    return conv(tree)


def _to_u64(arr: np.ndarray) -> np.ndarray:
    if arr.shape[-1] < 16:
        arr = np.concatenate(
            [arr, np.zeros(arr.shape[:-1] + (16 - arr.shape[-1],), np.uint32)], axis=-1
        )
    return ff.limbs16_to_u64x4(arr[..., :16])


def _iter_vecs(tree):
    """Yield AssignedVec groups in deterministic traversal order."""
    if isinstance(tree, AssignedVec):
        yield tree
    elif isinstance(tree, (list, tuple)):
        for t in tree:
            yield from _iter_vecs(t)
    elif isinstance(tree, dict):
        for t in tree.values():
            yield from _iter_vecs(t)


def _iter_leaves(tree):
    if tree is None:
        return
    if isinstance(tree, AssignedVec):
        yield from tree.leaves
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


def _map_leaves(tree, fn, vec_fn=None):
    if tree is None:
        return None
    if isinstance(tree, AssignedVec):
        assert vec_fn is not None, "AssignedVec output needs vec mapping"
        return vec_fn(tree)
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
        return {
            "x": _map_leaves(tree.x, fn, vec_fn),
            "y": _map_leaves(tree.y, fn, vec_fn),
        }
    if isinstance(tree, AssignedPoint):
        return {
            "x": _map_leaves(tree.x, fn, vec_fn),
            "y": _map_leaves(tree.y, fn, vec_fn),
            "z": fn(tree.z.value),
        }
    if isinstance(tree, (list, tuple)):
        return [_map_leaves(t, fn, vec_fn) for t in tree]
    if isinstance(tree, dict):
        return {k: _map_leaves(t, fn, vec_fn) for k, t in tree.items()}
    raise TypeError(type(tree))
