"""Lower a symbolic tape (batch/symbolic.py) to one batched XLA program.

Each node becomes a uint32 16-bit-limb array of statically known width;
ops map onto the exact limb primitives in kernels/ff_jax.py. A liveness pass
keeps only nodes needed for captured cells / outputs / assumption checks.

Auto-vectorization: big templates (keccak rounds: ~30k 1-bit gate nodes;
scalar decomposition: hundreds of identical bit rows) would otherwise lower
to one XLA op chain PER NODE — graphs whose compile time dominates
everything. _vector_plan groups same-shaped nodes (same op/const/widths,
_base_key) by RANK — rank increments only across group-eligible producers,
so same-shaped work from interleaved chains merges into one group — and
executes each group as ONE batched limb op over a [B, G, L] tensor; group
values live in per-width slot buffers that later ops gather from (XLA
gathers with static index arrays). The lowered graph shrinks from O(nodes)
to O(ranks x distinct op shapes) — a keccak round drops from ~30k chains to
~200 tensor ops. Bit-exact with the scalar lowering: the same kernels run
on reshaped operands.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import ff_jax as ff
from ..kernels import ff_lane as fl
from .symbolic import Node, Tape


def _limbs(bits: int) -> int:
    return max((bits + 15) // 16, 1)


def _is_pow2(c: int) -> bool:
    return c > 0 and (c & (c - 1)) == 0


# ops safe to execute as one batched call on [B, G, L] operands (every ff
# primitive batches over leading dims); excluded: input/input_vec/const
# (level-0 sources), gather (data-dependent per-lane index mix)
VEC_OPS = {
    "add", "sub", "mulc", "mul", "mod", "andmask", "shr", "assume",
    "pick", "div", "inv", "powm",
}
VEC_MIN = 8  # don't bother batching groups smaller than this
# ops whose const generalises to a per-member static array inside a group
CONST_ARRAY_OPS = {"shr", "andmask", "mulc", "sub", "assume"}


@lru_cache(maxsize=None)
def _mk_div_spec(m: int, x_limbs: int, lane: bool = False):
    q_limbs = max(x_limbs - ff.n_limbs_for(m) + 2, 1)
    return (fl if lane else ff).DivSpec(m, x_limbs, q_limbs)


def _const_arr(v: int, L: int):
    return jnp.asarray(ff.int_to_limbs(v, L))


def live_nodes(tape: Tape, roots: Sequence[int]) -> List[int]:
    needed = set()
    stack = list(roots)
    while stack:
        nid = stack.pop()
        if nid in needed:
            continue
        needed.add(nid)
        stack.extend(tape.nodes[nid].args)
    return sorted(needed)


def _base_key(tape: Tape, nid: int):
    """Shape key of a node for batching, WITHOUT a schedule position.
    (Width-bucketed storage was tried and REGRESSED: padding the width-
    sized Barrett reduces to a shared bucket costs more MACs than the
    extra groups save — eval 0.30s -> 0.62s on TPU, devprof r4c.)"""
    node = tape.nodes[nid]
    if node.op == "pick":
        return ("pick", node.args[0], _limbs(node.bits))
    if node.op == "mulc":
        # power-of-two constants lower to per-member shifts
        # (shl_limbs_vec); keep them out of true-multiply groups
        return (
            "mulc", _is_pow2(node.const), _limbs(node.bits),
            tuple(_limbs(tape.nodes[a].bits) for a in node.args),
        )
    if node.op in CONST_ARRAY_OPS:
        # const becomes a per-member static array (shift/mask/multiplier
        # /sub-lift/assume-width), so differently-parameterised nodes of
        # one shape still share a group — range-chunk decompositions
        # (shr/andmask sweeps) are the bulk of ecc witness tapes
        return (
            node.op, _limbs(node.bits),
            tuple(_limbs(tape.nodes[a].bits) for a in node.args),
        )
    return (
        node.op, node.const, _limbs(node.bits),
        tuple(_limbs(tape.nodes[a].bits) for a in node.args),
    )


def _vector_plan(tape: Tape, order: Sequence[int], skip: set):
    """Group same-shaped live nodes into maximal dependency-free batches.

    Nodes are keyed by shape (_base_key) and RANK, where rank increments
    only when a dependency path crosses a group-eligible node: rank[n] =
    max over args a of (rank[a] + 1 if a eligible else rank[a]). Two
    same-rank eligible nodes cannot depend on each other (any path between
    them crosses the producer, incrementing rank), and a batch at rank r
    only reads batches at rank < r and scalars at rank <= r — so scheduling
    scalars-then-batches per rank is a valid topological order, cross-key
    batch cycles included. Compared to exact-depth grouping this merges
    same-shaped work from interleaved chains (an int_mul tape's 96 shr
    nodes sit at ~dozens of distinct depths but only ~a few ranks), which
    is what lets captured range chunks reach the packed-buffer path instead
    of 100+ per-node stacks (measured 64% of emit time on TPU,
    scripts/pack_bisect.py).

    Returns (rank map, {group key: [nids]}, {nid: group key})."""
    eligible: Dict[int, tuple] = {}
    key_count: Dict[tuple, int] = {}
    for nid in order:
        node = tape.nodes[nid]
        if node.op not in VEC_OPS or nid in skip:
            continue
        bk = _base_key(tape, nid)
        eligible[nid] = bk
        key_count[bk] = key_count.get(bk, 0) + 1
    grouped = {
        nid for nid, bk in eligible.items() if key_count[bk] >= VEC_MIN
    }
    rank: Dict[int, int] = {}
    for nid in order:
        node = tape.nodes[nid]
        rank[nid] = max(
            (rank[a] + (1 if a in grouped else 0) for a in node.args),
            default=0,
        )
    groups: Dict[tuple, List[int]] = {}
    for nid in order:
        if nid not in grouped:
            continue
        bk = eligible[nid]
        key = bk if bk[0] == "pick" else (rank[nid],) + bk
        groups.setdefault(key, []).append(nid)
    # a (key, rank) bucket can end up tiny after rank splitting; executing
    # it as a group is still correct (the rank schedule stays topological)
    # but singletons gain nothing over the scalar path
    vgroups = {k: g for k, g in groups.items() if len(g) >= 2}
    member = {nid: k for k, g in vgroups.items() for nid in g}
    return rank, vgroups, member


class _Bufs:
    """Per-width slot buffers of vectorized values ([B, slots, L] batch-major
    or [slots, L, B] lane-major)."""

    def __init__(self, axis: int = 1):
        self.parts: Dict[int, List] = {}
        self.cat: Dict[int, object] = {}
        self.axis = axis

    def append(self, L: int, arr):
        self.parts.setdefault(L, []).append(arr)
        self.cat.pop(L, None)

    def full(self, L: int):
        c = self.cat.get(L)
        if c is None:
            p = self.parts[L]
            c = p[0] if len(p) == 1 else jnp.concatenate(p, axis=self.axis)
            self.parts[L] = [c]
            self.cat[L] = c
        return c


def build_evaluator_packed(
    tape: Tape, roots: Sequence[int], fuse_pallas_modmul: bool = False,
    vectorize: bool = True, lane_major: bool = False,
):
    """Returns (fn, vec_slot). fn(inputs: dict name -> u32[B, limbs]) ->
    (outs: dict nid -> u32[B, limbs], bufs: dict L -> u32[B, S, L]).
    Roots lowered through a vector group are returned packed: vec_slot maps
    such a root nid to its (L, slot-in-bufs[L]); all other roots are in outs.
    Call through jax.jit.

    fuse_pallas_modmul: lower mod(mul(a, b), m) pairs (where the product has
    no other consumer) through the fused Pallas kernel — TPU only, opt-in.

    lane_major: run the whole evaluation in lane-major layout (limb axis
    second-minor, batch minor; kernels/ff_lane.py): inputs are transposed on
    entry and outs/bufs are RETURNED lane-major (outs [L, B], bufs
    [S, L, B]). On TPU the batch then fills the 128-wide vector lanes and
    every limb-index op is a leading-axis slice — measured 2x on mul_mod and
    ~an order of magnitude on table packing vs the [B, L] layout, where
    8-16-limb minor dims waste >=8x of each vector op and gathers cross
    lanes (scripts/lane_microbench.py, scripts/device_profile.py)."""
    if lane_major:
        assert not fuse_pallas_modmul, "pallas fusion is batch-major only"
    order = live_nodes(tape, roots)
    input_names = {nid: name for nid, name, _ in tape.inputs}
    roots_set = set(roots)

    fused: dict = {}
    if fuse_pallas_modmul:
        consumers: Dict[int, int] = {}
        for nid in order:
            for a in tape.nodes[nid].args:
                consumers[a] = consumers.get(a, 0) + 1
        for nid in order:
            node = tape.nodes[nid]
            if node.op != "mod":
                continue
            src = tape.nodes[node.args[0]]
            if (
                src.op == "mul"
                and consumers.get(node.args[0], 0) == 1
                and node.args[0] not in roots_set
                and ff.n_limbs_for(node.const) == 16
                # Barrett in the kernel is exact for any product < 2^512
                and all(tape.nodes[a].bits <= 256 for a in src.args)
            ):
                fused[nid] = (src.args[0], src.args[1], node.const)
    fused_muls = {tape.nodes[nid].args[0] for nid in fused}

    # ---- static vectorization plan ----
    skip = set(fused) | fused_muls
    if vectorize:
        level, vgroups, member = _vector_plan(tape, order, skip)
    else:
        level = {nid: 0 for nid in order}
        vgroups, member = {}, {}

    # execution plan: level-major (a valid topological order even though
    # group members are scattered through nid order); static slot layout
    slot: Dict[int, Tuple[int, int]] = {}
    counts: Dict[int, int] = {}
    exec_plan: List[tuple] = []
    gmeta: Dict[tuple, tuple] = {}
    by_level: Dict[int, List[int]] = {}
    for nid in order:
        by_level.setdefault(level[nid], []).append(nid)
    glevel: Dict[tuple, int] = {k: level[g[0]] for k, g in vgroups.items()}
    for lv in sorted(by_level):
        for nid in by_level[lv]:
            if nid not in member:
                exec_plan.append(("s", nid))
        for key in sorted(
            (k for k, v in glevel.items() if v == lv),
            key=lambda k: vgroups[k][0],
        ):
            g = vgroups[key]
            node0 = tape.nodes[g[0]]
            inj: List[Tuple[int, int]] = []  # (src nid, width) append order
            arg_idx: List[np.ndarray] = []
            arg_L: List[int] = []
            if node0.op != "pick":
                for j in range(len(node0.args)):
                    La = _limbs(tape.nodes[node0.args[j]].bits)
                    idxs = []
                    for nid in g:
                        src = tape.nodes[nid].args[j]
                        if src not in slot:
                            slot[src] = (La, counts.get(La, 0))
                            counts[La] = counts.get(La, 0) + 1
                            inj.append((src, La))
                        assert slot[src][0] == La
                        idxs.append(slot[src][1])
                    arg_idx.append(np.asarray(idxs, dtype=np.int32))
                    arg_L.append(La)
            Lout = _limbs(
                node0.const if node0.op == "assume" else node0.bits
            )
            base = counts.get(Lout, 0)
            for i, nid in enumerate(g):
                slot[nid] = (Lout, base + i)
            counts[Lout] = base + len(g)
            gmeta[key] = (inj, arg_idx, arg_L, Lout)
            exec_plan.append(("g", key))

    # packed root layout (deterministic: sorted nid order per width)
    vec_slot: Dict[int, Tuple[int, int]] = {}
    pack: Dict[int, List[int]] = {}
    for nid in sorted(roots_set):
        if nid in member:
            L, s = slot[nid]
            vec_slot[nid] = (L, len(pack.setdefault(L, [])))
            pack[L].append(s)
    pack_idx = {L: np.asarray(s, dtype=np.int32) for L, s in pack.items()}

    K = fl if lane_major else ff

    def fn(inputs: Dict[str, jnp.ndarray]):
        vals: Dict[int, jnp.ndarray] = {}
        bufs = _Bufs(axis=0 if lane_major else 1)
        B = None
        for arr in inputs.values():
            B = arr.shape[0]
            break

        if lane_major:

            def _in(arr):
                return jnp.moveaxis(jnp.asarray(arr), 0, -1)

            def slot_take(buf, s):
                return buf[s]

            def slot_gather(buf, idx):
                return buf[idx]

            def expand(arr):  # add the slot axis
                return arr[None]

            def bconst(c, L):  # scalar const, broadcast over batch
                return jnp.broadcast_to(_const_arr(c, L)[:, None], (L, B))

            def gconst(arr2d):  # [G, Lc] static, broadcastable over batch
                return jnp.asarray(arr2d)[..., None]

        else:

            def _in(arr):
                return jnp.asarray(arr)

            def slot_take(buf, s):
                return buf[:, s]

            def slot_gather(buf, idx):
                return buf[:, idx]

            def expand(arr):
                return arr[:, None, :]

            def bconst(c, L):
                return jnp.broadcast_to(_const_arr(c, L), (B, L))

            def gconst(arr2d):
                return jnp.asarray(arr2d)

        def val(nid):
            v = vals.get(nid)
            if v is None:
                L, s = slot[nid]
                v = slot_take(bufs.full(L), s)
                vals[nid] = v
            return v

        def nlimbs(v):
            return v.shape[-2] if lane_major else v.shape[-1]

        def run_scalar(nid):
            node: Node = tape.nodes[nid]
            op = node.op
            if nid in fused_muls:
                return  # consumed by a fused pallas mulmod
            if nid in fused:
                from .modmul_pallas_bridge import fused_mul_mod

                a_id, b_id, m = fused[nid]
                vals[nid] = fused_mul_mod(m, val(a_id), val(b_id), _limbs(node.bits))
                return
            if op == "input":
                arr = inputs[input_names[nid]]
                vals[nid] = K.pad_limbs(_in(arr), _limbs(node.bits))
            elif op == "input_vec":
                arr = inputs[input_names[nid]]  # [B, K, limbs]
                vals[nid] = K.pad_limbs(_in(arr), _limbs(node.bits))
            elif op == "pick":
                vals[nid] = slot_take(val(node.args[0]), node.const)
            elif op == "const":
                vals[nid] = bconst(node.const, _limbs(node.bits))
            elif op == "add":
                a, b = val(node.args[0]), val(node.args[1])
                vals[nid] = K.add_limbs(a, b, _limbs(node.bits))
            elif op == "sub":
                a, b = val(node.args[0]), val(node.args[1])
                L = _limbs(node.bits)
                t = K.add_limbs(a, bconst(node.const, L), L)
                d, _ = K.sub_limbs(t, b)
                vals[nid] = d
            elif op == "mulc":
                a = val(node.args[0])
                if _is_pow2(node.const):
                    # shift, not multiply: linear vs La*Lc MACs (the 2^(108i)
                    # limb coefficients dominate witness tapes' mulc ops)
                    vals[nid] = K.shl_limbs(
                        a, node.const.bit_length() - 1, _limbs(node.bits)
                    )
                else:
                    Lc = _limbs(max(node.const.bit_length(), 1))
                    vals[nid] = K.mul_limbs(
                        a, bconst(node.const, Lc), _limbs(node.bits)
                    )
            elif op == "mul":
                a, b = val(node.args[0]), val(node.args[1])
                vals[nid] = K.mul_limbs(a, b, _limbs(node.bits))
            elif op == "mod":
                a = val(node.args[0])
                # width-sized Barrett division: q/mu/product limb counts all
                # scale with the ACTUAL input width (a 255-bit sum costs ~54
                # MACs, not the ~550 of a full 2L-limb reduce padded to 512
                # bits). Exact for any width; the fixed-width barrett_reduce
                # is only kept in the ff kernels' own mul_mod compositions.
                spec = _mk_div_spec(
                    node.const,
                    max(nlimbs(a), ff.n_limbs_for(node.const)),
                    lane_major,
                )
                _, r = K.div_rem_by(spec, K.pad_limbs(a, spec.x_limbs))
                vals[nid] = K.pad_limbs(r, _limbs(node.bits))
            elif op == "div":
                a = val(node.args[0])
                spec = _mk_div_spec(
                    node.const, max(nlimbs(a), ff.n_limbs_for(node.const) + 1),
                    lane_major,
                )
                q, _ = K.div_rem_by(spec, K.pad_limbs(a, spec.x_limbs))
                vals[nid] = K.pad_limbs(q, _limbs(node.bits))
            elif op == "assume":
                vals[nid] = K.pad_limbs(val(node.args[0]), _limbs(node.const))
            elif op == "andmask":
                a = val(node.args[0])
                vals[nid] = K.extract_bit_slice(a, 0, max(node.const.bit_length(), 1))
            elif op == "shr":
                a = val(node.args[0])
                width = max(nlimbs(a) * 16 - node.const, 1)
                vals[nid] = K.extract_bit_slice(a, node.const, width)
            elif op == "inv":
                a = val(node.args[0])
                m = node.const
                f = K.make_field(m)
                vals[nid] = K.pow_mod(f, K.pad_limbs(a, f.L), m - 2)
            elif op == "powm":
                e, m = node.const
                f = K.make_field(m)
                vals[nid] = K.pow_mod(f, K.pad_limbs(val(node.args[0]), f.L), e)
            elif op == "gather":
                *val_ids, idx_id = node.args
                L = _limbs(node.bits)
                if lane_major:
                    stacked = jnp.stack(
                        [K.pad_limbs(val(v), L) for v in val_ids], axis=0
                    )  # [K, L, B]
                    idx = val(idx_id)[..., 0, :].astype(jnp.int32)  # [B]
                    sel = jnp.broadcast_to(idx[None, None, :], (1,) + stacked.shape[1:])
                    vals[nid] = jnp.take_along_axis(stacked, sel, axis=0)[0]
                else:
                    stacked = jnp.stack(
                        [K.pad_limbs(val(v), L) for v in val_ids], axis=0
                    )  # [K, B, L]
                    idx = val(idx_id)[..., 0].astype(jnp.int32)
                    vals[nid] = stacked[idx, jnp.arange(B)]
            else:
                raise NotImplementedError(op)

        def run_group(key):
            g = vgroups[key]
            node0 = tape.nodes[g[0]]
            op = node0.op
            inj, arg_idx, arg_L, Lout = gmeta[key]
            G = len(g)
            if op == "pick":
                src = val(key[1])  # [B, K, Lv] / [K, Lv, B]
                idx = np.asarray([tape.nodes[n].const for n in g], dtype=np.int32)
                bufs.append(Lout, K.pad_limbs(slot_gather(src, idx), Lout))
                return
            for src, La in inj:
                bufs.append(La, expand(K.pad_limbs(val(src), La)))
            args = [
                slot_gather(bufs.full(La), idx)
                for idx, La in zip(arg_idx, arg_L)
            ]
            if op == "add":
                out = K.add_limbs(args[0], args[1], Lout)
            elif op == "sub":
                a, b = args
                # per-member underflow lifts as one static [G, Lout] array
                lifts = gconst(np.stack(
                    [ff.int_to_limbs(tape.nodes[n].const, Lout) for n in g]
                ))
                t = K.add_limbs(a, lifts, Lout)
                out, _ = K.sub_limbs(t, b)
            elif op == "mulc":
                if key[2]:  # all-power-of-two group: per-member shifts
                    shifts = np.asarray(
                        [tape.nodes[n].const.bit_length() - 1 for n in g]
                    )
                    out = K.shl_limbs_vec(args[0], shifts, Lout)
                else:
                    Lc = max(
                        _limbs(max(tape.nodes[n].const.bit_length(), 1))
                        for n in g
                    )
                    c = gconst(np.stack(
                        [ff.int_to_limbs(tape.nodes[n].const, Lc) for n in g]
                    ))
                    out = K.mul_limbs(args[0], c, Lout)
            elif op == "mul":
                out = K.mul_limbs(args[0], args[1], Lout)
            elif op == "mod":
                a = args[0]
                # width-sized Barrett division (see the scalar path)
                spec = _mk_div_spec(
                    node0.const,
                    max(nlimbs(a), ff.n_limbs_for(node0.const)),
                    lane_major,
                )
                _, r = K.div_rem_by(spec, K.pad_limbs(a, spec.x_limbs))
                out = r
            elif op == "div":
                a = args[0]
                spec = _mk_div_spec(
                    node0.const, max(nlimbs(a), ff.n_limbs_for(node0.const) + 1),
                    lane_major,
                )
                q, _ = K.div_rem_by(spec, K.pad_limbs(a, spec.x_limbs))
                out = q
            elif op == "assume":
                out = args[0]
            elif op == "andmask":
                widths = np.asarray(
                    [max(tape.nodes[n].const.bit_length(), 1) for n in g]
                )
                out = K.extract_bit_slice_vec(
                    args[0], np.zeros(G, np.int64), Lout, widths
                )
            elif op == "shr":
                starts = np.asarray([tape.nodes[n].const for n in g])
                out = K.extract_bit_slice_vec(args[0], starts, Lout)
            elif op == "inv":
                f = K.make_field(node0.const)
                out = K.pow_mod(
                    f, K.pad_limbs(args[0], f.L), node0.const - 2
                )
            elif op == "powm":
                e, m = node0.const
                f = K.make_field(m)
                out = K.pow_mod(f, K.pad_limbs(args[0], f.L), e)
            else:  # pragma: no cover
                raise NotImplementedError(op)
            bufs.append(Lout, K.pad_limbs(out, Lout))

        for kind, x in exec_plan:
            if kind == "s":
                run_scalar(x)
            else:
                run_group(x)

        outs = {nid: val(nid) for nid in roots_set if nid not in vec_slot}
        out_bufs = {L: slot_gather(bufs.full(L), idx) for L, idx in pack_idx.items()}
        return outs, out_bufs

    fn.fused_count = len(fused)
    fn.vec_count = len(member)
    return fn, vec_slot


def build_evaluator(tape: Tape, roots: Sequence[int], fuse_pallas_modmul: bool = False):
    """Back-compat form: fn(inputs) -> dict nid -> u32[B, limbs] with every
    root materialised individually (use build_evaluator_packed for tapes
    with many vectorized roots — per-root slicing here re-expands the graph)."""
    packed, vec_slot = build_evaluator_packed(
        tape, roots, fuse_pallas_modmul=fuse_pallas_modmul
    )

    def fn(inputs):
        outs, bufs = packed(inputs)
        out = dict(outs)
        for nid, (L, i) in vec_slot.items():
            out[nid] = bufs[L][:, i]
        return out

    fn.fused_count = packed.fused_count
    return fn
