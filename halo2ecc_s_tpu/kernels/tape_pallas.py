"""Whole-template Pallas TPU kernel: evaluate a witness tape AND assemble
the packed advice slabs for one batch tile entirely in VMEM.

The XLA lowering (batch/evaluator.py + template._assemble_tables_lane)
materialises every tape node and every pack stage in HBM — measured ~10x off
the HBM write roofline on the int_mul template (scripts/device_profile.py,
scripts/pack_bisect.py: the per-node stacks and strided limb-pair packing
dominate). Here the whole tape runs per batch tile with zero intermediate
HBM traffic: the only HBM reads are the template inputs and the only writes
are the final packed slab rows — the memory-minimal form of the witness
workload the reference's row-table writes define (context.rs:634-714).

Design (all Mosaic-friendly, nothing the TPU lowering rejects):
  - a value = Python list of u32[8, W] arrays, one per 16-bit limb: every
    limb op is a full-vreg elementwise op; limb indexing is Python-level
    (no strided sublane slicing, no gathers, no reshapes, no concatenates);
  - batch tile = 8*W instances: inputs arrive pre-shaped u32[L, 8, B//8]
    (one cheap XLA relayout outside the kernel), block (L, 8, W);
  - all static constants (moduli, Barrett mu, shift offsets, table
    constants) are PYTHON INT LITERALS baked into the kernel body — Pallas
    rejects captured array constants, scalars are free;
  - multiplies accumulate raw 32-bit partial sums with build-time bound
    tracking; one bound-checked sequential carry chain per node output
    (bit-exact with kernels/ff_lane.py: same truncate-to-out_len-then-
    normalise semantics);
  - slab rows are written as out_ref[cell*8 + k] = packed pair, a 2-D
    store per row of the [S*8, 8, W] block.

Bit-exactness against the XLA evaluator path is tested by running the SAME
kernel body over numpy ref shims (reference_call — Pallas interpret mode is
far too slow for a 20k-op kernel body; tests/test_tape_pallas.py). Supported
ops cover every tape the symbolic tracer emits: the integer-chip core
(input/const/add/sub/mul/mulc/mod/div/shr/andmask/assume), vector inputs
(input_vec/pick), data-dependent candidate selection (gather — a select
tree matching XLA's clamping take), and modular exponentiation (inv/powm —
the Fermat-inversion nodes inside every EC-addition slope witness,
ecc_chip.rs:840-882): a square-and-multiply `lax.fori_loop` whose
compile-time-constant exponent bit schedule is read from SMEM via scalar
prefetch, so the MSM window/final-step templates (ecc_chip.rs:223-371) run
in ONE Pallas kernel instead of the 70 MB XLA executables that compile for
12-60+ min each through the remote toolchain.

When the per-tile output block would blow the ~16 MB scoped VMEM, the batch
tile W auto-shrinks (128 -> 8 by powers of two) before falling back to the
XLA path — big templates (MSM window steps ~840 cells, scalar decompose
~1900 cells) fit at W=32/16 with zero waste at MSM-phase batch sizes.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import ff_jax as ff

MASK = 0xFFFF

# array module the kernel body's explicit array constructors use: jnp under
# Pallas tracing, numpy in the reference shim (keeps the oracle pure numpy —
# independent of JAX AND ~1000x faster than per-op eager JAX dispatch on the
# 253-iteration Fermat chains)
_xp = jnp

SUPPORTED_OPS = {
    "input", "const", "add", "sub", "mul", "mulc", "mod", "div",
    "shr", "andmask", "assume",
    "input_vec", "pick", "gather", "inv", "powm",
}


def unpack_raw_slab(o, stride: int, n_adv: int, B0: int):
    """Convert a raw kernel-native slab u32[S*8, 8, Bs] (row = cell*8 +
    pair, lane b = sublane*Bs + w) to the batch-major Records-facing
    u32[B0, stride, n_adv, 8]. Works for numpy or jax arrays."""
    import numpy as _np

    S = stride * n_adv
    Bs = o.shape[-1]
    xp = _np if isinstance(o, _np.ndarray) else jnp
    t = o.reshape(S, 8, 8, Bs)
    t = xp.transpose(t, (2, 3, 0, 1)).reshape(8 * Bs, stride, n_adv, 8)
    return t[:B0]


def tape_supported(tape, roots) -> bool:
    from ..batch.evaluator import live_nodes

    return all(
        tape.nodes[n].op in SUPPORTED_OPS for n in live_nodes(tape, roots)
    )


def _limbs(bits: int) -> int:
    return max((bits + 15) // 16, 1)


class _Val:
    """Normalised value: limbs[k] is u32[8, W] < 2^16 (or a Python int for
    all-constant values)."""

    __slots__ = ("limbs",)

    def __init__(self, limbs):
        self.limbs = list(limbs)

    def width(self):
        return len(self.limbs)


def _is_lit(x) -> bool:
    return isinstance(x, int)


def _materialise(v: _Val, shape):
    return [
        _xp.full(shape, l, _xp.uint32) if _is_lit(l) else l for l in v.limbs
    ]


def _carry_norm(raw: List, bounds: List[int], out_len: int) -> List:
    """Sequential carry over raw u32 accumulators, truncating to out_len
    first and dropping the final carry-out — bit-exact with
    ff_lane.carry_norm. Bounds are build-time Python ints; a step that
    could overflow u32 is a build-time AssertionError (never triggers for
    the ops emitted here: mul diagonals stay < 2^22), making the kernel
    provably exact or loudly unbuildable."""
    raw = list(raw[:out_len])
    bounds = list(bounds[:out_len])
    while len(raw) < out_len:
        raw.append(0)
        bounds.append(0)
    outs = []
    c = None
    cb = 0
    for k in range(out_len):
        t = raw[k]
        tb = bounds[k] + cb
        assert tb < (1 << 32), ("carry overflow", k, tb)
        if c is not None and not (_is_lit(c) and c == 0):
            t = t + c
        outs.append(t & MASK)
        c, cb = t >> 16, tb >> 16
    return outs


def _add(a: _Val, b: _Val, out_len: int) -> _Val:
    L = max(a.width(), b.width())
    raw, bounds = [], []
    for k in range(L):
        x = a.limbs[k] if k < a.width() else 0
        y = b.limbs[k] if k < b.width() else 0
        if _is_lit(x) and x == 0:
            raw.append(y)
        elif _is_lit(y) and y == 0:
            raw.append(x)
        else:
            raw.append(x + y)
        bounds.append(2 * MASK)
    return _Val(_carry_norm(raw, bounds, out_len))


def _sub(a: _Val, b: _Val):
    """(a - b) mod 2^(16*La) with borrow-out, b padded/truncated to La —
    bit-exact with ff_lane.sub_limbs. Returns (diff _Val, borrow u32[8,W]
    0/1 array or int)."""
    La = a.width()
    outs = []
    bor = 0
    for k in range(La):
        x = a.limbs[k]
        y = b.limbs[k] if k < b.width() else 0
        t = x + ((1 << 16) - y) - bor
        outs.append(t & MASK)
        bor = 1 - (t >> 16)
    return _Val(outs), bor


def _mul_raw(a: _Val, b: _Val, out_len: int):
    """Raw diagonal accumulation (lo + shifted hi), truncated to out_len —
    the exact set of partial sums ff_lane's mul forms accumulate."""
    La, Lb = a.width(), b.width()
    raw = [0] * out_len
    bounds = [0] * out_len
    for i in range(La):
        ai = a.limbs[i]
        if _is_lit(ai) and ai == 0:
            continue
        for j in range(Lb):
            bj = b.limbs[j]
            if _is_lit(bj) and bj == 0:
                continue
            k = i + j
            if k >= out_len:
                continue
            prod = ai * bj
            lo, hi = prod & MASK, prod >> 16
            raw[k] = lo if _is_lit(raw[k]) and raw[k] == 0 else raw[k] + lo
            bounds[k] += MASK
            if k + 1 < out_len:
                raw[k + 1] = (
                    hi if _is_lit(raw[k + 1]) and raw[k + 1] == 0
                    else raw[k + 1] + hi
                )
                bounds[k + 1] += MASK
    return raw, bounds


def _mul(a: _Val, b: _Val, out_len: int) -> _Val:
    raw, bounds = _mul_raw(a, b, out_len)
    return _Val(_carry_norm(raw, bounds, out_len))


def _lit_val(c: int, L: int) -> _Val:
    return _Val([(c >> (16 * k)) & MASK for k in range(L)])


def _pad(v: _Val, L: int) -> _Val:
    if v.width() >= L:
        return _Val(v.limbs[:L])
    return _Val(v.limbs + [0] * (L - v.width()))


def _select(cond, a: _Val, b: _Val) -> _Val:
    """cond: u32 0/1 array (or int); per-limb where."""
    L = max(a.width(), b.width())
    a, b = _pad(a, L), _pad(b, L)
    if _is_lit(cond):
        return a if cond else b
    c = cond != 0
    outs = []
    for x, y in zip(a.limbs, b.limbs):
        if _is_lit(x) and _is_lit(y) and x == y:
            outs.append(x)
        else:
            xx = x if not _is_lit(x) else _xp.full(c.shape, x, _xp.uint32)
            yy = y if not _is_lit(y) else _xp.full(c.shape, y, _xp.uint32)
            outs.append(_xp.where(c, xx, yy))
    return _Val(outs)


def _extract_bits(v: _Val, start: int, width: int) -> _Val:
    """Bit-exact mirror of ff_lane.extract_bit_slice."""
    L = v.width()
    out_limbs = (width + 15) // 16
    i0, s = divmod(start, 16)
    outs = []
    for k in range(out_limbs):
        lo = (v.limbs[i0 + k] >> s) if i0 + k < L else 0
        if s > 0 and i0 + k + 1 < L:
            hi = (v.limbs[i0 + k + 1] << (16 - s)) & MASK
            lo = hi if (_is_lit(lo) and lo == 0) else lo | hi
        rem = width - k * 16
        if rem < 16:
            lo = lo & ((1 << rem) - 1)
        outs.append(lo & MASK)
    return _Val(outs)


def _shl(v: _Val, s: int, out_len: int) -> _Val:
    """Bit-exact mirror of ff_lane.shl_limbs."""
    i0, r = divmod(s, 16)
    if r:
        y = []
        prev_lo = 0
        for k in range(v.width()):
            hi = (v.limbs[k] << r) & MASK
            cur = hi if (_is_lit(prev_lo) and prev_lo == 0) else hi | prev_lo
            y.append(cur)
            prev_lo = v.limbs[k] >> (16 - r)
        y.append(prev_lo)
    else:
        y = list(v.limbs)
    y = [0] * i0 + y
    return _pad(_Val(y), out_len)


def _div_rem(v: _Val, w: int, x_limbs: int, q_limbs: int):
    """Bit-exact mirror of ff_lane.div_rem_by (Barrett, 2 corrections)."""
    k = ff.n_limbs_for(w)
    mu = (1 << (16 * x_limbs)) // w
    mu_v = _lit_val(mu, x_limbs - k + 2)
    w_v = _lit_val(w, k)
    x = _pad(v, x_limbs)
    q1 = _Val(x.limbs[k - 1:])
    q2 = _mul(q1, mu_v, q1.width() + mu_v.width())
    q_hat = _Val(q2.limbs[x_limbs - k + 1:][:q_limbs])
    qw = _mul(q_hat, w_v, x_limbs + 1)
    x_ext = _pad(x, x_limbs + 1)
    r, _ = _sub(x_ext, qw)
    w_ext = _pad(w_v, r.width())
    one = _lit_val(1, q_limbs)
    for _ in range(2):
        d, borrow = _sub(r, w_ext)
        qadd = _add(q_hat, one, q_limbs)
        take = borrow == 0 if not _is_lit(borrow) else int(borrow == 0)
        r = _select(take, d, r)
        q_hat = _select(take, qadd, q_hat)
    return q_hat, _Val(r.limbs[:k])


class _Ref:
    """Numpy ref shim so the kernel body runs outside Pallas for tests."""

    __slots__ = ("arr",)

    def __init__(self, arr):
        self.arr = arr

    @property
    def shape(self):
        return self.arr.shape

    def __getitem__(self, idx):
        return self.arr[idx]

    def __setitem__(self, idx, v):
        self.arr[idx] = np.asarray(v, dtype=np.uint32)


def build_slab_kernel(
    tmpl, W: int = 128, reference: bool = False, with_outputs: bool = False,
    interpret: bool = False, raw_slabs: bool = False,
):
    """Build fn(inputs: {name: u32[B, 16]}) -> {ridx: u32[B, stride, n_adv,
    8]} computing the template's packed advice slabs in ONE Pallas kernel
    (bit-exact with Template._assemble_tables_lane + the XLA evaluator).

    with_outputs=True returns the full slab_value_emitter contract instead:
    fn(inputs) -> (slabs, outvals {nid|("vec",i): u32[B,16]|[B,K,16]},
    flags {'diverged': bool0, 'width_bad': bool0}) — output-leaf values and
    the divergence/width safety masks are computed in-kernel (per-lane OR
    masks, reduced outside), so deferred device pipelines (MSM phases) run
    through the same single kernel.

    Returns None if the tape uses unsupported ops. The returned callable
    handles the [B,16] -> [L,8,B//8] input relayout and the inverse slab
    relayout with ordinary XLA ops (a few % of the slab bytes).

    reference=True runs the SAME kernel body over numpy ref shims, one tile
    at a time — the bit-exactness oracle for tests (Pallas interpret mode
    cannot execute a 20k-op body in reasonable time)."""
    from ..batch.evaluator import live_nodes

    tape = tmpl.tape
    roots = tuple(tmpl._roots())
    if not tape_supported(tape, roots):
        return None
    order = live_nodes(tape, roots)
    nodes = tape.nodes
    input_names = {nid: name for nid, name, _ in tape.inputs}
    rinfo = tmpl._region_const_info()

    regions = [r for r, info in enumerate(rinfo) if info is not None]
    declared = {}
    for nid, name, bits in tape.inputs:
        declared[name] = bits

    # output-leaf / flag layout (mirrors Template._build_slab_emitter)
    out_nids: List[int] = []
    vec_groups: List[Tuple[int, ...]] = []
    aec: List[Tuple[int, int]] = []
    achk: List[Tuple[int, int]] = []
    val_rows = 0
    row_of: Dict = {}
    if with_outputs:
        from ..batch.template import _iter_leaves, _iter_vecs
        from ..batch.symbolic import SymVal

        for v in _iter_vecs(tmpl.outputs):
            assert all(isinstance(l.val, SymVal) for l in v.leaves)
            vec_groups.append(tuple(l.val.nid for l in v.leaves))
        vec_leaf_nids = {nid for g in vec_groups for nid in g}
        out_nids = sorted(
            {
                leaf.val.nid
                for leaf in _iter_leaves(tmpl.outputs)
                if isinstance(leaf.val, SymVal)
            }
            - vec_leaf_nids
        )
        aec = list(tape.assume_equal_const)
        achk = sorted(set(tape.assume_checks))
        for nid in out_nids:
            row_of[nid] = val_rows
            val_rows += 16
        for i, g in enumerate(vec_groups):
            row_of[("vec", i)] = val_rows
            val_rows += 16 * len(g)

    # assume_equal_const wider than the value's natural limb width: the XLA
    # evaluator flags such a lane as diverged; the kernel's runtime assert
    # would crash emitter construction instead — pre-check here and fall
    # back to the XLA path (loud failures stay reserved for genuinely
    # exactness-breaking bounds like carry overflow).
    for aec_nid, aec_const in tape.assume_equal_const:
        if aec_const >> (16 * _limbs(nodes[aec_nid].bits)):
            import sys

            print(
                "# tape_pallas: assume_equal_const wider than node width "
                f"(node {aec_nid}); using the XLA path",
                file=sys.stderr,
            )
            return None

    # VMEM gate + tile auto-fit: the per-tile OUTPUT blocks live in scoped
    # VMEM (~16 MB on v5e); big templates (MSM window steps ~840
    # cells/instance, scalar decompose ~1900) blow it at W=128 ("Ran out of
    # memory in memory space vmem ... scoped allocation"). out_bytes scales
    # linearly with W, so shrink the tile until it fits (small W costs lane
    # utilisation, not correctness — and MSM-phase batches are ~100-300
    # lanes, where a 256-lane tile wastes nothing); only fall back to the
    # XLA path if even W=8 cannot fit.
    out_rows = sum(
        rinfo[r][0] * rinfo[r][1] * 8 for r in regions
    ) + val_rows + (2 if with_outputs else 0)

    def _limb_count(node):
        if node.op == "input_vec":
            K_, vbits = node.const
            return K_ * _limbs(vbits)
        return _limbs(node.bits)

    # live tape values share VMEM too; rough upper estimate by total widths
    val_units = sum(_limb_count(tape.nodes[n]) for n in order)

    in_units = sum(
        _limb_count(tape.nodes[nid]) for nid, _name, _bits in tape.inputs
    )

    def _fits(w: int, strict: bool) -> bool:
        ob = out_rows * 8 * w * 4
        ib = in_units * 8 * w * 4
        vb = val_units * 8 * w * 4
        if not strict:
            # the legacy gate the W=128 int_mul headline kernel measured
            # against (keeps its lowering byte-identical -> cache hits)
            return ob <= 12 << 20 and ob + vb // 4 <= 48 << 20
        # fallback tiles run with an explicit vmem_limit_bytes raise (the
        # 16 MB default scoped budget is conservative; v5e has 128 MB VMEM
        # per core). Mosaic's stack was observed between 1.6x and ~7x the
        # naive out+in+val estimate (assign's inv fori loops: 4.7x;
        # decompose at W=16: 77 MB vs 11.1 naive under the raised budget —
        # the allocator gets greedier with more headroom). Budget 5x naive
        # against 48 MB, leaving 16 MB of model-error slack under the
        # 64 MB vmem_limit_bytes.
        return 5 * (ob + ib + vb) <= 48 << 20

    if _fits(W, strict=False):
        raise_vmem = False
    else:
        for cand_w in (64, 32, 16, 8):
            if cand_w < W and _fits(cand_w, strict=True):
                W = cand_w
                break
        else:
            return None
        # Mosaic requires lane-dim blocks divisible by 128 OR equal to the
        # whole array: sub-128 tiles therefore run as per-tile single-block
        # pallas_calls (grid=(1,), block == array) over lane slices.
        # These kernels also get the raised vmem budget (see _fits).
        raise_vmem = True

    # modular-exponentiation schedule (inv/powm): MSB-first square-and-
    # multiply over a compile-time-constant exponent. The bit schedule
    # (deduped by exponent — every bn254-Fq Fermat inverse shares one
    # block) is passed to the Pallas kernel as a scalar-prefetch SMEM
    # array and indexed by the fori_loop counter; the reference shim loops
    # over the same static bits in Python.
    pow_bits: Dict[int, List[int]] = {}
    sched_off: Dict[int, int] = {}
    sched_list: List[int] = []
    for n in order:
        node = nodes[n]
        if node.op not in ("inv", "powm"):
            continue
        e = node.const - 2 if node.op == "inv" else node.const[0]
        if e < 2:
            pow_bits[e] = []
            continue
        if e in pow_bits:
            continue
        bits_e = [(e >> i) & 1 for i in range(e.bit_length() - 2, -1, -1)]
        pow_bits[e] = bits_e
        sched_off[e] = len(sched_list)
        sched_list.extend(bits_e)
    sched_arr = (
        np.asarray(sched_list, dtype=np.int32) if sched_list else None
    )
    use_sched = sched_arr is not None and not reference

    def kernel(*refs):
        if use_sched:
            sched_ref, refs = refs[0], refs[1:]
        else:
            sched_ref = None
        in_refs = refs[: len(tape.inputs)]
        out_refs = refs[len(tape.inputs):]
        shape = in_refs[0][0].shape  # [8, W]
        vals: Dict[int, _Val] = {}
        vec_refs: Dict[int, Tuple] = {}  # input_vec nid -> (ref, K, Lv)
        name_ref = {}
        for (nid, name, bits), ref in zip(tape.inputs, in_refs):
            name_ref[name] = ref

        def modmul(m: int, k: int, x: _Val, y: _Val) -> _Val:
            """(x*y) mod m for x,y < 2^(16k) — the same width-sized Barrett
            the evaluator's mul_mod chains perform."""
            t = _mul(x, y, 2 * k)
            _, r = _div_rem(t, m, 2 * k, max(k + 2, 1))
            return r

        for nid in order:
            node = nodes[nid]
            op = node.op
            if op == "input":
                ref = name_ref[input_names[nid]]
                La = ref.shape[0]
                L = _limbs(node.bits)
                vals[nid] = _Val(
                    [ref[k] for k in range(min(L, La))] + [0] * max(L - La, 0)
                )
            elif op == "input_vec":
                K_, vbits = node.const
                ref = name_ref[input_names[nid]]
                vec_refs[nid] = (ref, K_, ref.shape[0] // K_)
            elif op == "pick":
                ref, K_, Lv = vec_refs[node.args[0]]
                L = _limbs(node.bits)
                k0 = node.const * Lv
                vals[nid] = _Val(
                    [ref[k0 + j] for j in range(min(Lv, L))]
                    + [0] * max(L - Lv, 0)
                )
            elif op == "gather":
                # values[idx] per lane, idx < K on honest traces; built as a
                # select tree seeded with the LAST candidate so out-of-range
                # indices clamp exactly like the evaluator's XLA take
                *vids, idx_id = node.args
                L = _limbs(node.bits)
                cands = [_pad(vals[v], L) for v in vids]
                idx = vals[idx_id].limbs[0]
                out = cands[-1]
                for kk in range(len(cands) - 2, -1, -1):
                    cond = (
                        int(idx == kk) if _is_lit(idx) else idx == kk
                    )
                    out = _select(cond, cands[kk], out)
                vals[nid] = out
            elif op in ("inv", "powm"):
                if op == "inv":
                    e, m = node.const - 2, node.const
                else:
                    e, m = node.const
                k = ff.n_limbs_for(m)
                base = _pad(vals[node.args[0]], k)
                L = _limbs(node.bits)
                if e == 0:
                    vals[nid] = _pad(_lit_val(1, 1), L)
                elif e == 1:
                    # mirror pow_mod's e=1: one reduction to canonical
                    _, r = _div_rem(base, m, k, max(2, 1))
                    vals[nid] = _pad(r, L)
                else:
                    bits_e = pow_bits[e]
                    if sched_ref is None:
                        # reference shim: static Python loop, op-for-op the
                        # sequence the fori_loop body performs per bit
                        acc = base
                        for bit in bits_e:
                            acc = modmul(m, k, acc, acc)
                            if bit:
                                acc = modmul(m, k, acc, base)
                        vals[nid] = _pad(acc, L)
                    else:
                        off = sched_off[e]
                        base_m = tuple(_materialise(base, shape))

                        def pow_body(i, acc_limbs, _off=off, _m=m, _k=k,
                                     _base=base_m):
                            acc = _Val(list(acc_limbs))
                            sq = modmul(_m, _k, acc, acc)
                            t = modmul(_m, _k, sq, _Val(list(_base)))
                            bit = sched_ref[_off + i]
                            out = _select(bit == 1, t, sq)
                            return tuple(_materialise(out, shape))

                        acc = jax.lax.fori_loop(
                            0, len(bits_e), pow_body, base_m
                        )
                        vals[nid] = _pad(_Val(list(acc)), L)
            elif op == "const":
                vals[nid] = _lit_val(node.const, _limbs(node.bits))
            elif op == "add":
                a, b = vals[node.args[0]], vals[node.args[1]]
                vals[nid] = _add(a, b, _limbs(node.bits))
            elif op == "sub":
                a, b = vals[node.args[0]], vals[node.args[1]]
                L = _limbs(node.bits)
                t = _add(a, _lit_val(node.const, L), L)
                d, _ = _sub(t, b)
                vals[nid] = d
            elif op == "mul":
                a, b = vals[node.args[0]], vals[node.args[1]]
                vals[nid] = _mul(a, b, _limbs(node.bits))
            elif op == "mulc":
                a = vals[node.args[0]]
                c = node.const
                L = _limbs(node.bits)
                if c > 0 and (c & (c - 1)) == 0:
                    vals[nid] = _shl(a, c.bit_length() - 1, L)
                else:
                    Lc = _limbs(max(c.bit_length(), 1))
                    vals[nid] = _mul(a, _lit_val(c, Lc), L)
            elif op in ("mod", "div"):
                a = vals[node.args[0]]
                m = node.const
                k = ff.n_limbs_for(m)
                # width-sized spec, mirroring batch/evaluator.py exactly
                # (the stored-width bucket feeds nlimbs there; here the
                # value width is the natural one — both give the same
                # exact q/r, and the OUTPUT limbs are the canonical value)
                if op == "mod":
                    x_limbs = max(a.width(), k)
                else:
                    x_limbs = max(a.width(), k + 1)
                q_limbs = max(x_limbs - k + 2, 1)
                q, r = _div_rem(a, m, x_limbs, q_limbs)
                out = r if op == "mod" else q
                vals[nid] = _pad(out, _limbs(node.bits))
            elif op == "andmask":
                a = vals[node.args[0]]
                vals[nid] = _extract_bits(a, 0, max(node.const.bit_length(), 1))
            elif op == "shr":
                a = vals[node.args[0]]
                width = max(a.width() * 16 - node.const, 1)
                vals[nid] = _extract_bits(a, node.const, width)
            elif op == "assume":
                vals[nid] = _pad(vals[node.args[0]], _limbs(node.const))
            else:  # pragma: no cover
                raise NotImplementedError(op)

        slab_refs = out_refs[: len(regions)]
        if with_outputs:
            vref = out_refs[len(regions)] if val_rows else None
            fref = out_refs[-1]

            def write_val(base_row, v: _Val):
                v = _pad(v, 16)
                for k in range(16):
                    l = v.limbs[k]
                    vref[base_row + k] = (
                        _xp.full(shape, l, _xp.uint32) if _is_lit(l) else l
                    )

            for nid in out_nids:
                write_val(row_of[nid], vals[nid])
            for i, g in enumerate(vec_groups):
                for j, nid in enumerate(g):
                    write_val(row_of[("vec", i)] + 16 * j, vals[nid])

            zero = _xp.zeros(shape, _xp.uint32)
            div_mask = zero
            for nid, const_v in aec:
                v = vals[nid]
                for k in range(v.width()):
                    want = (const_v >> (16 * k)) & MASK
                    l = v.limbs[k]
                    if _is_lit(l):
                        if l != want:
                            div_mask = div_mask | _xp.uint32(1)
                    else:
                        div_mask = div_mask | (l != want).astype(_xp.uint32)
                assert const_v >> (16 * v.width()) == 0, (nid, const_v)
            wid_mask = zero
            for nid, kbits in achk:
                v = vals[nid]
                L = (kbits + 15) // 16
                for k in range(L, v.width()):
                    l = v.limbs[k]
                    if _is_lit(l):
                        if l != 0:
                            wid_mask = wid_mask | _xp.uint32(1)
                    else:
                        wid_mask = wid_mask | (l != 0).astype(_xp.uint32)
                rem = kbits % 16
                if rem and L - 1 < v.width():
                    l = v.limbs[L - 1]
                    if _is_lit(l):
                        if l >> rem:
                            wid_mask = wid_mask | _xp.uint32(1)
                    else:
                        wid_mask = wid_mask | (l >> rem != 0).astype(_xp.uint32)
            fref[0] = div_mask
            fref[1] = wid_mask

        # slab writes: packed 16-bit limb pairs, row (cell*8 + k)
        for out_ref, ridx in zip(slab_refs, regions):
            stride, n_adv, const, captures = rinfo[ridx]
            cap = {(r, c): nid for (r, c, nid) in captures}
            for r in range(stride):
                for c in range(n_adv):
                    cell = r * n_adv + c
                    nid = cap.get((r, c))
                    if nid is None:
                        for k in range(8):
                            out_ref[cell * 8 + k] = _xp.full(
                                shape, int(const[r, c, k]), _xp.uint32
                            )
                    else:
                        v = _pad(vals[nid], 16)
                        for k in range(8):
                            lo, hi = v.limbs[2 * k], v.limbs[2 * k + 1]
                            if _is_lit(lo) and _is_lit(hi):
                                out_ref[cell * 8 + k] = _xp.full(
                                    shape, lo | (hi << 16), _xp.uint32
                                )
                            else:
                                lo = lo if not _is_lit(lo) else _xp.full(shape, lo, _xp.uint32)
                                p = lo if _is_lit(hi) and hi == 0 else lo | (
                                    (hi if not _is_lit(hi) else _xp.full(shape, hi, _xp.uint32)) << 16
                                )
                                out_ref[cell * 8 + k] = p

    from jax.experimental import pallas as pl

    def _reference_call(inputs):
        B0 = next(iter(inputs.values())).shape[0]
        tile = 8 * W
        B = -(-B0 // tile) * tile  # pad up, mirroring call(): lane 0
        # replicated (valid values -> no spurious divergence flags)
        Bs = B // 8
        prep = []
        for nid, name, bits in tape.inputs:
            arr = np.asarray(inputs[name])
            if isinstance(bits, tuple):  # input_vec: [B, K, Lv] -> [B, K*Lv]
                arr = arr.reshape(arr.shape[0], -1)
            if B != B0:
                arr = np.concatenate(
                    [arr, np.broadcast_to(arr[:1], (B - B0,) + arr.shape[1:])],
                    axis=0,
                )
            La = arr.shape[-1]
            prep.append(
                np.ascontiguousarray(arr.T).reshape(La, 8, Bs)
            )
        outs = []
        for ridx in regions:
            stride, n_adv, _c, _cap = rinfo[ridx]
            outs.append(np.zeros((stride * n_adv * 8, 8, Bs), np.uint32))
        if with_outputs:
            if val_rows:
                outs.append(np.zeros((val_rows, 8, Bs), np.uint32))
            outs.append(np.zeros((2, 8, Bs), np.uint32))
        global _xp
        _xp_saved, _xp = _xp, np  # pure-numpy oracle (see _xp note above)
        try:
            for t in range(Bs // W):
                sl = slice(t * W, (t + 1) * W)
                refs = [_Ref(a[:, :, sl]) for a in prep] + [
                    _Ref(o[:, :, sl]) for o in outs
                ]
                kernel(*refs)
        finally:
            _xp = _xp_saved
        slabs = {}
        for ridx, o in zip(regions, outs[: len(regions)]):
            if raw_slabs:
                slabs[ridx] = o
                continue
            stride, n_adv, _c, _cap = rinfo[ridx]
            S = stride * n_adv
            t = o.reshape(S, 8, 8, Bs)
            slabs[ridx] = np.ascontiguousarray(
                t.transpose(2, 3, 0, 1)
            ).reshape(B, stride, n_adv, 8)[:B0]
        if not with_outputs:
            return slabs
        extra = outs[len(regions):]
        vo = extra[0] if val_rows else None
        fo = extra[-1]
        outvals = {
            k: v[:B0] for k, v in _assemble_outvals(vo, B, Bs, np).items()
        }
        flags = {
            "diverged": bool(fo[0].any()),
            "width_bad": bool(fo[1].any()),
        }
        return slabs, outvals, flags

    def _assemble_outvals(vo, B, Bs, xp):
        """vo: [val_rows, 8, Bs] -> {nid: [B,16]} / {("vec",i): [B,K,16]}."""
        outvals = {}
        if vo is None:
            return outvals
        for nid in out_nids:
            t = vo[row_of[nid] : row_of[nid] + 16]  # [16, 8, Bs]
            outvals[nid] = xp.transpose(t, (1, 2, 0)).reshape(B, 16)
        for i, g in enumerate(vec_groups):
            K = len(g)
            r0 = row_of[("vec", i)]
            t = vo[r0 : r0 + 16 * K].reshape(K, 16, 8, Bs)
            outvals[("vec", i)] = xp.transpose(t, (2, 3, 0, 1)).reshape(B, K, 16)
        return outvals

    if reference:
        return _reference_call

    def call(inputs: Dict[str, jnp.ndarray]):
        B0 = next(iter(inputs.values())).shape[0]
        tile = 8 * W
        B = -(-B0 // tile) * tile  # pad up: lane 0 replicated (valid
        # values -> no spurious divergence flags; padded lanes sliced off)
        Bs = B // 8
        grid = (Bs // W,)
        # index maps take an extra trailing arg per scalar-prefetch operand
        if use_sched:
            def _imap(i, _s):
                return (0, 0, i)
        else:
            def _imap(i):
                return (0, 0, i)
        prep = []
        in_specs = []
        for nid, name, bits in tape.inputs:
            arr = jnp.asarray(inputs[name])  # [B0, La] / [B0, K, Lv]
            if isinstance(bits, tuple):  # input_vec -> flat [B0, K*Lv]
                arr = arr.reshape(arr.shape[0], -1)
            if B != B0:
                fill = jnp.broadcast_to(arr[:1], (B - B0,) + arr.shape[1:])
                arr = jnp.concatenate([arr, fill], axis=0)
            La = arr.shape[-1]
            # [B, L] -> [L, 8, B//8]; b = s * (B//8) + w
            a = jnp.transpose(arr, (1, 0)).reshape(La, 8, Bs)
            prep.append(a)
            in_specs.append(pl.BlockSpec((La, 8, W), _imap))
        out_shapes = []
        out_specs = []
        for ridx in regions:
            stride, n_adv, _c, _cap = rinfo[ridx]
            S = stride * n_adv
            out_shapes.append(
                jax.ShapeDtypeStruct((S * 8, 8, Bs), jnp.uint32)
            )
            out_specs.append(pl.BlockSpec((S * 8, 8, W), _imap))
        if with_outputs:
            if val_rows:
                out_shapes.append(
                    jax.ShapeDtypeStruct((val_rows, 8, Bs), jnp.uint32)
                )
                out_specs.append(
                    pl.BlockSpec((val_rows, 8, W), _imap)
                )
            out_shapes.append(jax.ShapeDtypeStruct((2, 8, Bs), jnp.uint32))
            out_specs.append(pl.BlockSpec((2, 8, W), _imap))
        def _invoke(specs_in, specs_out, shapes, g, args):
            from jax.experimental.pallas import tpu as pltpu

            extra = {}
            if raise_vmem and not interpret:
                extra["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=64 << 20
                )
            if use_sched:
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=g,
                    in_specs=specs_in,
                    out_specs=specs_out,
                )
                return pl.pallas_call(
                    kernel,
                    grid_spec=grid_spec,
                    out_shape=shapes,
                    interpret=interpret,
                    **extra,
                )(jnp.asarray(sched_arr), *args)
            return pl.pallas_call(
                kernel,
                grid=g,
                in_specs=specs_in,
                out_specs=specs_out,
                out_shape=shapes,
                interpret=interpret,
                **extra,
            )(*args)

        if W % 128 == 0 or Bs == W:
            outs = _invoke(in_specs, out_specs, out_shapes, grid, prep)
        else:
            # sub-128 lane tiles: Mosaic only allows lane-dim blocks that
            # are multiples of 128 or the whole array, so each tile runs as
            # its own single-block call over a lane slice; identical
            # layout/results, T device-side launches instead of a grid
            tile_shapes = [
                jax.ShapeDtypeStruct(s.shape[:-1] + (W,), s.dtype)
                for s in out_shapes
            ]
            parts = [[] for _ in out_shapes]
            for t in range(Bs // W):
                args_t = [a[:, :, t * W : (t + 1) * W] for a in prep]
                outs_t = _invoke(
                    in_specs, out_specs, tile_shapes, (1,), args_t
                )
                if not isinstance(outs_t, (list, tuple)):
                    outs_t = [outs_t]
                for i, o in enumerate(outs_t):
                    parts[i].append(o)
            outs = [jnp.concatenate(p, axis=-1) for p in parts]
        slabs = {}
        for ridx, o in zip(regions, outs[: len(regions)]):
            if raw_slabs:
                # kernel-native lane-major layout: u32[S*8, 8, Bs] with row
                # cell*8 + pair and lane b = sublane*Bs + w (padded lanes
                # kept). Skipping the batch-major transpose removes ~73%
                # of the headline emit's device time (the transpose
                # re-reads+rewrites the whole slab; measured 7.1 of
                # 9.7 ms/iter at B=2^17). unpack_raw_slab() converts.
                slabs[ridx] = o
                continue
            stride, n_adv, _c, _cap = rinfo[ridx]
            S = stride * n_adv
            # [S*8, 8, Bs] -> [B, stride, n_adv, 8]
            t = o.reshape(S, 8, 8, Bs)
            t = jnp.transpose(t, (2, 3, 0, 1)).reshape(B, stride, n_adv, 8)
            slabs[ridx] = t[:B0]
        if not with_outputs:
            return slabs
        extra = outs[len(regions):]
        vo = extra[0] if val_rows else None
        fo = extra[-1]
        outvals = {
            k: v[:B0] for k, v in _assemble_outvals(vo, B, Bs, jnp).items()
        }
        flags = {
            "diverged": jnp.any(fo[0] != 0),
            "width_bad": jnp.any(fo[1] != 0),
        }
        return slabs, outvals, flags

    return call
