"""Chained-template execution as ONE lax.scan dispatch.

The MSM witness pipeline's window-chain and final-accumulation phases are
sequential chains: step j's accumulator inputs are step j-1's outputs, and
the row layout of each step is decided by the accumulator's overflow-`times`
signature. Because the times transition is a deterministic function of the
signature, the per-step template sequence is eventually periodic (a short
tail, then a cycle of length L — observed L=4). Running each step as its own
jitted dispatch costs a full host->device round trip per step; on a
remote-attached TPU (axon tunnel) that is ~0.5s each, hundreds of times per
MSM (the reference instead runs these chains inside one rayon scope —
ecc_chip.rs:287-352 — so per-step cost is a function call).

run_chain_scan() compiles the whole periodic part of a chain into a single
XLA program: lax.scan over cycle chunks, whose body runs all L templates'
slab/value emitters back to back, feeding each step's accumulator outputs
into the next step's inputs as the scan carry. Step-varying inputs
(candidate tables, decomposed bits, window lines) are gathered INSIDE the
body from stacked device tensors by the step index. Divergence/width safety
flags are OR-accumulated across all steps. The stacked per-position slabs
and output values come back exactly shaped for Template.instantiate's
_precomputed path, so host-side layout bookkeeping (rows, permutations,
fixed-cell patches) is one instantiate per cycle POSITION instead of one
per step.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def outputs_nid_map(point, prefix: str = "acc") -> Dict[str, int]:
    """Map input-name -> output tape nid for a traced template whose
    `outputs` is an AssignedNonZeroPoint, e.g. accx_l0..accy_native."""
    m = {}
    for coord in ("x", "y"):
        t = getattr(point, coord)
        for j, leaf in enumerate(t.limbs_le):
            m[f"{prefix}{coord}_l{j}"] = leaf.val.nid
        m[f"{prefix}{coord}_native"] = t.native.val.nid
    return m


def outputs_local_cells(point, prefix: str = "acc") -> Dict[str, Tuple]:
    """Map input-name -> (region, col, template-local row) of the output
    cells of an AssignedNonZeroPoint outputs tree (for computing chained
    accumulator input rows from the layout plan, no device data needed)."""
    m = {}
    for coord in ("x", "y"):
        t = getattr(point, coord)
        for j, leaf in enumerate(t.limbs_le):
            c = leaf.cell
            m[f"{prefix}{coord}_l{j}"] = (c.region, c.col, c.row)
        c = t.native.cell
        m[f"{prefix}{coord}_native"] = (c.region, c.col, c.row)
    return m


def discover_cycle(keys: Sequence) -> Optional[Tuple[int, int]]:
    """First (tail, period) of an eventually-periodic key sequence: the
    smallest (i, j) with keys[i] == keys[j], i < j, scanning j outward.
    Returns None if no key repeats."""
    seen: Dict = {}
    for j, k in enumerate(keys):
        if k in seen:
            return seen[k], j - seen[k]
        seen[k] = j
    return None


def slice_tree_lanes(tree, lo: int, hi: int):
    """Slice an instantiate() output tree's lanes [lo:hi) (device value
    arrays stay on device; row arrays are numpy)."""
    import numpy as np

    def conv(node):
        if (
            isinstance(node, tuple)
            and len(node) == 2
            and not isinstance(node[0], tuple)
        ):
            vals, (reg, col, rows) = node
            return vals[lo:hi], (reg, col, np.asarray(rows)[lo:hi])
        if isinstance(node, list):
            return [conv(x) for x in node]
        if isinstance(node, dict):
            return {k: conv(v) if k != "times" else v for k, v in node.items()}
        return node

    return conv(tree)


def run_chain_scan(
    templates: Sequence,  # L templates, one per cycle position
    gather: Callable,  # gather(gather_args, j, l) -> step-varying ins dict
    gather_args,  # pytree of device arrays the gathers index into
    carry_names: Sequence[str],
    carry_out_maps: Sequence[Dict[str, int]],  # per position: name -> nid
    carry0: Dict[str, object],  # name -> u32[B, 16]
    first_step: int,  # global index of the first scanned step
    n_chunks: int,
    collect_slabs: bool = True,
    jit_cache: Dict = None,
    cache_key=None,
):
    """Run steps [first_step, first_step + n_chunks*L) of a template chain
    in one dispatch.

    Returns (per_position, flags, final_carry) where per_position[l] =
    (slabs {ridx: u32[C*B, stride, n_adv, 16]}, outvals {nid: u32[C*B, 16]})
    with lane index c*B + b, flags = {'diverged': bool0, 'width_bad': bool0}
    OR-accumulated over every scanned step, and final_carry maps carry names
    to the last step's output arrays (u32[B, 16], device).
    """
    import jax
    import jax.numpy as jnp

    L = len(templates)
    carry_names = tuple(carry_names)

    fn = None
    if jit_cache is not None and cache_key is not None:
        fn = jit_cache.get(cache_key)
    if fn is None:
        raws = [t.slab_value_emitter_raw() for t in templates]

        def scan_all(args, carry_in, j0):
            # j0 (the global index of the first scanned step) is a runtime
            # argument so segments of one chain share the compiled program
            def body(carry, c):
                ys = []
                for l in range(L):
                    j = j0 + c * L + l
                    ins = gather(args, j, l)
                    for name in carry_names:
                        ins[name] = carry[name]
                    slabs, outvals, flags = raws[l](ins)
                    carry = {
                        name: outvals[carry_out_maps[l][name]]
                        for name in carry_names
                    }
                    ys.append(
                        (slabs if collect_slabs else {}, outvals, flags)
                    )
                return carry, tuple(ys)

            final, ys = jax.lax.scan(
                body, carry_in, jnp.arange(n_chunks, dtype=jnp.int32)
            )
            return final, ys

        from ..utils.export_cache import cached_jit

        fn = cached_jit(
            scan_all,
            "chainscan|%r|%s|%r|%d|%r" % (
                cache_key, ",".join(t.digest() for t in templates),
                carry_names, n_chunks, collect_slabs,
            ),
            "scan",
        )
        if jit_cache is not None and cache_key is not None:
            jit_cache[cache_key] = fn

    final_carry, ys = fn(gather_args, carry0, np.int32(first_step))

    import jax.numpy as jnp

    div = jnp.zeros((), jnp.bool_)
    wid = jnp.zeros((), jnp.bool_)
    per_position = []
    for l in range(L):
        slabs_l, outvals_l, flags_l = ys[l]
        div = div | jnp.any(flags_l["diverged"])
        wid = wid | jnp.any(flags_l["width_bad"])
        slabs = {
            ridx: arr.reshape((-1,) + arr.shape[2:])
            for ridx, arr in slabs_l.items()
        }
        outvals = {
            k: arr.reshape((-1,) + arr.shape[2:]) for k, arr in outvals_l.items()
        }
        per_position.append((slabs, outvals))
    return per_position, {"diverged": div, "width_bad": wid}, final_carry


def chain_layout(
    base_starts: Tuple[int, int, int],
    strides: Sequence[Tuple[int, int, int]],  # per cycle position
    n_chunks: int,
    B: int,
) -> Tuple[List[Tuple[np.ndarray, np.ndarray, np.ndarray]], Tuple[int, int, int]]:
    """Slab-start arrays for a scanned chain laid out in chain order.

    Step s = c*L + l occupies, per region r, B consecutive slabs of
    strides[l][r] rows starting at
    base[r] + B*(c*S[r] + prefix_l[r]) where S = per-cycle stride total.

    Returns (per position l: (starts_base[C*B], starts_range, starts_select)
    int64 arrays with lane index c*B + b, and the total row consumption per
    region)."""
    L = len(strides)
    S = [sum(st[r] for st in strides) for r in range(3)]
    prefix = []
    acc = [0, 0, 0]
    for st in strides:
        prefix.append(tuple(acc))
        for r in range(3):
            acc[r] += st[r]
    c_idx = np.repeat(np.arange(n_chunks, dtype=np.int64), B)
    b_idx = np.tile(np.arange(B, dtype=np.int64), n_chunks)
    per_position = []
    for l in range(L):
        rows = tuple(
            base_starts[r]
            + B * (c_idx * S[r] + prefix[l][r])
            + b_idx * strides[l][r]
            for r in range(3)
        )
        per_position.append(rows)
    total = tuple(B * n_chunks * S[r] for r in range(3))
    return per_position, total
