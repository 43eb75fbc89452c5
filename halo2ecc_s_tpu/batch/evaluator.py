"""Lower a symbolic tape (batch/symbolic.py) to one batched XLA program.

Each node becomes a uint32 16-bit-limb array of statically known width;
ops map onto the exact limb primitives in kernels/ff_jax.py. A liveness pass
keeps only nodes needed for captured cells / outputs / assumption checks.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import ff_jax as ff
from .symbolic import Node, Tape


def _limbs(bits: int) -> int:
    return max((bits + 15) // 16, 1)


@lru_cache(maxsize=None)
def _div_spec(m: int, x_limbs: int) -> ff.DivSpec:
    q_limbs = max(x_limbs - ff.n_limbs_for(m) + 2, 1)
    return ff.DivSpec(m, x_limbs, q_limbs)


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


def build_evaluator(tape: Tape, roots: Sequence[int], fuse_pallas_modmul: bool = False):
    """Returns fn(inputs: dict name -> u32[B, limbs]) -> dict nid -> u32[B, limbs]
    computing exactly the live nodes; call through jax.jit.

    fuse_pallas_modmul: lower mod(mul(a, b), m) pairs (where the product has
    no other consumer) through the fused Pallas kernel — TPU only, opt-in."""
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

    def fn(inputs: Dict[str, jnp.ndarray]):
        vals: Dict[int, jnp.ndarray] = {}
        B = None
        for arr in inputs.values():
            B = arr.shape[0]
            break

        for nid in order:
            node: Node = tape.nodes[nid]
            op = node.op
            if nid in fused_muls:
                continue  # consumed by a fused pallas mulmod
            if nid in fused:
                from .modmul_pallas_bridge import fused_mul_mod

                a_id, b_id, m = fused[nid]
                vals[nid] = fused_mul_mod(m, vals[a_id], vals[b_id], _limbs(node.bits))
                continue
            if op == "input":
                arr = inputs[input_names[nid]]
                vals[nid] = ff.pad_limbs(arr, _limbs(node.bits))
            elif op == "input_vec":
                arr = inputs[input_names[nid]]  # [B, K, limbs]
                vals[nid] = ff.pad_limbs(arr, _limbs(node.bits))
            elif op == "pick":
                vals[nid] = vals[node.args[0]][:, node.const]
            elif op == "const":
                vals[nid] = jnp.broadcast_to(
                    _const_arr(node.const, _limbs(node.bits)), (B, _limbs(node.bits))
                )
            elif op == "add":
                a, b = vals[node.args[0]], vals[node.args[1]]
                vals[nid] = ff.add_limbs(a, b, _limbs(node.bits))
            elif op == "sub":
                a, b = vals[node.args[0]], vals[node.args[1]]
                L = _limbs(node.bits)
                t = ff.add_limbs(a, jnp.broadcast_to(_const_arr(node.const, L), (B, L)), L)
                d, _ = ff.sub_limbs(t, b)
                vals[nid] = d
            elif op == "mulc":
                a = vals[node.args[0]]
                c = _const_arr(node.const, _limbs(max(node.const.bit_length(), 1)))
                vals[nid] = ff.mul_limbs(a, jnp.broadcast_to(c, (B, c.shape[-1])),
                                         _limbs(node.bits))
            elif op == "mul":
                a, b = vals[node.args[0]], vals[node.args[1]]
                vals[nid] = ff.mul_limbs(a, b, _limbs(node.bits))
            elif op == "mod":
                a = vals[node.args[0]]
                Lm = ff.n_limbs_for(node.const)
                if a.shape[-1] <= 2 * Lm:
                    f = ff.make_field(node.const)
                    r = ff.barrett_reduce(f, ff.pad_limbs(a, 2 * Lm))
                else:
                    spec = _div_spec(node.const, a.shape[-1])
                    _, r = ff.div_rem_by(spec, a)
                vals[nid] = ff.pad_limbs(r, _limbs(node.bits))
            elif op == "div":
                a = vals[node.args[0]]
                spec = _div_spec(node.const, max(a.shape[-1], ff.n_limbs_for(node.const) + 1))
                q, _ = ff.div_rem_by(spec, ff.pad_limbs(a, spec.x_limbs))
                vals[nid] = ff.pad_limbs(q, _limbs(node.bits))
            elif op == "assume":
                a = vals[node.args[0]]
                vals[nid] = ff.pad_limbs(a, _limbs(node.const))
            elif op == "andmask":
                a = vals[node.args[0]]
                vals[nid] = ff.extract_bit_slice(a, 0, max(node.const.bit_length(), 1))
            elif op == "shr":
                a = vals[node.args[0]]
                width = max(a.shape[-1] * 16 - node.const, 1)
                vals[nid] = ff.extract_bit_slice(a, node.const, width)
            elif op == "inv":
                a = vals[node.args[0]]
                m = node.const
                f = ff.make_field(m)
                vals[nid] = ff.pow_mod(f, ff.pad_limbs(a, f.L), m - 2)
            elif op == "powm":
                e, m = node.const
                f = ff.make_field(m)
                vals[nid] = ff.pow_mod(f, ff.pad_limbs(vals[node.args[0]], f.L), e)
            elif op == "gather":
                *val_ids, idx_id = node.args
                L = _limbs(node.bits)
                stacked = jnp.stack(
                    [ff.pad_limbs(vals[v], L) for v in val_ids], axis=0
                )  # [K, B, L]
                idx = vals[idx_id][..., 0].astype(jnp.int32)
                vals[nid] = stacked[idx, jnp.arange(B)]
            else:
                raise NotImplementedError(op)

        return {nid: vals[nid] for nid in roots_set}

    fn.fused_count = len(fused)
    return fn
