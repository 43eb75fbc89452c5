"""Batched IntegerChip witness generation: the device computes every witness
value for B parallel `assign_w(a); assign_w(b); int_mul(a, b)` templates in
one jitted XLA program, and the emitter scatters whole column blocks into the
Records tables.

This is the TPU-native equivalent of the reference's hot path (int_mul,
integer_chip.rs:466-483, ~30 rows per instance computed with host bigints):
witness hints d = a*b div w (Barrett div_rem), carries v_h/v_l, limb chunks —
all batched. Emission order and cell layout mirror the scalar path exactly;
test_batch.py checks bit-exact table equality against it.

Currently specialised to 3-limb fields (bn254 Fq/Fr-sized W over bn254 Fr) —
the configuration the reference optimises for.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.context import Context
from ..core.range_info import range_info
from ..kernels import ff_jax as ff
from ..ops.integer_ops import IntegerContext
from ..utils.fields import BN254_FR
from .emitter import BAssigned, BatchEmitter


def limbs_to_u64(x: np.ndarray) -> np.ndarray:
    """u32[B, L<=16] limb array -> u64[B, 4] packed words."""
    if x.shape[-1] < 16:
        x = np.concatenate(
            [x, np.zeros(x.shape[:-1] + (16 - x.shape[-1],), np.uint32)], axis=-1
        )
    return ff.limbs16_to_u64x4(x)


def chunk_cols_to_u64(chunks: np.ndarray) -> List[np.ndarray]:
    """u32[B, k] 18-bit chunks -> k arrays of u64[B, 4]."""
    B, k = chunks.shape
    out = []
    for c in range(k):
        a = np.zeros((B, 4), dtype=np.uint64)
        a[:, 0] = chunks[:, c]
        out.append(a)
    return out


@dataclass
class BatchInteger:
    """Batch analogue of AssignedInteger (all limbs times=1)."""

    limbs: List[BAssigned]
    native: BAssigned


def get_engine(w_modulus: int, n_modulus: int = BN254_FR) -> "IntMulBatchEngine":
    """Process-wide engine cache (jitted kernels are expensive to rebuild)."""
    key = (w_modulus, n_modulus)
    if key not in _ENGINES:
        _ENGINES[key] = IntMulBatchEngine(w_modulus, n_modulus)
    return _ENGINES[key]


_ENGINES: Dict[Tuple[int, int], "IntMulBatchEngine"] = {}


class IntMulBatchEngine:
    """Witness kernel + emitter for batched W-over-N multiplication."""

    def __init__(self, w_modulus: int, n_modulus: int = BN254_FR):
        self.info = range_info(w_modulus, n_modulus)
        info = self.info
        assert info.limbs == 3 and info.mul_check_limbs == 3, (
            "batch engine currently targets 3-limb fields"
        )
        self.n = n_modulus
        self.w = w_modulus
        self.fr = ff.make_field(n_modulus)
        # a*b < 2^(2*w_ceil_bits) for canonical inputs
        self.div_w = ff.DivSpec(w_modulus, 2 * ff.n_limbs_for(info.w_ceil - 1), 17)
        self._wit = jax.jit(self._witness)
        self._strides = None

    # ------------------------------------------------------------------
    # device witness computation
    # ------------------------------------------------------------------

    def _mod_n(self, x):
        """Canonicalise a value < 2n into [0, n)."""
        x = ff.pad_limbs(x, self.fr.L + 1)
        d, borrow = ff.sub_limbs(x, self.fr.p_limbs)
        return ff.select_limbs(borrow == 0, d, x)[..., : self.fr.L]

    def _split_limbs(self, x16, leading_bits: int):
        info = self.info
        lb = info.limb_bits
        parts = []
        for j in range(info.limbs):
            width = lb if j < info.limbs - 1 else leading_bits
            parts.append(ff.extract_bit_slice(x16, j * lb, width))
        return parts

    def _witness(self, a16, b16):
        info = self.info
        fr = self.fr
        n = self.n
        out: Dict[str, jnp.ndarray] = {}

        full = ff.mul_limbs(a16, b16, self.div_w.x_limbs)
        d_q, rem16 = ff.div_rem_by(self.div_w, full)

        vals = {"a": a16, "b": b16, "rem": rem16}
        natives = {}
        limb_vals = {}
        for name, x in vals.items():
            parts = self._split_limbs(x, info.w_ceil_bits - (info.limbs - 1) * info.limb_bits)
            for j, part in enumerate(parts):
                nm = f"{name}_l{j}"
                limb_vals[nm] = ff.pad_limbs(part, fr.L)
                out[nm] = limb_vals[nm]
                cnt = 6 if j < info.limbs - 1 else info.w_ceil_leading_decompose
                out[f"{name}_c{j}"] = ff.extract_chunks(part, 18, cnt)
            natives[name] = self._mod_n(x)
            out[f"{name}_native"] = natives[name]

        # d: limbs + chunks + native
        d_parts = self._split_limbs(
            ff.pad_limbs(d_q, 17), info.d_bits - (info.limbs - 1) * info.limb_bits
        )
        for j, part in enumerate(d_parts):
            nm = f"d_l{j}"
            limb_vals[nm] = ff.pad_limbs(part, fr.L)
            out[nm] = limb_vals[nm]
            cnt = 6 if j < info.limbs - 1 else info.d_leading_decompose
            out[f"d_c{j}"] = ff.extract_chunks(part, 18, cnt)
        out["d_native"] = ff.barrett_reduce(fr, ff.pad_limbs(d_q, 2 * fr.L))

        # convolution rows (mul_add_with_next_line chains)
        mul = partial(ff.mul_mod, fr)
        add = partial(ff.add_mod, fr)

        def cst(v):
            return jnp.asarray(ff.int_to_limbs(v % n, fr.L))[None, :]

        mw = [cst((-info.w_modulus_limbs_le[j]) % n) for j in range(3)]
        al = [limb_vals[f"a_l{j}"] for j in range(3)]
        bl = [limb_vals[f"b_l{j}"] for j in range(3)]
        dl = [limb_vals[f"d_l{j}"] for j in range(3)]

        conv = []
        for pos in range(3):
            lo = max(pos - 2, 0)
            hi = min(pos + 1, 3)
            t = None
            for k, i in enumerate(range(lo, hi)):
                term = add(mul(al[i], bl[pos - i]), mul(dl[i], jnp.broadcast_to(mw[pos - i], al[i].shape)))
                t = term if t is None else add(t, term)
                if hi - lo > 1:
                    out[f"conv{pos}_t{k}"] = t
            conv.append(t)
            out[f"conv{pos}"] = t

        # u / carry values
        LM = info.limb_modulus
        borrow = info.limbs * LM + 2
        rems = [limb_vals[f"rem_l{j}"] for j in range(3)]
        lc = info.limb_coeffs

        v_h_prev = v_l_prev = None
        for i in range(3):
            if i == 0:
                u = add(
                    add(conv[0], ff.neg_mod(fr, rems[0])),
                    jnp.broadcast_to(cst(LM * borrow), conv[0].shape),
                )
            else:
                u = add(conv[i], ff.neg_mod(fr, rems[i]))
                u = add(u, mul(v_h_prev, jnp.broadcast_to(cst(lc[1]), u.shape)))
                u = add(u, v_l_prev)
                u = add(u, jnp.broadcast_to(cst(LM * borrow - borrow), u.shape))
            out[f"u{i}"] = u
            v_l = ff.pad_limbs(ff.extract_bit_slice(u, info.limb_bits, info.limb_bits), fr.L)
            v_h = ff.pad_limbs(
                ff.extract_bit_slice(u, 2 * info.limb_bits, fr.L * 16 - 2 * info.limb_bits),
                fr.L,
            )
            out[f"v{i}_h"] = v_h
            out[f"v{i}_l"] = v_l
            out[f"v{i}_l_c"] = ff.extract_chunks(v_l, 18, 6)
            v_h_prev, v_l_prev = v_h, v_l

        return out

    # ------------------------------------------------------------------
    # emission
    # ------------------------------------------------------------------

    def strides(self) -> Tuple[int, int, int]:
        """Per-instance row counts, measured by probing the scalar path."""
        if self._strides is None:
            probe = Context(self.n)
            ictx = IntegerContext(probe, self.w)
            a = ictx.assign_w(12345678901234567890 % self.w)
            b = ictx.assign_w(98765432109876543210 % self.w)
            ictx.int_mul(a, b)
            self._strides = probe.offsets()
        return self._strides

    def compute(self, a16: np.ndarray, b16: np.ndarray) -> Dict[str, np.ndarray]:
        out = self._wit(a16, b16)
        return {k: np.asarray(v) for k, v in out.items()}

    def emit(self, ctx: Context, wit: Dict[str, np.ndarray], B: int) -> BatchInteger:
        info = self.info
        n = self.n
        base_stride, range_stride, _ = self.strides()
        em = BatchEmitter(ctx, B, base_stride, range_stride, 0)

        def emit_assign(name: str, leading_bits: int, leading_cnt: int) -> BatchInteger:
            limbs = []
            for j in range(info.limbs):
                chunks = chunk_cols_to_u64(wit[f"{name}_c{j}"])
                acc = limbs_to_u64(wit[f"{name}_l{j}"])
                bits = info.limb_bits if j < info.limbs - 1 else leading_bits
                limbs.append(em.assign_range_value(chunks, acc, bits))
            native = em.sum_line(
                [(limbs[j], info.limb_coeffs[j]) for j in range(info.limbs)],
                limbs_to_u64(wit[f"{name}_native"]),
            )
            return BatchInteger(limbs, native)

        w_lead_bits = info.w_ceil_bits % info.limb_bits
        d_lead_bits = info.d_bits % info.limb_bits

        a = emit_assign("a", w_lead_bits, info.w_ceil_leading_decompose)
        b = emit_assign("b", w_lead_bits, info.w_ceil_leading_decompose)
        rem = emit_assign("rem", w_lead_bits, info.w_ceil_leading_decompose)
        d = emit_assign("d", d_lead_bits, info.d_leading_decompose)

        # convolution rows
        mw = [(-info.w_modulus_limbs_le[j]) % n for j in range(3)]
        conv = []
        for pos in range(3):
            lo = max(pos - 2, 0)
            hi = min(pos + 1, 3)
            terms = [(a.limbs[i], b.limbs[pos - i], d.limbs[i], mw[pos - i])
                     for i in range(lo, hi)]
            if len(terms) == 1:
                ai, bi, di, cc = terms[0]
                _, last = em.one_line_with_last(
                    [(ai, 0), (bi, 0), (di, cc)],
                    (limbs_to_u64(wit[f"conv{pos}"]), n - 1),
                    None, (1,), None,
                )
                conv.append(last)
            else:
                t_prev: object = 0
                for k, (ai, bi, di, cc) in enumerate(terms):
                    em.one_line_with_last(
                        [(ai, 0), (bi, 0), (di, cc)],
                        (t_prev, 0 if k == 0 else 1),
                        None, (1,), n - 1,
                    )
                    t_prev = limbs_to_u64(wit[f"conv{pos}_t{k}"])
                _, last = em.one_line_with_last([], (t_prev, 0), None, (), None)
                conv.append(last)

        # u / carry rows
        LM = info.limb_modulus
        borrow = info.limbs * LM + 2
        v_h = v_l = None
        for i in range(3):
            if i == 0:
                u = em.sum_line(
                    [(conv[0], 1), (rem.limbs[0], n - 1)],
                    limbs_to_u64(wit["u0"]),
                    (LM * borrow) % n,
                )
            else:
                u = em.sum_line(
                    [
                        (conv[i], 1),
                        (rem.limbs[i], n - 1),
                        (v_h, info.limb_coeffs[1]),
                        (v_l, info.limb_coeffs[0]),
                    ],
                    limbs_to_u64(wit[f"u{i}"]),
                    (LM * borrow - borrow) % n,
                )
            v_h = em.assign_one_line_range_value(
                limbs_to_u64(wit[f"v{i}_h"]), limbs_to_u64(wit[f"v{i}_h"]), 18
            )
            v_l = em.assign_range_value(
                chunk_cols_to_u64(wit[f"v{i}_l_c"]),
                limbs_to_u64(wit[f"v{i}_l"]),
                info.limb_bits,
            )
            em.one_line_with_last(
                [(v_h, info.limb_coeffs[2]), (v_l, info.limb_coeffs[1])],
                (u, n - 1),
                None, (), None,
            )

        # native constraint row
        em.one_line(
            [
                (a.native, 0),
                (b.native, 0),
                (d.native, info.w_native % n),
                (rem.native, 1),
            ],
            None, (-1,), None,
        )

        em.finish()
        return rem

    def run(self, ctx: Context, a_vals: np.ndarray, b_vals: np.ndarray) -> BatchInteger:
        """a_vals/b_vals: u32[B, 16] canonical limb arrays."""
        B = a_vals.shape[0]
        wit = self.compute(a_vals, b_vals)
        return self.emit(ctx, wit, B)
