"""Batched exact finite-field arithmetic for TPU (JAX/XLA).

Values are little-endian 16-bit limbs held in uint32 lanes, so every
elementwise product fits a u32 and shifted-sum partial accumulators stay
< 2^22 — no 64-bit integers required (TPUs have no native u64 multiply).
Carry/borrow propagation is log-depth carry-lookahead (associative_scan),
multiplication a shifted multiply-add sweep. Reduction is classical Barrett
(HAC 14.42) with static limb counts, giving exact modmul and exact div_rem
(quotient+remainder) for witness hints.

This is the device path for what the reference computes with host bigints
(num_bigint in integer_chip.rs: d/rem of int_mul, carries, inverses): the
whole witness fill becomes batched XLA programs. All shapes static; vmapped
over the batch dimension.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


# ---------------------------------------------------------------------------
# host <-> limb packing
# ---------------------------------------------------------------------------


def n_limbs_for(p: int, slack_bits: int = 0) -> int:
    return (p.bit_length() + slack_bits + LIMB_BITS - 1) // LIMB_BITS


def int_to_limbs(v: int, L: int) -> np.ndarray:
    return np.array([(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(L)], dtype=np.uint32)


def ints_to_limbs(vals: Sequence[int], L: int) -> np.ndarray:
    out = np.empty((len(vals), L), dtype=np.uint32)
    for i, v in enumerate(vals):
        for j in range(L):
            out[i, j] = (v >> (LIMB_BITS * j)) & LIMB_MASK
    return out


def limbs_to_int(arr) -> int:
    arr = np.asarray(arr)
    v = 0
    for i in reversed(range(arr.shape[-1])):
        v = (v << LIMB_BITS) | int(arr[i])
    return v


def limbs_to_ints(arr) -> List[int]:
    arr = np.asarray(arr)
    return [limbs_to_int(arr[i]) for i in range(arr.shape[0])]


def limbs16_to_u64x4(arr: np.ndarray) -> np.ndarray:
    """uint32[B, 16] 16-bit limbs -> uint64[B, 4] words (Records packing)."""
    a = arr.astype(np.uint64)
    out = np.zeros(arr.shape[:-1] + (4,), dtype=np.uint64)
    for w in range(4):
        for j in range(4):
            out[..., w] |= a[..., 4 * w + j] << np.uint64(16 * j)
    return out


# ---------------------------------------------------------------------------
# limb-vector primitives (static sizes, batched over leading dims)
# ---------------------------------------------------------------------------


def _shift_up_one(c):
    """[..., L] -> [..., L] with entries moved one limb up, 0 in front."""
    return jnp.concatenate(
        [jnp.zeros(c.shape[:-1] + (1,), jnp.uint32), c[..., :-1]], axis=-1
    )


def _lookahead_carries(g, p):
    """Kogge-Stone inclusive scan of the carry generate/propagate monoid
    combine((g1,p1),(g2,p2)) = (g2 | p2&g1, p1&p2) along the limb axis
    (identity (0, 1), shifted in at the low end). Returns G with G[..., i] =
    carry OUT of the prefix 0..i. log2(L) rounds of cheap masked shifts —
    compile-light, unlike lax.associative_scan's slice/interleave form."""
    L = g.shape[-1]
    d = 1
    while d < L:
        gs = jnp.concatenate(
            [jnp.zeros(g.shape[:-1] + (d,), g.dtype), g[..., :-d]], axis=-1
        )
        ps = jnp.concatenate(
            [jnp.ones(p.shape[:-1] + (d,), p.dtype), p[..., :-d]], axis=-1
        )
        g = g | (p & gs)
        p = p & ps
        d *= 2
    return g


def carry_norm(x, out_len: int):
    """Propagate carries: x entries < 2^32 with true value sum(x_i b^i);
    returns canonical 16-bit limbs mod b^out_len (truncated/padded).

    Carry-lookahead form: two local split-and-shift passes reduce every limb
    sum to <= 2^16 (single-bit carries), then the generate/propagate
    recurrence runs as a log-depth Kogge-Stone sweep over the limb axis.
    Replaces the original 16-bit-per-step lax.scan ripple (out_len sequential
    VPU steps) — which dominated the witness-evaluator profile since every
    add/mul node ends in a carry_norm."""
    K = x.shape[-1]
    if out_len > K:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (out_len - K,), jnp.uint32)], axis=-1
        )
    x = x[..., :out_len]
    # pass 1: x_i < 2^32 -> s_i = lo_i + c_{i-1} <= 2^17 - 2
    s = (x & LIMB_MASK) + _shift_up_one(x >> LIMB_BITS)
    # pass 2: -> s_i <= 2^16 (carry digits now 0/1)
    s = (s & LIMB_MASK) + _shift_up_one(s >> LIMB_BITS)
    # carry-out of limb i given carry-in cin is g_i | (p_i & cin)
    g = (s >> LIMB_BITS).astype(jnp.uint32)  # 0/1 (s_i == 2^16 only when p=0)
    p = ((s & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)
    G = _lookahead_carries(g, p)
    cin = _shift_up_one(G)  # carry into limb i = aggregate carry-out of 0..i-1
    return (s + cin) & LIMB_MASK


from functools import lru_cache as _lru_cache


def _diag_sum(m, out_len: int):
    """Anti-diagonal sums of m[..., R, C]: out[..., k] = sum_{i+j==k} m[..., i, j],
    truncated to out_len entries. The skew is a single zero-pad + contiguous
    reshape (pad each row with R trailing zeros, then reinterpret the flat
    buffer with row width C+R-1 — entry (i, j) lands at column i+j), so the
    whole reduction is pad/reshape/slice/sum: ~4 cheap XLA ops, no matmul,
    no per-offset graph blowup."""
    R, C = m.shape[-2], m.shape[-1]
    batch = m.shape[:-2]
    y = jnp.concatenate([m, jnp.zeros(batch + (R, R), m.dtype)], axis=-1)
    flat = y.reshape(batch + (R * (C + R),))
    z = flat[..., : R * (C + R - 1)].reshape(batch + (R, C + R - 1))
    out = z[..., :out_len].sum(axis=-2, dtype=m.dtype)
    if out_len > C + R - 1:  # product is narrower than the requested window
        out = jnp.concatenate(
            [out, jnp.zeros(batch + (out_len - (C + R - 1),), m.dtype)], axis=-1
        )
    return out


@_lru_cache(maxsize=None)
def _conv_tensor_np(La: int, Lb: int, out_len: int, offset: int):
    """Static 0/1 tensor T[i*Lb+j, k] = 1 iff i + j + offset == k."""
    t = np.zeros((La, Lb, out_len), dtype=np.uint32)
    for i in range(La):
        for j in range(Lb):
            k = i + j + offset
            if k < out_len:
                t[i, j, k] = 1
    return t.reshape(La * Lb, out_len)


def _backend() -> str:
    """Backend for limb-kernel form dispatch. Resolved at Python trace time
    from the process default backend — NOT from the lowering context — so the
    backend must be fixed (jax.config.update("jax_platforms", ...)) before
    any limb kernel is traced. A trace placed on a non-default device picks
    the default backend's form: bit-exact either way, perf-only."""
    return jax.default_backend()


def mul_limbs(a, b, out_len: int | None = None):
    """Exact product of limb vectors: one batched outer product (16-bit limb
    products are exact in u32), split lo/hi so partial diagonal sums stay
    < 2^21 (< 2^22 up to 32 limbs) — safe in u32 — then a backend-specific
    anti-diagonal reduction and a carry-lookahead normalisation.

    Backend dispatch (bit-exact either way; measured scripts/kernel_microbench.py):
    - TPU: contraction against a static 0/1 tensor (one XLA dot) — 3.3x
      faster than the skew-reshape form, whose pad+flat-reshape forces
      lane relayouts on the TPU's tiled memory.
    - CPU: skew-reshape diagonal sums (_diag_sum) — exactly La*Lb lane-MACs
      and a compile-light graph (the padded contraction is ~10x more VPU
      work and slowed CPU compiles)."""
    La, Lb = a.shape[-1], b.shape[-1]
    full = La + Lb
    out_len = full if out_len is None else out_len
    prod = a[..., :, None] * b[..., None, :]  # [*, La, Lb] u32 (exact)
    if _backend() == "cpu":
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        acc = _diag_sum(lo, out_len)
        if out_len > 1:  # hi parts land one limb higher
            h = _diag_sum(hi, out_len - 1)
            acc = acc + jnp.concatenate(
                [jnp.zeros(h.shape[:-1] + (1,), jnp.uint32), h], axis=-1
            )
    else:
        lo = (prod & LIMB_MASK).reshape(prod.shape[:-2] + (La * Lb,))
        hi = (prod >> LIMB_BITS).reshape(prod.shape[:-2] + (La * Lb,))
        t_lo = jnp.asarray(_conv_tensor_np(La, Lb, out_len, 0))
        t_hi = jnp.asarray(_conv_tensor_np(La, Lb, out_len, 1))
        acc = jnp.matmul(lo, t_lo, preferred_element_type=jnp.uint32)
        acc = acc + jnp.matmul(hi, t_hi, preferred_element_type=jnp.uint32)
    return carry_norm(acc, out_len)


def add_limbs(a, b, out_len: int | None = None):
    L = max(a.shape[-1], b.shape[-1])
    out_len = out_len or (L + 1)
    x = jnp.zeros(a.shape[:-1] + (L,), dtype=jnp.uint32)
    x = x.at[..., : a.shape[-1]].add(a)
    x = x.at[..., : b.shape[-1]].add(b)
    return carry_norm(x, out_len)


def sub_limbs(a, b):
    """a - b with borrow chain; returns (diff, borrow) — borrow==1 iff a < b."""
    La, Lb = a.shape[-1], b.shape[-1]
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, batch + (La,))
    b = jnp.broadcast_to(b, batch + (Lb,))
    if Lb < La:
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:-1] + (La - Lb,), jnp.uint32)], axis=-1
        )
    b = b[..., :La]
    # borrow-lookahead (mirror of carry_norm): limb i generates a borrow iff
    # a_i < b_i and propagates one iff a_i == b_i; log-depth associative scan
    g = (a < b).astype(jnp.uint32)
    p = a == b

    def combine(left, right):
        g1, p1 = left
        g2, p2 = right
        return g2 | (jnp.where(p2, g1, jnp.uint32(0))), p1 & p2

    G, _ = jax.lax.associative_scan(combine, (g, p), axis=-1)
    bin_ = _shift_up_one(G)
    outs = (a + (1 << LIMB_BITS) - b - bin_) & LIMB_MASK
    return outs, G[..., -1]


def geq_limbs(a, b):
    _, borrow = sub_limbs(a, b)
    return borrow == 0


def select_limbs(cond, a, b):
    """cond ? a : b, cond shaped like the batch dims."""
    return jnp.where(cond[..., None], a, b)


def shift_right_limbs(x, k: int):
    return x[..., k:]


def mod_floor_limbs(x, k: int):
    return x[..., :k]


def shl_limbs(x, s: int, out_len: int):
    """Exact x << s (s a static bit count): limb relabeling + one in-limb
    shift pair — linear cost, replaces mul_limbs against a power-of-two
    constant (the 2^(108*i) limb coefficients that dominate witness tapes'
    mulc population)."""
    i0, r = divmod(s, LIMB_BITS)
    if r:
        hi = (x << np.uint32(r)) & LIMB_MASK
        lo = x >> np.uint32(LIMB_BITS - r)
        pad = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        # out[j] = hi[j] | lo[j-1]; the two fields are bit-disjoint
        y = hi | jnp.concatenate([pad, lo], axis=-1)[..., :-1]
        carry = lo[..., -1:]  # top bits shifted out of the last limb
        y = jnp.concatenate([y, carry], axis=-1)
    else:
        y = x
    if i0:
        y = jnp.concatenate(
            [jnp.zeros(y.shape[:-1] + (i0,), y.dtype), y], axis=-1
        )
    cur = y.shape[-1]
    if cur < out_len:
        y = jnp.concatenate(
            [y, jnp.zeros(y.shape[:-1] + (out_len - cur,), y.dtype)], axis=-1
        )
    return y[..., :out_len]


# ---------------------------------------------------------------------------
# MXU path for constant-operand multiplication (Barrett mu/p/w products)
#
# 8-bit limbs ride the MXU as bf16: 0..255 is exact in bf16 (8 significand
# bits), 8x8-bit products are exact in the MXU's f32 accumulator, and
# anti-diagonal sums of <= 128 such products stay < 2^24 — so one bf16
# matmul against a static Toeplitz matrix of the constant computes the limb
# convolution exactly on the systolic array instead of the VPU. Gated by
# HALO2ECC_TPU_MXU_CONSTMUL (bit-exact either way; flip after measuring).
# ---------------------------------------------------------------------------

import os as _os


def _mxu_constmul_enabled() -> bool:
    return bool(_os.environ.get("HALO2ECC_TPU_MXU_CONSTMUL"))


@_lru_cache(maxsize=None)
def _toeplitz8_np(b_int: int, Lb16: int, La8: int, K: int):
    """Static Toeplitz T[i, k] = b8[k - i] (0 outside), b in 8-bit limbs."""
    Lb8 = 2 * Lb16
    b8 = [(b_int >> (8 * j)) & 0xFF for j in range(Lb8)]
    T = np.zeros((La8, K), dtype=np.float32)
    for i in range(La8):
        for k in range(max(0, i), min(K, i + Lb8)):
            T[i, k] = b8[k - i]
    return T


def mul_limbs_static(a, b_int: int, Lb16: int, out_len: int | None = None):
    """Exact a * b for a STATIC integer b (Lb16 = b's 16-bit limb count),
    as one bf16 matmul on the MXU. Bit-exact with
    mul_limbs(a, int_to_limbs(b, Lb16))."""
    La = a.shape[-1]
    full = La + Lb16
    out_len = full if out_len is None else out_len
    La8 = 2 * La
    K = min(2 * out_len, La8 + 2 * Lb16 - 1)
    assert min(La8, 2 * Lb16) * 65025 < (1 << 24), "MXU f32 sums must stay exact"
    # interleave 8-bit halves: a8[2i] = lo(a_i), a8[2i+1] = hi(a_i)
    a8 = jnp.stack([a & 0xFF, a >> 8], axis=-1).reshape(a.shape[:-1] + (La8,))
    T = jnp.asarray(_toeplitz8_np(b_int, Lb16, La8, K), dtype=jnp.bfloat16)
    c8 = jnp.matmul(
        a8.astype(jnp.bfloat16), T, preferred_element_type=jnp.float32
    ).astype(jnp.uint32)  # entries < 2^24, exact
    if K < 2 * out_len:
        c8 = jnp.concatenate(
            [c8, jnp.zeros(c8.shape[:-1] + (2 * out_len - K,), jnp.uint32)],
            axis=-1,
        )
    # back to the 16-bit limb domain: x16[k] = c8[2k] + (c8[2k+1] << 8) < 2^32
    x16 = c8[..., 0::2] + (c8[..., 1::2] << 8)
    return carry_norm(x16, out_len)


# ---------------------------------------------------------------------------
# Field spec + modular ops
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FieldSpec:
    p: int
    L: int  # canonical limb count (p fits in L limbs)

    @property
    def p_limbs(self):
        return jnp.asarray(int_to_limbs(self.p, self.L))

    @property
    def mu_int(self):
        # Barrett constant for x < b^(2L): mu = floor(b^(2L) / p)
        return (1 << (LIMB_BITS * 2 * self.L)) // self.p

    @property
    def mu_limbs(self):
        return jnp.asarray(int_to_limbs(self.mu_int, self.L + 2))


def make_field(p: int) -> FieldSpec:
    return FieldSpec(p, n_limbs_for(p))


def add_mod(f: FieldSpec, a, b):
    s = add_limbs(a, b, f.L + 1)
    d, borrow = sub_limbs(s, f.p_limbs)
    return select_limbs(borrow == 0, d, s)[..., : f.L]


def neg_mod(f: FieldSpec, a):
    # p - a, with 0 -> 0
    d, _ = sub_limbs(f.p_limbs, a)
    is_zero = jnp.all(a == 0, axis=-1)
    return select_limbs(is_zero, a, d[..., : f.L])


def sub_mod(f: FieldSpec, a, b):
    d, borrow = sub_limbs(a, b)
    d2, _ = sub_limbs(add_limbs(a, f.p_limbs, f.L + 1), b)
    return select_limbs(borrow == 0, d, d2[..., : f.L])


def barrett_reduce(f: FieldSpec, x):
    """x: up to 2L limbs, value < b^(2L); returns x mod p (L limbs)."""
    L = f.L
    q1 = shift_right_limbs(x, L - 1)  # <= L+1 limbs
    if _mxu_constmul_enabled():
        q2 = mul_limbs_static(q1, f.mu_int, L + 2)
    else:
        q2 = mul_limbs(q1, f.mu_limbs)
    q3 = shift_right_limbs(q2, L + 1)
    r1 = mod_floor_limbs(x, L + 1)
    if _mxu_constmul_enabled():
        q3p = mul_limbs_static(q3, f.p, L, L + 1)
    else:
        q3p = mul_limbs(q3, f.p_limbs, L + 1)
    r, _ = sub_limbs(r1, q3p)  # r < 3p, fits L+1 limbs (mod b^(L+1))
    for _ in range(2):
        d, borrow = sub_limbs(r, f.p_limbs)
        r = select_limbs(borrow == 0, d, r)
    return r[..., :L]


def mul_mod(f: FieldSpec, a, b):
    return barrett_reduce(f, mul_limbs(a, b, 2 * f.L))


def pow_mod(f: FieldSpec, a, e: int):
    """a^e for a static exponent: MSB-first 4-bit fixed-window scan.

    vs the per-bit square-and-multiply-and-select (a full mul_mod EVERY bit,
    discarded on 0 bits — ~254 sq + 254 mul for a Fermat inverse), the
    windowed form does ceil(|e|/4) iterations of 4 squarings + ONE table
    multiply (+ 14 precompute muls): ~256 sq + 64 + 14 mul — ~1.5x fewer
    modmuls on the witness pipeline's inversion nodes (EC-addition slopes,
    unsafe inverts)."""
    one = jnp.zeros(a.shape, dtype=jnp.uint32).at[..., 0].set(1)
    if e == 0:
        return one
    W = 4
    nd = (e.bit_length() + W - 1) // W
    digits = jnp.asarray(
        np.array([(e >> (W * (nd - 1 - i))) & 15 for i in range(nd)],
                 dtype=np.int32)
    )
    pows = [one, a]
    for _ in range(2, 1 << W):
        pows.append(mul_mod(f, pows[-1], a))
    table = jnp.stack(pows)  # [16, ..., L]

    def body(acc, d):
        for _ in range(W):
            acc = mul_mod(f, acc, acc)
        return mul_mod(f, acc, table[d]), None

    acc, _ = jax.lax.scan(body, one, digits)
    return acc


def inv_mod(f: FieldSpec, a):
    """Fermat inverse (0 -> 0)."""
    return pow_mod(f, a, f.p - 2)


# ---------------------------------------------------------------------------
# Exact division with remainder by a fixed modulus (witness hints)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DivSpec:
    """Barrett machinery for floor-div/mod by fixed w, for x < b^x_limbs."""

    w: int
    x_limbs: int  # max input size in limbs
    q_limbs: int  # max quotient size in limbs

    @property
    def w_limbs_arr(self):
        return jnp.asarray(int_to_limbs(self.w, n_limbs_for(self.w)))

    @property
    def mu_int(self):
        return (1 << (LIMB_BITS * self.x_limbs)) // self.w

    @property
    def mu(self):
        return jnp.asarray(
            int_to_limbs(self.mu_int, self.x_limbs - n_limbs_for(self.w) + 2)
        )


def div_rem_by(spec: DivSpec, x):
    """Exact (q, r) with x = q*w + r, 0 <= r < w. x: [*, x_limbs].

    The generalized Barrett estimate satisfies q-2 <= q_hat <= q: with
    b = 2^16, X = x_limbs, t = X-k+1, q_hat = floor(floor(x/b^(k-1)) *
    floor(b^X/w) / b^t) >= x/w - x/b^X - b^(k-1)/w - 1 > x/w - 3 (using
    x < b^X and w >= b^(k-1), which n_limbs_for guarantees), and the
    floors only lower it, so q - q_hat <= 2. Hence r_hat = x - q_hat*w is
    non-negative and exactly 2 conditional subtractions of w make it
    canonical (brute-force checked for bn254/bls12-381 moduli across all
    widths k..2k+5 in tests/test_ff_jax.py::test_div_rem_correction_bound).
    """
    k = n_limbs_for(spec.w)
    q1 = shift_right_limbs(x, k - 1)
    if _mxu_constmul_enabled():
        q2 = mul_limbs_static(q1, spec.mu_int, spec.x_limbs - k + 2)
        q_hat = shift_right_limbs(q2, spec.x_limbs - k + 1)[..., : spec.q_limbs]
        qw = mul_limbs_static(q_hat, spec.w, k, spec.x_limbs + 1)
    else:
        q2 = mul_limbs(q1, spec.mu)
        q_hat = shift_right_limbs(q2, spec.x_limbs - k + 1)[..., : spec.q_limbs]
        qw = mul_limbs(q_hat, spec.w_limbs_arr, spec.x_limbs + 1)
    x_ext = jnp.zeros(x.shape[:-1] + (spec.x_limbs + 1,), dtype=jnp.uint32)
    x_ext = x_ext.at[..., : spec.x_limbs].set(x)
    r, _ = sub_limbs(x_ext, qw)  # >= 0 since q_hat <= q
    w_ext = jnp.zeros_like(r).at[..., :k].set(spec.w_limbs_arr)
    one = jnp.zeros(q_hat.shape, dtype=jnp.uint32).at[..., 0].set(1)
    for _ in range(2):  # fix undershoot (r >= w); q - q_hat <= 2, see above
        d, borrow = sub_limbs(r, w_ext)
        qadd = add_limbs(q_hat, one, spec.q_limbs)
        take = borrow == 0
        r = select_limbs(take, d, r)
        q_hat = select_limbs(take, qadd, q_hat)
    return q_hat, r[..., :k]


# ---------------------------------------------------------------------------
# jitted entry points
#
# Eager dispatch compiles every distinct sub-op separately (hundreds of tiny
# XLA programs for one modmul); ALWAYS go through these cached jits.
# ---------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def jitted(f: FieldSpec):
    """Cached jitted modular ops bound to a field."""
    class _Ops:
        add = staticmethod(jax.jit(partial(add_mod, f)))
        sub = staticmethod(jax.jit(partial(sub_mod, f)))
        neg = staticmethod(jax.jit(partial(neg_mod, f)))
        mul = staticmethod(jax.jit(partial(mul_mod, f)))
        inv = staticmethod(jax.jit(partial(inv_mod, f)))

    return _Ops


@lru_cache(maxsize=None)
def jitted_div_rem(spec: DivSpec):
    return jax.jit(partial(div_rem_by, spec))


@lru_cache(maxsize=None)
def jitted_pow(f: FieldSpec, e: int):
    return jax.jit(lambda a: pow_mod(f, a, e))


# ---------------------------------------------------------------------------
# chunk extraction (18-bit range chunks from 16-bit limbs)
# ---------------------------------------------------------------------------


def pad_limbs(x, L: int):
    """Zero-extend a limb vector to L limbs."""
    cur = x.shape[-1]
    if cur >= L:
        return x[..., :L]
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (L - cur,), dtype=jnp.uint32)], axis=-1
    )


def extract_bit_slice(x, start_bit: int, width_bits: int):
    """Bits [start_bit, start_bit+width_bits) of a limb vector, as a fresh
    limb vector of ceil(width/16) limbs. Static offsets -> static shifts."""
    L = x.shape[-1]
    out_limbs = (width_bits + LIMB_BITS - 1) // LIMB_BITS
    i0, s = divmod(start_bit, LIMB_BITS)
    outs = []
    for k in range(out_limbs):
        lo = x[..., i0 + k] >> s if i0 + k < L else jnp.zeros(x.shape[:-1], jnp.uint32)
        if s > 0 and i0 + k + 1 < L:
            lo = lo | ((x[..., i0 + k + 1] << (LIMB_BITS - s)) & LIMB_MASK)
        rem = width_bits - k * LIMB_BITS
        if rem < LIMB_BITS:
            lo = lo & ((1 << rem) - 1)
        outs.append(lo & LIMB_MASK)
    return jnp.stack(outs, axis=-1)


def extract_bit_slice_vec(x, starts: np.ndarray, out_limbs: int,
                          width_bits: np.ndarray = None):
    """Per-slot bit slices of a [B, G, L] limb tensor: slot g yields bits
    [starts[g], starts[g] + width_bits[g]) as out_limbs 16-bit limbs
    (width defaults to to-the-end; zero beyond the source). starts/widths
    are static numpy arrays — shifts/masks lower to elementwise ops on
    gathered limbs, so a whole group of differently-shifted extractions
    (range-chunk decompositions) is ONE tensor op instead of G op chains."""
    G, L = x.shape[-2], x.shape[-1]
    starts = np.asarray(starts, dtype=np.int64)
    i0 = starts // LIMB_BITS
    sh = (starts % LIMB_BITS).astype(np.uint32)  # [G]
    k = np.arange(out_limbs, dtype=np.int64)[None, :]  # [1, Lout]
    idx = i0[:, None] + k  # [G, Lout]
    v0 = (idx < L).astype(np.uint32)
    v1 = (idx + 1 < L).astype(np.uint32)
    idx0 = np.minimum(idx, L - 1)
    idx1 = np.minimum(idx + 1, L - 1)
    g = jnp.arange(G)[:, None]
    lo = x[..., g, idx0] >> sh[:, None]
    # avoid shifting by 16 when sh == 0 (mask the term instead)
    hi_sh = ((LIMB_BITS - sh) % LIMB_BITS).astype(np.uint32)
    hi_on = (sh > 0).astype(np.uint32)[:, None]
    hi = ((x[..., g, idx1] << hi_sh[:, None]) & LIMB_MASK) * (hi_on * v1)
    out = (lo * v0 | hi) & LIMB_MASK
    if width_bits is not None:
        rem = np.clip(
            np.asarray(width_bits, dtype=np.int64)[:, None] - k * LIMB_BITS,
            0, LIMB_BITS,
        )
        out = out & ((np.uint32(1) << rem.astype(np.uint32)) - 1)
    return out


def shl_limbs_vec(x, shifts: np.ndarray, out_limbs: int):
    """Per-slot x[..., g, :] << shifts[g] (static shifts) of a [B, G, L]
    limb tensor, as one extract over a zero-prepadded copy: padded = x*b^Z,
    then bits [16Z - s_g, ...) — linear cost, the grouped form of
    shl_limbs for power-of-two mulc groups."""
    shifts = np.asarray(shifts, dtype=np.int64)
    Z = int(shifts.max()) // LIMB_BITS + 1
    pad = jnp.zeros(x.shape[:-1] + (Z,), x.dtype)
    padded = jnp.concatenate([pad, x], axis=-1)
    return extract_bit_slice_vec(padded, LIMB_BITS * Z - shifts, out_limbs)


def extract_chunks(x, chunk_bits: int, count: int):
    """Split a limb vector into `count` chunks of chunk_bits bits each."""
    L = x.shape[-1]
    mask = (1 << chunk_bits) - 1
    chunks = []
    for c in range(count):
        start = c * chunk_bits
        i0 = start // LIMB_BITS
        s = start % LIMB_BITS
        v = jnp.zeros(x.shape[:-1], dtype=jnp.uint32)
        if i0 < L:
            v = x[..., i0] >> s
        bits_have = LIMB_BITS - s
        idx = i0 + 1
        while bits_have < chunk_bits and idx < L:
            v = v | (x[..., idx] << bits_have)
            bits_have += LIMB_BITS
            idx += 1
        chunks.append(v & mask)
    return jnp.stack(chunks, axis=-1)
