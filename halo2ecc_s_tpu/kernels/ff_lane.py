"""Lane-major limb kernels: limbs on the LEADING axis, batch on the minor.

The ff_jax kernels put limbs on the minor axis ([B, L]); on TPU that maps
the 8-16-limb dimension onto the 128-wide vector lanes (>=8x lane waste) and
turns limb-index manipulation (diagonal product sums, carry shifts) into
cross-lane relayouts — measured 0.5s per 1M int_mul instances against a
~10ms roofline (scripts/device_profile.py).

Here arrays are [L, B] (any leading limb axis, batch minor): the batch fills
the lanes completely, every limb op is a leading-axis slice (free), and the
product anti-diagonal accumulation does exactly La*Lb lane-wide MACs instead
of the [La*Lb, out] 0/1-tensor contraction's La*Lb*out.

Semantics mirror kernels/ff_jax.py one-to-one (16-bit limbs in u32, same
carry-lookahead normalisation); tests/test_ff_lane.py checks bit-exactness
against the ff_jax forms.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import ff_jax as ff

LIMB_BITS = 16
LIMB_MASK = 0xFFFF


def to_lane(x):
    """[..., B, L] -> [..., L, B] (host/test helper; production code should
    keep lane-major end to end)."""
    return jnp.swapaxes(jnp.asarray(x), -1, -2)


def from_lane(x):
    return jnp.swapaxes(x, -1, -2)


def _shift_up_one(p):
    """Shift limb axis (axis -2) up by one: out[i] = p[i-1], out[0] = init."""
    pad = jnp.zeros(p.shape[:-2] + (1,) + p.shape[-1:], p.dtype)
    return jnp.concatenate([pad, p[..., :-1, :]], axis=-2)


def _shift_up_ones(p):
    pad = jnp.ones(p.shape[:-2] + (1,) + p.shape[-1:], p.dtype)
    return jnp.concatenate([pad, p[..., :-1, :]], axis=-2)


def _lookahead_carries(g, p):
    """Kogge-Stone aggregate carry-out per limb over axis -2."""
    d = 1
    L = g.shape[-2]
    while d < L:
        zpad = jnp.zeros(g.shape[:-2] + (d,) + g.shape[-1:], g.dtype)
        opad = jnp.ones(p.shape[:-2] + (d,) + p.shape[-1:], p.dtype)
        gs = jnp.concatenate([zpad, g[..., :-d, :]], axis=-2)
        ps = jnp.concatenate([opad, p[..., :-d, :]], axis=-2)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    return g


def carry_norm(x, out_len: int):
    """Lane-major mirror of ff_jax.carry_norm (limb axis -2)."""
    K = x.shape[-2]
    if out_len > K:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-2] + (out_len - K,) + x.shape[-1:], jnp.uint32)],
            axis=-2,
        )
    x = x[..., :out_len, :]
    s = (x & LIMB_MASK) + _shift_up_one(x >> LIMB_BITS)
    s = (s & LIMB_MASK) + _shift_up_one(s >> LIMB_BITS)
    g = (s >> LIMB_BITS).astype(jnp.uint32)
    p = ((s & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)
    G = _lookahead_carries(g, p)
    cin = _shift_up_one(G)
    return (s + cin) & LIMB_MASK


def _diag_sum(m, out_len: int):
    """Anti-diagonal sums of m[..., R, C, B]: out[..., k, :] =
    sum_{i+j==k} m[..., i, j, :]. Lane-major mirror of ff_jax._diag_sum:
    the skew is a zero-pad + reshape on LEADING axes (the B-minor lane dim
    is untouched, so no cross-lane relayout), ~4 XLA ops total —
    compile-light (CPU) and lane-efficient (TPU) at exactly R*C MACs."""
    R, C = m.shape[-3], m.shape[-2]
    batch = m.shape[:-3]
    Bd = m.shape[-1:]
    y = jnp.concatenate([m, jnp.zeros(batch + (R, R) + Bd, m.dtype)], axis=-2)
    flat = y.reshape(batch + (R * (C + R),) + Bd)
    z = flat[..., : R * (C + R - 1), :].reshape(batch + (R, C + R - 1) + Bd)
    out = z[..., :out_len, :].sum(axis=-3, dtype=m.dtype)
    if out_len > C + R - 1:
        out = jnp.concatenate(
            [out, jnp.zeros(batch + (out_len - (C + R - 1),) + Bd, m.dtype)],
            axis=-2,
        )
    return out


def _mul_limbs_skew(a, b, out_len: int):
    """Skew-reshape form: ~10 XLA ops — compile-light, for CPU (the skew
    reshape forces sublane relayouts on TPU: measured 29ms vs 2.4ms/mul_mod
    at B=2^17, scripts/lane_microbench.py)."""
    prod = a[..., :, None, :] * b[..., None, :, :]  # [*, La, Lb, B] exact u32
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    acc = _diag_sum(lo, out_len)
    if out_len > 1:  # hi parts land one limb higher
        h = _diag_sum(hi, out_len - 1)
        acc = acc + jnp.concatenate(
            [jnp.zeros(h.shape[:-2] + (1,) + h.shape[-1:], jnp.uint32), h],
            axis=-2,
        )
    return acc


def _mul_limbs_unrolled(a, b, out_len: int):
    """Unrolled anti-diagonal accumulation: exactly La*Lb lane-wide MACs,
    every op a leading-axis slice — the fast TPU form (graph is O(La*Lb)
    ops, which slows CPU compiles; CPU uses the skew form)."""
    La, Lb = a.shape[-2], b.shape[-2]
    n_acc = min(out_len, La + Lb)
    acc = [None] * n_acc
    for i in range(La):
        ai = a[..., i, :]
        for j in range(Lb):
            k = i + j
            if k >= out_len:
                continue
            prod = ai * b[..., j, :]
            lo = prod & LIMB_MASK
            hi = prod >> LIMB_BITS
            acc[k] = lo if acc[k] is None else acc[k] + lo
            if k + 1 < n_acc:
                acc[k + 1] = hi if acc[k + 1] is None else acc[k + 1] + hi
    zero = jnp.zeros_like(a[..., 0, :] * b[..., 0, :])
    cols = [c if c is not None else zero for c in acc]
    wide = jnp.stack(cols, axis=-2)
    if out_len > n_acc:
        wide = jnp.concatenate(
            [wide, jnp.zeros(wide.shape[:-2] + (out_len - n_acc,) + wide.shape[-1:],
                             jnp.uint32)],
            axis=-2,
        )
    return wide


def mul_limbs(a, b, out_len: int | None = None):
    """Exact product, lane-major. Backend-dispatched like ff_jax.mul_limbs
    (bit-exact either way): TPU unrolls the anti-diagonal accumulation
    (lane-wide MACs, no relayouts); CPU uses the compile-light skew-reshape."""
    La, Lb = a.shape[-2], b.shape[-2]
    full = La + Lb
    out_len = full if out_len is None else out_len
    if jax.default_backend() == "cpu":
        acc = _mul_limbs_skew(a, b, out_len)
    else:
        acc = _mul_limbs_unrolled(a, b, out_len)
    return carry_norm(acc, out_len)


def add_limbs(a, b, out_len: int):
    La, Lb = a.shape[-2], b.shape[-2]
    L = max(La, Lb)

    def pad(x, Lx):
        if Lx < L:
            return jnp.concatenate(
                [x, jnp.zeros(x.shape[:-2] + (L - Lx,) + x.shape[-1:], jnp.uint32)],
                axis=-2,
            )
        return x

    return carry_norm(pad(a, La) + pad(b, Lb), out_len)


def sub_limbs(a, b):
    """a - b with borrow-lookahead; returns (diff, borrow[...,B])."""
    La, Lb = a.shape[-2], b.shape[-2]
    if Lb < La:
        b = jnp.concatenate(
            [b, jnp.zeros(b.shape[:-2] + (La - Lb,) + b.shape[-1:], jnp.uint32)],
            axis=-2,
        )
    b = b[..., :La, :]
    a, b = jnp.broadcast_arrays(a, b)
    g = (a < b).astype(jnp.uint32)
    p = a == b

    def combine(left, right):
        g1, p1 = left
        g2, p2 = right
        return g2 | (jnp.where(p2, g1, jnp.uint32(0))), p1 & p2

    G, _ = jax.lax.associative_scan(combine, (g, p), axis=-2)
    bin_ = _shift_up_one(G)
    outs = (a + (1 << LIMB_BITS) - b - bin_) & LIMB_MASK
    return outs, G[..., -1, :]


def select_limbs(cond, a, b):
    """cond shaped like the batch (minor) dims: [..., B]."""
    return jnp.where(cond[..., None, :], a, b)


def shift_right_limbs(x, k: int):
    return x[..., k:, :]


def mod_floor_limbs(x, k: int):
    return x[..., :k, :]


def shl_limbs(x, s: int, out_len: int):
    """Exact x << s, lane-major mirror of ff_jax.shl_limbs (limb axis -2):
    limb relabeling + one in-limb shift pair, linear cost."""
    i0, r = divmod(s, LIMB_BITS)
    if r:
        hi = (x << np.uint32(r)) & LIMB_MASK
        lo = x >> np.uint32(LIMB_BITS - r)
        y = hi | _shift_up_one(lo)
        carry = lo[..., -1:, :]
        y = jnp.concatenate([y, carry], axis=-2)
    else:
        y = x
    if i0:
        y = jnp.concatenate(
            [jnp.zeros(y.shape[:-2] + (i0,) + y.shape[-1:], y.dtype), y],
            axis=-2,
        )
    return pad_limbs(y, out_len)


def shl_limbs_vec(x, shifts: np.ndarray, out_limbs: int):
    """Per-slot x[..., g, :, :] << shifts[g] of a [G, L, B] tensor (lane-
    major mirror of ff_jax.shl_limbs_vec)."""
    shifts = np.asarray(shifts, dtype=np.int64)
    Z = int(shifts.max()) // LIMB_BITS + 1
    pad = jnp.zeros(x.shape[:-2] + (Z,) + x.shape[-1:], x.dtype)
    padded = jnp.concatenate([pad, x], axis=-2)
    return extract_bit_slice_vec(padded, LIMB_BITS * Z - shifts, out_limbs)


@dataclass(frozen=True)
class FieldSpec:
    p: int
    L: int

    @property
    def p_limbs(self):
        return jnp.asarray(ff.int_to_limbs(self.p, self.L))[:, None]

    @property
    def mu_limbs(self):
        mu = (1 << (LIMB_BITS * 2 * self.L)) // self.p
        return jnp.asarray(ff.int_to_limbs(mu, self.L + 2))[:, None]


@lru_cache(maxsize=None)
def make_field(p: int) -> FieldSpec:
    return FieldSpec(p, ff.n_limbs_for(p))


def pad_limbs(x, L: int):
    """Zero-extend the limb axis (-2) to L limbs."""
    cur = x.shape[-2]
    if cur >= L:
        return x[..., :L, :]
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-2] + (L - cur,) + x.shape[-1:], jnp.uint32)],
        axis=-2,
    )


def extract_bit_slice(x, start_bit: int, width_bits: int):
    """Lane-major mirror of ff_jax.extract_bit_slice (limb axis -2)."""
    L = x.shape[-2]
    out_limbs = (width_bits + LIMB_BITS - 1) // LIMB_BITS
    i0, s = divmod(start_bit, LIMB_BITS)
    outs = []
    zero = jnp.zeros(x.shape[:-2] + x.shape[-1:], jnp.uint32)
    for k in range(out_limbs):
        lo = x[..., i0 + k, :] >> s if i0 + k < L else zero
        if s > 0 and i0 + k + 1 < L:
            lo = lo | ((x[..., i0 + k + 1, :] << (LIMB_BITS - s)) & LIMB_MASK)
        rem = width_bits - k * LIMB_BITS
        if rem < LIMB_BITS:
            lo = lo & ((1 << rem) - 1)
        outs.append(lo & LIMB_MASK)
    return jnp.stack(outs, axis=-2)


def extract_bit_slice_vec(x, starts: np.ndarray, out_limbs: int,
                          width_bits: np.ndarray = None):
    """Per-slot bit slices of a [G, L, B] tensor -> [G, out_limbs, B]
    (lane-major mirror of ff_jax.extract_bit_slice_vec)."""
    G, L = x.shape[-3], x.shape[-2]
    starts = np.asarray(starts, dtype=np.int64)
    i0 = starts // LIMB_BITS
    sh = (starts % LIMB_BITS).astype(np.uint32)  # [G]
    k = np.arange(out_limbs, dtype=np.int64)[None, :]  # [1, Lout]
    idx = i0[:, None] + k  # [G, Lout]
    v0 = (idx < L).astype(np.uint32)[..., None]
    v1 = (idx + 1 < L).astype(np.uint32)[..., None]
    idx0 = np.minimum(idx, L - 1)
    idx1 = np.minimum(idx + 1, L - 1)
    g = np.arange(G)[:, None]
    lo = x[..., g, idx0, :] >> sh[:, None, None]
    hi_sh = ((LIMB_BITS - sh) % LIMB_BITS).astype(np.uint32)
    hi_on = (sh > 0).astype(np.uint32)[:, None, None]
    hi = ((x[..., g, idx1, :] << hi_sh[:, None, None]) & LIMB_MASK) * (hi_on * v1)
    out = (lo * v0 | hi) & LIMB_MASK
    if width_bits is not None:
        rem = np.clip(
            np.asarray(width_bits, dtype=np.int64)[:, None] - k * LIMB_BITS,
            0, LIMB_BITS,
        )
        out = out & ((np.uint32(1) << rem.astype(np.uint32)) - 1)[..., None]
    return out


def barrett_reduce(f: FieldSpec, x):
    L = f.L
    q1 = shift_right_limbs(x, L - 1)
    q2 = mul_limbs(q1, f.mu_limbs)
    q3 = shift_right_limbs(q2, L + 1)
    r1 = mod_floor_limbs(x, L + 1)
    q3p = mul_limbs(q3, f.p_limbs, L + 1)
    r, _ = sub_limbs(r1, q3p)
    for _ in range(2):
        d, borrow = sub_limbs(r, f.p_limbs)
        r = select_limbs(borrow == 0, d, r)
    return r[..., :L, :]


def mul_mod(f: FieldSpec, a, b):
    return barrett_reduce(f, mul_limbs(a, b, 2 * f.L))


def pow_mod(f: FieldSpec, a, e: int):
    """a^e for a static exponent: MSB-first 4-bit fixed-window scan
    (lane-major mirror of ff_jax.pow_mod — ~1.5x fewer modmuls than the
    per-bit multiply-and-select form)."""
    one = jnp.zeros(a.shape, dtype=jnp.uint32).at[..., 0, :].set(1)
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
    table = jnp.stack(pows)  # [16, ..., L, B]

    def body(acc, d):
        for _ in range(W):
            acc = mul_mod(f, acc, acc)
        return mul_mod(f, acc, table[d]), None

    acc, _ = jax.lax.scan(body, one, digits)
    return acc


@dataclass(frozen=True)
class DivSpec:
    """Lane-major mirror of ff_jax.DivSpec."""

    w: int
    x_limbs: int
    q_limbs: int

    @property
    def w_limbs_arr(self):
        return jnp.asarray(ff.int_to_limbs(self.w, ff.n_limbs_for(self.w)))[:, None]

    @property
    def mu(self):
        mu = (1 << (LIMB_BITS * self.x_limbs)) // self.w
        return jnp.asarray(
            ff.int_to_limbs(mu, self.x_limbs - ff.n_limbs_for(self.w) + 2)
        )[:, None]


def div_rem_by(spec: DivSpec, x):
    """Exact (q, r) with x = q*w + r (lane-major mirror of ff_jax;
    q - q_hat <= 2 proof in ff_jax.div_rem_by)."""
    k = ff.n_limbs_for(spec.w)
    q1 = shift_right_limbs(x, k - 1)
    q2 = mul_limbs(q1, spec.mu)
    q_hat = shift_right_limbs(q2, spec.x_limbs - k + 1)[..., : spec.q_limbs, :]
    qw = mul_limbs(q_hat, spec.w_limbs_arr, spec.x_limbs + 1)
    x_ext = pad_limbs(x, spec.x_limbs + 1)
    r, _ = sub_limbs(x_ext, qw)
    w_ext = pad_limbs(spec.w_limbs_arr, r.shape[-2])
    one = jnp.zeros(q_hat.shape, dtype=jnp.uint32).at[..., 0, :].set(1)
    for _ in range(2):
        d, borrow = sub_limbs(r, w_ext)
        qadd = add_limbs(q_hat, one, spec.q_limbs)
        take = borrow == 0
        r = select_limbs(take, d, r)
        q_hat = select_limbs(take, qadd, q_hat)
    return q_hat, r[..., :k, :]
