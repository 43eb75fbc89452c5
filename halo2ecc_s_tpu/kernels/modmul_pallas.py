"""Pallas TPU kernel for fused batched modular multiplication.

One kernel invocation per row tile keeps the full 2L-limb product and the
Barrett reduction in VMEM (the composed XLA path materialises several
intermediate HBM tensors per modmul). Self-contained u32 16-bit-limb
arithmetic with unrolled carry/borrow chains; field constants (p, mu) enter
as kernel inputs (Pallas rejects captured array constants).

Use interpret=True (tests) on CPU; compiled on TPU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import ff_jax as ff

BLOCK = 256
LIMB_MASK = 0xFFFF


def _conv_mul(a, b, out_len: int, interpret: bool):
    """Exact limb product, values in-kernel; partial sums < 2^22.

    Kept strictly 2-D for Mosaic: per source limb i, one [rows, Lb] partial
    product, end-padded (plain concat) and circularly rolled into place —
    Mosaic lowers neither scatter-add, offset pads, nor 3-D reshapes here."""
    La, Lb = a.shape[-1], b.shape[-1]
    if interpret:
        roll = lambda x, s: jnp.roll(x, s, axis=-1) if s else x
    else:
        from jax.experimental.pallas import tpu as pltpu

        roll = lambda x, s: pltpu.roll(x, s, x.ndim - 1) if s else x

    pad = jnp.zeros(a.shape[:-1] + (out_len - Lb,), jnp.uint32)
    acc = jnp.zeros(a.shape[:-1] + (out_len,), jnp.uint32)
    for i in range(La):
        prod = a[..., i : i + 1] * b  # [rows, Lb] exact u32
        lo = jnp.concatenate([prod & LIMB_MASK, pad], axis=-1)
        hi = jnp.concatenate([prod >> 16, pad], axis=-1)
        acc = acc + roll(lo, i)
        acc = acc + roll(hi, i + 1)
    # carry propagate (unrolled)
    outs = []
    c = jnp.zeros(a.shape[:-1], jnp.uint32)
    for k in range(out_len):
        t = acc[..., k] + c
        outs.append(t & LIMB_MASK)
        c = t >> 16
    return jnp.stack(outs, axis=-1)


def _cond_sub(x, m):
    """x - m when x >= m else x (both limb vectors, m broadcastable)."""
    L = x.shape[-1]
    outs = []
    borrow = jnp.zeros(x.shape[:-1], jnp.uint32)
    for k in range(L):
        mk = m[..., k] if k < m.shape[-1] else 0
        t = x[..., k] + (1 << 16) - mk - borrow
        outs.append(t & LIMB_MASK)
        borrow = 1 - (t >> 16)
    d = jnp.stack(outs, axis=-1)
    keep = (borrow == 1)[..., None]
    return jnp.where(keep, x, d)


def _mulmod_kernel(L: int, interpret: bool, a_ref, b_ref, p_ref, mu_ref, out_ref):
    a = a_ref[...]
    b = b_ref[...]
    p = p_ref[...]
    mu = mu_ref[...]

    x = _conv_mul(a, b, 2 * L, interpret)
    # Barrett (HAC 14.42): q3 = ((x >> b^(L-1)) * mu) >> b^(L+1)
    q1 = x[..., L - 1 :]
    q2 = _conv_mul(q1, mu[None, :], (L + 1) + (L + 2), interpret)
    q3 = q2[..., L + 1 :]
    # full width then truncate: the roll-based conv cannot truncate in place
    q3p = _conv_mul(q3, p[None, :], (L + 2) + L, interpret)[..., : L + 1]
    r1 = x[..., : L + 1]
    # r = r1 - q3p (non-negative)
    outs = []
    borrow = jnp.zeros(a.shape[:-1], jnp.uint32)
    for k in range(L + 1):
        t = r1[..., k] + (1 << 16) - q3p[..., k] - borrow
        outs.append(t & LIMB_MASK)
        borrow = 1 - (t >> 16)
    r = jnp.stack(outs, axis=-1)
    r = _cond_sub(r, p[None, :])
    r = _cond_sub(r, p[None, :])
    out_ref[...] = r[..., :L]


@lru_cache(maxsize=None)
def _build(p: int, L: int, block: int, interpret: bool):
    from jax.experimental import pallas as pl

    p_limbs = np.asarray(ff.int_to_limbs(p, L))
    mu = (1 << (16 * 2 * L)) // p
    mu_limbs = np.asarray(ff.int_to_limbs(mu, L + 2))

    def call(a, b):
        B = a.shape[0]
        grid = (pl.cdiv(B, block),)
        return pl.pallas_call(
            partial(_mulmod_kernel, L, interpret),
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((block, L), lambda i: (i, 0)),
                pl.BlockSpec((block, L), lambda i: (i, 0)),
                pl.BlockSpec((L,), lambda i: (0,)),
                pl.BlockSpec((L + 2,), lambda i: (0,)),
            ],
            out_specs=pl.BlockSpec((block, L), lambda i: (i, 0)),
            interpret=interpret,
        )(a, b, p_limbs, mu_limbs)

    return jax.jit(call)


def mul_mod_pallas(p: int, a, b, block: int = BLOCK, interpret: bool | None = None):
    """Batched a*b mod p with 16-bit limbs in u32 lanes via a Pallas kernel.

    a, b: u32[B, L] canonical. interpret defaults to True off-TPU."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    L = a.shape[-1]
    return _build(p, L, min(block, a.shape[0]), interpret)(a, b)
