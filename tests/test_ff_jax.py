"""Device field-kernel tests: batched limb arithmetic vs Python ints.

All calls go through the cached jitted entry points — eager dispatch of the
limb graphs is pathological (hundreds of tiny compiles)."""

import random

import numpy as np
import pytest

from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.utils.fields import BLS12_381_FQ, BN254_FQ, BN254_FR

RNG = random.Random(0xFF)


def rand_vals(p, n, include_edges=True):
    vals = [RNG.randrange(p) for _ in range(n)]
    if include_edges:
        vals[:4] = [0, 1, p - 1, p // 2]
    return vals


@pytest.mark.parametrize("p", [BN254_FR, BLS12_381_FQ], ids=["fr", "blsfq"])
def test_mod_ops_vs_ints(p):
    f = ff.make_field(p)
    ops = ff.jitted(f)
    B = 64
    a_i = rand_vals(p, B)
    b_i = rand_vals(p, B)
    a = ff.ints_to_limbs(a_i, f.L)
    b = ff.ints_to_limbs(b_i, f.L)

    assert ff.limbs_to_ints(np.asarray(ops.add(a, b))) == [
        (x + y) % p for x, y in zip(a_i, b_i)
    ]
    assert ff.limbs_to_ints(np.asarray(ops.sub(a, b))) == [
        (x - y) % p for x, y in zip(a_i, b_i)
    ]
    assert ff.limbs_to_ints(np.asarray(ops.neg(a))) == [(-x) % p for x in a_i]
    assert ff.limbs_to_ints(np.asarray(ops.mul(a, b))) == [
        (x * y) % p for x, y in zip(a_i, b_i)
    ]


def test_inv_mod():
    p = BN254_FQ
    f = ff.make_field(p)
    ops = ff.jitted(f)
    vals = rand_vals(p, 8)
    a = ff.ints_to_limbs(vals, f.L)
    inv = ff.limbs_to_ints(np.asarray(ops.inv(a)))
    for v, iv in zip(vals, inv):
        if v == 0:
            assert iv == 0
        else:
            assert (v * iv) % p == 1


def test_pow_mod():
    p = BN254_FR
    f = ff.make_field(p)
    vals = rand_vals(p, 8)
    e = RNG.randrange(1 << 200)
    a = ff.ints_to_limbs(vals, f.L)
    out = ff.limbs_to_ints(np.asarray(ff.jitted_pow(f, e)(a)))
    assert out == [pow(v, e, p) for v in vals]


@pytest.mark.parametrize("w", [BN254_FQ, BLS12_381_FQ], ids=["bnfq", "blsfq"])
def test_div_rem_witness_hints(w):
    """Exact quotient/remainder for the int_mul hint d: x = a*b with
    a, b < w_ceil * 2^overflow."""
    w_ceil_bits = (w - 1).bit_length()
    max_ab = (1 << (w_ceil_bits + 6)) - 1
    x_limbs = ff.n_limbs_for(max_ab * max_ab)
    d_bits = w_ceil_bits + 13
    q_limbs = (d_bits + 15) // 16
    spec = ff.DivSpec(w, x_limbs, q_limbs)
    div = ff.jitted_div_rem(spec)

    xs = [RNG.randrange(max_ab) * RNG.randrange(max_ab) for _ in range(32)]
    xs[:5] = [0, 1, w - 1, w, max_ab * max_ab]
    x = ff.ints_to_limbs(xs, x_limbs)
    q, r = div(x)
    q_i = ff.limbs_to_ints(np.asarray(q))
    r_i = ff.limbs_to_ints(np.asarray(r))
    for xi, qi, ri in zip(xs, q_i, r_i):
        assert qi == xi // w, f"quotient mismatch for {xi}"
        assert ri == xi % w, f"remainder mismatch for {xi}"


def test_extract_chunks():
    import jax

    p = BN254_FQ
    f = ff.make_field(p)
    vals = rand_vals(p, 16)
    a = ff.ints_to_limbs(vals, f.L)
    chunks = np.asarray(jax.jit(lambda x: ff.extract_chunks(x, 18, 15))(a))
    for i, v in enumerate(vals):
        for c in range(15):
            assert int(chunks[i, c]) == (v >> (18 * c)) & ((1 << 18) - 1)


def test_limbs16_to_u64x4():
    vals = rand_vals(BN254_FR, 8)
    a = ff.ints_to_limbs(vals, 16)
    packed = ff.limbs16_to_u64x4(a)
    for i, v in enumerate(vals):
        got = sum(int(packed[i, w]) << (64 * w) for w in range(4))
        assert got == v
