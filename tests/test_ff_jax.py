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


def test_carry_borrow_lookahead_ripple_edges():
    """Adversarial patterns for the log-depth carry/borrow lookahead:
    full-length carry ripples (0xFFFF chains + 1), generate-at-boundary
    (limb sum exactly 2^16), and a < b borrows that propagate through
    equal-limb runs."""
    import jax

    L = 16
    M = (1 << 256) - 1

    # carry_norm: raw accumulator entries up to 2^32-1 with long ripples
    cases = [
        np.full((L,), 0xFFFF, np.uint32),                      # all-propagate
        np.array([0x1FFFE] + [0xFFFF] * (L - 1), np.uint32),   # ripple from 0
        np.array([0xFFFFFFFF] * L, np.uint32),                 # max entries
        np.array([0x10000] * L, np.uint32),                    # generate-only
        np.array([0xFFFF, 0x1FFFF] + [0xFFFE] * (L - 2), np.uint32),
    ]
    rng = np.random.default_rng(3)
    cases += list(rng.integers(0, 1 << 32, (32, L), dtype=np.uint64).astype(np.uint32))
    x = np.stack(cases)
    for out_len in (L, L + 2, L - 3):
        got = np.asarray(jax.jit(lambda v: ff.carry_norm(v, out_len))(x))
        for i in range(x.shape[0]):
            want = sum(int(x[i, j]) << (16 * j) for j in range(L))
            want %= 1 << (16 * out_len)
            assert ff.limbs_to_int(got[i]) == want, (i, out_len)

    # sub_limbs: borrow chains through equal-limb prefixes
    pairs = [
        (0, 1),
        (1 << 255, 1),
        (M, M),
        ((1 << 256) - 2, M),                   # a < b, all limbs equal but last
        (0x10000_0000, 0xFFFF_FFFF),
    ]
    pairs += [
        (
            int.from_bytes(rng.bytes(32), "little"),
            int.from_bytes(rng.bytes(32), "little"),
        )
        for _ in range(32)
    ]
    a = ff.ints_to_limbs([p[0] for p in pairs], L)
    b = ff.ints_to_limbs([p[1] for p in pairs], L)
    d, borrow = jax.jit(ff.sub_limbs)(a, b)
    d, borrow = np.asarray(d), np.asarray(borrow)
    for i, (av, bv) in enumerate(pairs):
        want = (av - bv) % (1 << (16 * L))
        assert ff.limbs_to_int(d[i]) == want, i
        assert int(borrow[i]) == (1 if av < bv else 0), i

    # mul_limbs: mixed widths incl. asymmetric + truncated out_len
    for La, Lb, out_len in ((16, 16, 32), (16, 16, 17), (24, 5, 29), (3, 24, 12)):
        av = [int(v) % (1 << (16 * La)) for v in rng.integers(0, 1 << 63, 8)] + [
            (1 << (16 * La)) - 1
        ]
        bv = [int(v) % (1 << (16 * Lb)) for v in rng.integers(0, 1 << 63, 8)] + [
            (1 << (16 * Lb)) - 1
        ]
        aa = ff.ints_to_limbs(av, La)
        bb = ff.ints_to_limbs(bv, Lb)
        got = np.asarray(jax.jit(lambda x, y: ff.mul_limbs(x, y, out_len))(aa, bb))
        for i in range(len(av)):
            want = (av[i] * bv[i]) % (1 << (16 * out_len))
            assert ff.limbs_to_int(got[i]) == want, (La, Lb, out_len, i)


def test_mxu_constmul_bit_exact():
    """HALO2ECC_TPU_MXU_CONSTMUL routes Barrett's constant-operand products
    (mu, p, w) through one bf16 Toeplitz matmul (8-bit limbs; exact in the
    f32 accumulator). Must be bit-exact with the VPU limb path for both
    fields and for div_rem witness hints, incl. boundary values."""
    import os

    import jax

    for p in (BN254_FQ, BN254_FR, BLS12_381_FQ):
        f = ff.make_field(p)
        vals = rand_vals(p, 12) + [0, 1, p - 1, p - 2]
        a = ff.ints_to_limbs(vals, f.L)
        b = ff.ints_to_limbs(list(reversed(vals)), f.L)
        spec = ff.DivSpec(w=p, x_limbs=2 * f.L + 1, q_limbs=f.L + 2)
        xs = [v1 * v2 + v3 for v1, v2, v3 in zip(vals, reversed(vals), vals)]
        x = ff.ints_to_limbs(xs, spec.x_limbs)

        def run():
            mm = jax.jit(lambda u, v: ff.mul_mod(f, u, v))(a, b)
            q, r = jax.jit(lambda u: ff.div_rem_by(spec, u))(x)
            return np.asarray(mm), np.asarray(q), np.asarray(r)

        assert "HALO2ECC_TPU_MXU_CONSTMUL" not in os.environ
        mm0, q0, r0 = run()
        os.environ["HALO2ECC_TPU_MXU_CONSTMUL"] = "1"
        try:
            mm1, q1, r1 = run()
        finally:
            del os.environ["HALO2ECC_TPU_MXU_CONSTMUL"]
        assert np.array_equal(mm0, mm1)
        assert np.array_equal(q0, q1)
        assert np.array_equal(r0, r1)
        for i, v in enumerate(xs):
            assert ff.limbs_to_int(q1[i]) == v // p
            assert ff.limbs_to_int(r1[i]) == v % p
            assert ff.limbs_to_int(mm1[i]) == (vals[i] * list(reversed(vals))[i]) % p


def test_mul_limbs_backend_forms_bit_exact(monkeypatch):
    """mul_limbs dispatches by backend: skew-reshape diagonal sums on CPU,
    0/1-tensor contraction on TPU (scripts/kernel_microbench.py: the skew
    form's flat reshapes force lane relayouts on TPU, 3x slower). Both forms
    must agree bit-exactly, including truncated/extended out_len."""
    rng = np.random.default_rng(42)
    for La, Lb, out_len in [(16, 16, 32), (16, 18, 20), (3, 16, 40), (1, 1, 1)]:
        a_i = [int.from_bytes(rng.bytes(2 * La), "little") % (1 << (16 * La))
               for _ in range(9)]
        b_i = [int.from_bytes(rng.bytes(2 * Lb), "little") % (1 << (16 * Lb))
               for _ in range(9)]
        a = ff.ints_to_limbs(a_i, La)
        b = ff.ints_to_limbs(b_i, Lb)
        monkeypatch.setattr(ff, "_backend", lambda: "cpu")
        skew = np.asarray(ff.mul_limbs(a, b, out_len))
        monkeypatch.setattr(ff, "_backend", lambda: "tpu")
        cont = np.asarray(ff.mul_limbs(a, b, out_len))
        assert np.array_equal(skew, cont), (La, Lb, out_len)
        for i in range(9):
            want = (a_i[i] * b_i[i]) % (1 << (16 * out_len))
            assert ff.limbs_to_int(skew[i]) == want


def test_div_rem_correction_bound():
    """The generalized Barrett quotient estimate in div_rem_by undershoots
    by at most 2 (docstring proof), so its 2 correction rounds are always
    enough. Brute-forced here in exact ints over every production modulus
    and input width, with adversarial near-boundary inputs."""
    import random

    from halo2ecc_s_tpu.utils.fields import (
        BLS12_381_FQ, BLS12_381_FR, BN254_FQ, BN254_FR,
    )

    rng = random.Random(7)
    for w in (BN254_FR, BN254_FQ, BLS12_381_FR, BLS12_381_FQ):
        k = ff.n_limbs_for(w)
        assert w >= 1 << (16 * (k - 1))  # proof precondition
        for x_limbs in range(k, 2 * k + 6):
            mu = (1 << (16 * x_limbs)) // w
            t = x_limbs - k + 1
            cases = [(1 << (16 * x_limbs)) - 1, w - 1, w, w + 1]
            for _ in range(500):
                cases.append(rng.randrange(1 << (16 * x_limbs)))
            for _ in range(300):
                q = rng.randrange(1 << (16 * (x_limbs - k + 1)))
                x = q * w + w - 1 - rng.randrange(1 << 16)
                if 0 <= x < (1 << (16 * x_limbs)):
                    cases.append(x)
            for x in cases:
                q_hat = ((x >> (16 * (k - 1))) * mu) >> (16 * t)
                err = x // w - q_hat
                assert 0 <= err <= 2, (hex(w)[:12], x_limbs, err)
