"""Lane-major limb kernels must be bit-exact with the ff_jax forms."""

import numpy as np
import pytest

import jax

from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.kernels import ff_lane as fl
from halo2ecc_s_tpu.utils.fields import BN254_FQ, BLS12_381_FQ

RNG = np.random.default_rng(0x1A9E)
B = 64


def _rand_limbs(L, bits_per=16):
    a = RNG.integers(0, 1 << bits_per, (B, L), dtype=np.int64).astype(np.uint32)
    return a


def _t(x):
    return np.ascontiguousarray(np.swapaxes(x, -1, -2))


def test_mul_limbs_and_carry_bit_exact():
    for La, Lb, out in ((16, 16, 32), (16, 3, 19), (4, 4, 4), (17, 18, 40)):
        a, b = _rand_limbs(La), _rand_limbs(Lb)
        want = np.asarray(jax.jit(lambda x, y: ff.mul_limbs(x, y, out))(a, b))
        got = np.asarray(
            jax.jit(lambda x, y: fl.mul_limbs(x, y, out))(_t(a), _t(b))
        )
        np.testing.assert_array_equal(_t(got), want)


def test_carry_norm_wide_entries():
    x = RNG.integers(0, 1 << 32, (B, 24), dtype=np.int64).astype(np.uint32)
    want = np.asarray(jax.jit(lambda v: ff.carry_norm(v, 30))(x))
    got = np.asarray(jax.jit(lambda v: fl.carry_norm(v, 30))(_t(x)))
    np.testing.assert_array_equal(_t(got), want)


def test_sub_add_select_bit_exact():
    a, b = _rand_limbs(16), _rand_limbs(16)
    dw, bw = jax.jit(ff.sub_limbs)(a, b)
    dl, bl = jax.jit(fl.sub_limbs)(_t(a), _t(b))
    np.testing.assert_array_equal(_t(np.asarray(dl)), np.asarray(dw))
    np.testing.assert_array_equal(np.asarray(bl), np.asarray(bw))
    sw = np.asarray(jax.jit(lambda x, y: ff.add_limbs(x, y, 17))(a, b))
    sl = np.asarray(jax.jit(lambda x, y: fl.add_limbs(x, y, 17))(_t(a), _t(b)))
    np.testing.assert_array_equal(_t(sl), sw)


@pytest.mark.parametrize("p", [BN254_FQ, BLS12_381_FQ])
def test_mul_mod_pow_bit_exact(p):
    f = ff.make_field(p)
    ft = fl.make_field(p)
    L = f.L
    vals = [int(RNG.integers(0, 1 << 62)) * 0x9E3779B9 % p for _ in range(2 * B)]
    a = np.stack([np.asarray(ff.int_to_limbs(v, L)) for v in vals[:B]])
    b = np.stack([np.asarray(ff.int_to_limbs(v, L)) for v in vals[B:]])
    want = np.asarray(jax.jit(lambda x, y: ff.mul_mod(f, x, y))(a, b))
    got = np.asarray(jax.jit(lambda x, y: fl.mul_mod(ft, x, y))(_t(a), _t(b)))
    np.testing.assert_array_equal(_t(got), want)
    for i in range(4):
        assert ff.limbs_to_int(want[i]) == vals[i] * vals[B + i] % p
    wantp = np.asarray(jax.jit(lambda x: ff.pow_mod(f, x, 65537))(a[:8]))
    gotp = np.asarray(jax.jit(lambda x: fl.pow_mod(ft, x, 65537))(_t(a[:8])))
    np.testing.assert_array_equal(_t(gotp), wantp)


def test_div_rem_bit_exact():
    w = BN254_FQ
    spec_w = ff.DivSpec(w, 32, 18)
    spec_l = fl.DivSpec(w, 32, 18)
    x = RNG.integers(0, 1 << 16, (B, 32), dtype=np.int64).astype(np.uint32)
    qw, rw = jax.jit(lambda v: ff.div_rem_by(spec_w, v))(x)
    ql, rl = jax.jit(lambda v: fl.div_rem_by(spec_l, v))(_t(x))
    np.testing.assert_array_equal(_t(np.asarray(ql)), np.asarray(qw))
    np.testing.assert_array_equal(_t(np.asarray(rl)), np.asarray(rw))


def test_extract_bit_slice_bit_exact():
    x = _rand_limbs(16)
    for start, width in ((0, 18), (5, 107), (108, 38), (250, 6)):
        want = np.asarray(jax.jit(lambda v: ff.extract_bit_slice(v, start, width))(x))
        got = np.asarray(jax.jit(lambda v: fl.extract_bit_slice(v, start, width))(_t(x)))
        np.testing.assert_array_equal(_t(got), want)


def test_extract_bit_slice_vec_bit_exact():
    G, L = 12, 16
    x = RNG.integers(0, 1 << 16, (B, G, L), dtype=np.int64).astype(np.uint32)
    starts = np.asarray([0, 18, 36, 54, 72, 90, 108, 126, 144, 200, 250, 5])
    widths = np.asarray([18] * 10 + [6, 100])
    want = np.asarray(
        jax.jit(lambda v: ff.extract_bit_slice_vec(v, starts, 8, widths))(x)
    )
    xt = np.ascontiguousarray(np.moveaxis(x, 0, -1))  # [G, L, B]
    got = np.asarray(
        jax.jit(lambda v: fl.extract_bit_slice_vec(v, starts, 8, widths))(xt)
    )
    np.testing.assert_array_equal(np.moveaxis(got, -1, 0), want)


def test_lane_major_emitter_bit_exact_with_batch_major(monkeypatch):
    """The lane-major emit path (the TPU default) must produce identical
    slabs/outvals/flags to the batch-major path on the same inputs."""
    from halo2ecc_s_tpu.batch.template import Template
    from halo2ecc_s_tpu.ops.integer_ops import IntegerContext
    from halo2ecc_s_tpu.utils.fields import BN254_FQ

    def build(ctx, ins):
        ictx = IntegerContext(ctx, BN254_FQ)
        a = ictx.assign_w(ins["a"])
        b = ictx.assign_w(ins["b"])
        return ictx.int_mul(a, b)

    def mk():
        return Template.trace(
            build, {"a": (254, 111 % BN254_FQ), "b": (254, 222 % BN254_FQ)}
        )

    rng = np.random.default_rng(9)
    a = rng.integers(0, 1 << 16, (8, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (8, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF
    b[:, -1] &= 0x1FFF
    ins = {"a": a, "b": b}

    monkeypatch.setenv("HALO2ECC_TPU_LANE_MAJOR", "0")
    t_batch = mk()
    slabs_b, outs_b, flags_b = t_batch.slab_value_emitter()(ins)
    tabs_b = t_batch.device_emitter()(ins)

    monkeypatch.setenv("HALO2ECC_TPU_LANE_MAJOR", "1")
    t_lane = mk()
    slabs_l, outs_l, flags_l = t_lane.slab_value_emitter()(ins)
    tabs_l = t_lane.device_emitter()(ins)

    assert set(slabs_b) == set(slabs_l)
    for r in slabs_b:
        np.testing.assert_array_equal(np.asarray(slabs_b[r]), np.asarray(slabs_l[r]))
        np.testing.assert_array_equal(np.asarray(tabs_b[r]), np.asarray(tabs_l[r]))
    assert set(outs_b) == set(outs_l)
    for k in outs_b:
        np.testing.assert_array_equal(np.asarray(outs_b[k]), np.asarray(outs_l[k]))
    for k in flags_b:
        assert bool(flags_b[k]) == bool(flags_l[k])


def test_shl_limbs_bit_exact_vs_int():
    """shl_limbs (both layouts) == integer x << s, for shifts spanning
    in-limb, limb-aligned, and multi-limb offsets (the 2^(108i) mulc
    coefficients use s in {108, 216})."""
    for L, s, out in (
        (16, 1, 17), (16, 16, 18), (16, 108, 23), (7, 108, 14),
        (7, 216, 21), (3, 108, 10), (16, 0, 16), (5, 31, 8), (4, 108, 6),
    ):
        a = _rand_limbs(L)
        want_ints = [
            (int(sum(int(v) << (16 * i) for i, v in enumerate(row))) << s)
            & ((1 << (16 * out)) - 1)
            for row in a
        ]
        got = np.asarray(jax.jit(lambda v: ff.shl_limbs(v, s, out))(a))
        got_l = np.asarray(jax.jit(lambda v: fl.shl_limbs(v, s, out))(_t(a)))
        np.testing.assert_array_equal(_t(got_l), got)
        for row, w in zip(got, want_ints):
            assert sum(int(v) << (16 * i) for i, v in enumerate(row)) == w


def test_shl_limbs_vec_matches_scalar():
    G, L, out = 6, 7, 21
    shifts = np.asarray([1, 16, 108, 216, 0, 31])
    x = RNG.integers(0, 1 << 16, (B, G, L), dtype=np.int64).astype(np.uint32)
    got = np.asarray(jax.jit(lambda v: ff.shl_limbs_vec(v, shifts, out))(x))
    xl = np.ascontiguousarray(np.moveaxis(x, 0, -1))  # [G, L, B]
    got_l = np.asarray(jax.jit(lambda v: fl.shl_limbs_vec(v, shifts, out))(xl))
    np.testing.assert_array_equal(np.moveaxis(got_l, -1, 0), got)
    for g in range(G):
        want = np.asarray(
            jax.jit(lambda v: ff.shl_limbs(v, int(shifts[g]), out))(x[:, g])
        )
        np.testing.assert_array_equal(got[:, g], want)


def test_pow_mod_windowed_matches_python_pow():
    """4-bit-window pow_mod (both layouts) == python pow, across exponent
    shapes incl. Fermat (p-2), small, zero, and window-boundary values."""
    f = ff.make_field(BN254_FQ)
    flane = fl.make_field(BN254_FQ)
    vals = [1, 2, BN254_FQ - 1, 0x1234567890ABCDEF, 3**50 % BN254_FQ]
    a = np.stack([np.asarray(ff.int_to_limbs(v, f.L)) for v in vals])
    for e in (0, 1, 2, 15, 16, 17, 255, 1 << 63, BN254_FQ - 2):
        got = np.asarray(jax.jit(lambda v: ff.pow_mod(f, v, e))(a))
        got_l = np.asarray(jax.jit(lambda v: fl.pow_mod(flane, v, e))(_t(a)))
        np.testing.assert_array_equal(_t(got_l), got)
        for i, v in enumerate(vals):
            want = pow(v, e, BN254_FQ)
            assert ff.limbs_to_int(got[i]) == want, (e, v)
