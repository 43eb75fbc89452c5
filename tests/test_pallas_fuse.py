"""Fused Pallas mul+mod evaluator path (HALO2ECC_TPU_PALLAS_FUSE).

The peephole in batch/evaluator.py rewrites mod(mul(a, b), m) pairs (product
with a single consumer) through the fused Pallas Barrett kernel. These tests
run the kernel in interpret mode on CPU and assert bit-exactness against the
unfused XLA path and against Python-int ground truth, including non-canonical
operands up to 2^256 - 1 (the Barrett domain extension the bridge relies on).
"""

import numpy as np
import pytest

from halo2ecc_s_tpu.batch.evaluator import build_evaluator
from halo2ecc_s_tpu.batch.modmul_pallas_bridge import fused_mul_mod
from halo2ecc_s_tpu.batch.symbolic import Tape
from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.utils.fields import BN254_FR


def _mk_tape():
    """Tape with two chained fusable mod(mul) pairs."""
    n = BN254_FR
    tape = Tape(n)
    a = tape.input("a", 123456789 % n, 254)
    b = tape.input("b", 987654321 % n, 254)
    c = (a * b) % n  # fusable: mul's only consumer is the mod
    d = (c * a) % n  # fusable again (chained)
    return tape, (d.nid,)


def test_fused_evaluator_bit_exact_vs_unfused():
    tape, roots = _mk_tape()
    ev_f = build_evaluator(tape, roots, fuse_pallas_modmul=True)
    ev_nf = build_evaluator(tape, roots, fuse_pallas_modmul=False)
    assert ev_f.fused_count == 2, "peephole must engage on mod(mul) pairs"
    assert ev_nf.fused_count == 0

    rng = np.random.default_rng(42)
    B = 8
    a = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    b = rng.integers(0, 1 << 16, (B, 16), dtype=np.int64).astype(np.uint32)
    a[:, -1] &= 0x1FFF  # < 2^253: canonical-range 254-bit inputs
    b[:, -1] &= 0x1FFF
    ins = {"a": a, "b": b}
    out_f = {k: np.asarray(v) for k, v in ev_f(ins).items()}
    out_nf = {k: np.asarray(v) for k, v in ev_nf(ins).items()}
    assert set(out_f) == set(out_nf)
    for k in out_f:
        np.testing.assert_array_equal(out_f[k], out_nf[k])
    # ground truth
    n = BN254_FR
    for lane in range(B):
        av = ff.limbs_to_int(a[lane])
        bv = ff.limbs_to_int(b[lane])
        want = (av * bv % n) * av % n
        got = ff.limbs_to_int(out_f[roots[0]][lane])
        assert got == want


def test_fused_mul_mod_noncanonical_near_2_256():
    """The fused kernel must be exact for any operands < 2^256 (products up
    to ~2^512), not just canonical values < p."""
    n = BN254_FR
    cases = [
        ((1 << 256) - 1, (1 << 256) - 1),
        ((1 << 256) - 1, 1),
        (n, n),  # exactly p: non-canonical
        (2 * n + 12345, 3 * n + 67),
        ((1 << 255) + 17, (1 << 254) + 3),
    ]
    a = ff.ints_to_limbs([c[0] for c in cases], 16)
    b = ff.ints_to_limbs([c[1] for c in cases], 16)
    r = np.asarray(fused_mul_mod(n, a, b, 16))
    for lane, (av, bv) in enumerate(cases):
        assert ff.limbs_to_int(r[lane]) == (av * bv) % n


def test_fuse_skips_multi_consumer_products():
    n = BN254_FR
    tape = Tape(n)
    a = tape.input("a", 5, 254)
    b = tape.input("b", 7, 254)
    prod = a * b
    c = prod % n
    d = prod + a  # second consumer of the product: must not fuse
    ev = build_evaluator(tape, (c.nid, d.nid), fuse_pallas_modmul=True)
    assert ev.fused_count == 0
    a_arr = ff.ints_to_limbs([5], 16)
    b_arr = ff.ints_to_limbs([7], 16)
    out = {k: np.asarray(v) for k, v in ev({"a": a_arr, "b": b_arr}).items()}
    assert ff.limbs_to_int(out[c.nid][0]) == 35
    assert ff.limbs_to_int(out[d.nid][0]) == 40
