"""Pallas modmul kernel vs the reference limb path (interpret mode on CPU)."""

import random

import numpy as np

from halo2ecc_s_tpu.kernels import ff_jax as ff
from halo2ecc_s_tpu.kernels.modmul_pallas import mul_mod_pallas
from halo2ecc_s_tpu.utils.fields import BN254_FR

RNG = random.Random(0xBA5)


def test_pallas_mul_mod_matches():
    p = BN254_FR
    f = ff.make_field(p)
    B = 16
    a_i = [RNG.randrange(p) for _ in range(B)]
    b_i = [RNG.randrange(p) for _ in range(B)]
    a_i[0], b_i[0] = 0, 0
    a_i[1], b_i[1] = p - 1, p - 1
    a = ff.ints_to_limbs(a_i, f.L)
    b = ff.ints_to_limbs(b_i, f.L)
    out = np.asarray(mul_mod_pallas(p, a, b, block=8, interpret=True))
    assert ff.limbs_to_ints(out) == [(x * y) % p for x, y in zip(a_i, b_i)]
