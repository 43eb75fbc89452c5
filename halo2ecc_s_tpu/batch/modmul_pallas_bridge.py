"""Bridge for fusing evaluator mul+mod pairs through the Pallas kernel."""

from __future__ import annotations

import jax.numpy as jnp

from ..kernels import ff_jax as ff
from ..kernels.modmul_pallas import mul_mod_pallas


def fused_mul_mod(m: int, a, b, out_limbs: int):
    """a*b mod m via the fused Pallas kernel; operands any width <= 16 limbs
    after padding (exact for products < 2^512)."""
    a16 = ff.pad_limbs(a, 16)
    b16 = ff.pad_limbs(b, 16)
    r = mul_mod_pallas(m, a16, b16)
    return ff.pad_limbs(r, out_limbs)
