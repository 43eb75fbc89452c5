"""Limb-schema parameters for non-native ("wrong field" W over native N)
arithmetic.

Reference parity: src/range_info.rs. All quantities are derived at trace time
with exact integers; the soundness/completeness `pre_check` assertions
(range_info.rs:186-297) are reproduced so any (W, N, common_bits,
overflow_bits) combination that would be unsound fails fast.

Key derived constants for (bn254 Fq over Fr, 18-bit common ranges):
limb_bits = 108, limbs = 3, d_bits = 267.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Optional

from .context import COMMON_RANGE_BITS, RANGE_VALUE_DECOMPOSE

OVERFLOW_BITS = 6  # reference context.rs:38


def _bits_to_leading(bits: int, common_bits: int):
    common_limb_bits = RANGE_VALUE_DECOMPOSE * common_bits
    leading_bits = common_limb_bits if bits % common_limb_bits == 0 else bits % common_limb_bits
    assert leading_bits >= 2 * common_bits
    assert leading_bits <= common_limb_bits
    leading_chunk_bits = leading_bits % common_bits
    if leading_chunk_bits == 0:
        return common_bits, leading_bits // common_bits
    return leading_chunk_bits, leading_bits // common_bits + 1


@dataclass
class RangeInfo:
    w_modulus: int  # wrong-field modulus W
    n_modulus: int  # native field N
    common_bits: int = COMMON_RANGE_BITS
    overflow_bits: int = OVERFLOW_BITS

    # derived
    limbs: int = 0
    limb_bits: int = 0
    w_ceil_bits: int = 0
    n_floor_bits: int = 0
    d_bits: int = 0
    w_ceil_leading_bits: int = 0
    w_ceil_leading_decompose: int = 0
    n_floor_leading_bits: int = 0
    n_floor_leading_decompose: int = 0
    d_leading_bits: int = 0
    d_leading_decompose: int = 0
    w_ceil: int = 0
    limb_mask: int = 0
    limb_modulus: int = 0
    common_range_mask: int = 0
    max_d: int = 0
    overflow_limit: int = 0
    w_native: int = 0
    w_modulus_limbs_le: List[int] = field(default_factory=list)
    limb_coeffs: List[int] = field(default_factory=list)
    pure_w_check_limbs: int = 0
    reduce_check_limbs: int = 0
    mul_check_limbs: int = 0
    w_modulus_of_ceil_times: List[Optional[List[int]]] = field(default_factory=list)

    def __post_init__(self):
        w, n = self.w_modulus, self.n_modulus
        cb, ob = self.common_bits, self.overflow_bits

        w_max = w - 1
        self.w_ceil_bits = w_max.bit_length()
        self.w_ceil_leading_bits, self.w_ceil_leading_decompose = _bits_to_leading(
            self.w_ceil_bits, cb
        )

        n_max = n - 1
        self.n_floor_bits = n_max.bit_length() - 1
        self.n_floor_leading_bits, self.n_floor_leading_decompose = _bits_to_leading(
            self.n_floor_bits, cb
        )

        # d range for a*b = d*w + rem with a,b < w_ceil * 2^overflow
        self.d_bits = self.w_ceil_bits + 2 * ob + 1
        assert (1 << self.d_bits) * w >= (1 << (self.w_ceil_bits + ob)) ** 2
        self.d_leading_bits, self.d_leading_decompose = _bits_to_leading(self.d_bits, cb)

        self.limb_bits = cb * RANGE_VALUE_DECOMPOSE
        self.limbs = (self.w_ceil_bits + self.limb_bits - 1) // self.limb_bits

        self.max_d = 1 << self.d_bits
        self.limb_mask = (1 << self.limb_bits) - 1
        self.limb_modulus = 1 << self.limb_bits
        self.common_range_mask = (1 << cb) - 1
        self.w_ceil = 1 << self.w_ceil_bits
        self.w_native = w % n
        self.w_modulus_limbs_le = [
            (w >> (i * self.limb_bits)) & self.limb_mask for i in range(self.limbs)
        ]
        self.limb_coeffs = [(1 << (i * self.limb_bits)) % n for i in range(self.limbs)]
        self.overflow_limit = 1 << ob

        lb = self.limb_bits
        self.pure_w_check_limbs = (self.w_ceil_bits - self.n_floor_bits + lb - 1) // lb
        self.mul_check_limbs = (
            max(self.w_ceil_bits * 2 + ob * 2, self.d_bits + self.w_ceil_bits)
            - self.n_floor_bits
            + lb
            - 1
        ) // lb
        self.reduce_check_limbs = (
            max(self.w_ceil_bits + ob, cb + self.w_ceil_bits)
            - self.n_floor_bits
            + lb
            - 1
        ) // lb

        self.w_modulus_of_ceil_times = [None] * self.overflow_limit
        for t in range(1, self.overflow_limit):
            self.w_modulus_of_ceil_times[t] = self._find_w_modulus_of_ceil_times(t)

        self._pre_check()

    # -- helpers --

    def bn_to_limbs(self, v: int) -> List[int]:
        return [(v >> (i * self.limb_bits)) & self.limb_mask for i in range(self.limbs)]

    def _find_w_modulus_of_ceil_times(self, times: int) -> List[int]:
        """Per-limb constants of ceil(w_ceil*times / w) * w, with each
        non-leading limb lifted by times*limb_modulus so per-limb subtraction
        in int_sub/int_neg cannot borrow (range_info.rs:334-359)."""
        max_v = self.w_ceil * times
        n_, rem = divmod(max_v, self.w_modulus)
        if rem > 0:
            n_ += 1
        upper = self.w_modulus * n_

        limbs = []
        for _ in range(self.limbs - 1):
            rem_i = (upper & self.limb_mask) + self.limb_modulus * times
            upper = (upper - rem_i) >> self.limb_bits
            limbs.append(rem_i % self.n_modulus)
            assert rem_i >= self.limb_modulus * times - 1
            assert rem_i < self.limb_modulus * (times + 1)
        lead_unit = 1 << (self.w_ceil_bits % self.limb_bits)
        assert upper >= lead_unit * times
        assert upper < lead_unit * (times + 1)
        limbs.append(upper % self.n_modulus)
        return limbs

    def _pre_check(self):
        """Soundness/completeness assertions (range_info.rs:186-297)."""
        n, w = self.n_modulus, self.w_modulus
        lm = self.limb_modulus
        common_modulus = 1 << self.common_bits

        # is_pure_w_modulus: lcm(limb^pure_w_check_limbs, native) >= w_ceil
        limb_check = 1 << (self.limb_bits * self.pure_w_check_limbs)
        assert math.lcm(n, limb_check) >= self.w_ceil

        # reduce(): a = d * w + rem with d a common-range value
        max_a = self.w_ceil * (self.overflow_limit - 1) - 1
        max_d = common_modulus - 1
        assert max_a <= max_d * w
        limb_check = 1 << (self.limb_bits * self.reduce_check_limbs)
        assert math.lcm(n, limb_check) >= max_d * w + self.w_ceil
        max_v = lm - 1
        max_wi = max(self.w_modulus_limbs_le)
        max_rem = lm - 1
        assert max_v * lm >= max_d * max_wi + max_rem + max_v + self.overflow_limit * lm
        assert max_v * lm < n
        assert max_d * max_wi + max_rem + max_v + self.overflow_limit * lm < n
        max_ai = lm * (self.overflow_limit - 1) - 1
        assert self.overflow_limit * lm - self.overflow_limit >= max_ai

        # mul(): a * b = d * w + rem
        max_a = self.w_ceil * (self.overflow_limit - 1) - 1
        max_d = (1 << self.d_bits) - 1
        assert max_a * max_a <= max_d * w
        lcm = math.lcm(n, 1 << (self.limb_bits * self.mul_check_limbs))
        max_rem = self.w_ceil - 1
        assert lcm > max_a * max_a
        assert lcm > max_d * w + max_rem
        borrow = self.limbs * lm + 2
        max_d_j = lm - 1
        assert borrow * lm - borrow >= self.limbs * max_d_j * max_wi + (lm - 1)
        max_v = lm * common_modulus - 1
        max_a_j = lm * (self.overflow_limit - 1)
        assert max_v * lm >= max_a_j * max_a_j * self.limbs + lm * borrow
        assert max_v * lm < n

        assert self.limbs >= 3


@lru_cache(maxsize=None)
def range_info(
    w_modulus: int,
    n_modulus: int,
    common_bits: int = COMMON_RANGE_BITS,
    overflow_bits: int = OVERFLOW_BITS,
) -> RangeInfo:
    return RangeInfo(w_modulus, n_modulus, common_bits, overflow_bits)
