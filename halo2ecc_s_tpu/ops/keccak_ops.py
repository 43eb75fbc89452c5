"""In-circuit Keccak-256 over assigned bits (built purely on base-chip logic).

Reference parity: src/circuit/keccak_chip.rs. State is [x][y][z] of assigned
bit conditions with z=0 holding the most-significant bit of the u64 lane
(keccak_chip.rs:123-131); ABSORB_BITS_RATE = 1088; padding is the original
0x01/0x80 keccak convention, inputs are 256-bit big-endian scalar
decompositions. rho/pi uses the standard offset table rather than the
reference's chained-rotation walk — same permutation.
"""

from __future__ import annotations

from typing import List

from ..core.assign import AssignedCondition, AssignedValue
from ..core.context import Context
from ..utils.keccak import RHO_OFFSETS, ROUND_CONSTANTS

T = 5
W = 64
ABSORB_BITS_RATE = 1088
N_R = 24


class KeccakContext:
    """Keccak sponge ops over a native Context."""

    def __init__(self, ctx: Context):
        self.ctx = ctx

    def init(self):
        zero = AssignedCondition(self.ctx.assign_constant(0))
        return [[[zero] * W for _ in range(T)] for _ in range(T)]

    # -- round functions --

    def theta(self, state):
        ctx = self.ctx
        c = []
        for x in range(T):
            ci = list(state[x][0])
            for y in range(1, T):
                for z in range(W):
                    ci[z] = ctx.xor(ci[z], state[x][y][z])
            c.append(ci)
        for x in range(T):
            # d[x] = c[x-1] ^ rol(c[x+1], 1); array-left-rotate == u64 ROL here
            di = c[(x + 1) % T][1:] + c[(x + 1) % T][:1]
            for z in range(W):
                di[z] = ctx.xor(c[(x - 1) % T][z], di[z])
            for y in range(T):
                for z in range(W):
                    state[x][y][z] = ctx.xor(state[x][y][z], di[z])

    def rho_and_pi(self, state):
        b = [[None] * T for _ in range(T)]
        for x in range(T):
            for y in range(T):
                r = RHO_OFFSETS[x][y]
                lane = state[x][y]
                b[y][(2 * x + 3 * y) % T] = lane[r:] + lane[:r]
        return b

    def xi(self, state, b):
        ctx = self.ctx
        for x in range(T):
            for y in range(T):
                for z in range(W):
                    t = ctx.not_and(b[(x + 1) % T][y][z], b[(x + 2) % T][y][z])
                    state[x][y][z] = ctx.xor(b[x][y][z], t)

    def iota(self, state, round_idx: int):
        ctx = self.ctx
        rc = ROUND_CONSTANTS[round_idx]
        for z in range(W):
            # state z is big-endian within the lane
            if rc & (1 << (W - z - 1)):
                state[0][0][z] = ctx.not_(state[0][0][z])

    def permute(self, state):
        for i in range(N_R):
            self.theta(state)
            b = self.rho_and_pi(state)
            self.xi(state, b)
            self.iota(state, i)

    # -- sponge --

    def absorb(self, state, input_bits):
        assert len(input_bits) == ABSORB_BITS_RATE
        ctx = self.ctx
        x = y = 0
        w_bytes = W // 8
        for i in range(ABSORB_BITS_RATE // W):
            for j in range(w_bytes):
                for k in range(8):
                    z = i * W + j * 8 + k
                    permuted_z = (w_bytes - j - 1) * 8 + k
                    state[x][y][permuted_z] = ctx.xor(
                        input_bits[z], state[x][y][permuted_z]
                    )
            if x < T - 1:
                x += 1
            else:
                y += 1
                x = 0
        self.permute(state)

    def decompose_scalar_as_u256_be(self, s: AssignedValue) -> List[AssignedCondition]:
        """256 big-endian bits of a native scalar (keccak_chip.rs:168-209).
        The decomposition may exceed the modulus-range scalar; used as u256."""
        ctx = self.ctx
        bits = []
        s_bn = s.val
        v = s
        for i in range(128):
            b0 = ctx.assign_bit((s_bn >> (2 * i)) & 1)
            b1 = ctx.assign_bit((s_bn >> (2 * i + 1)) & 1)
            v_next = s_bn >> (2 * i + 2)
            cells, _ = ctx.one_line_with_last(
                [(v_next, 4), (b1.value, 2), (b0.value, 1)], (v, -1), None, (), None
            )
            v = cells[0]
            bits.append(b0)
            bits.append(b1)
        ctx.assert_constant(v, 0)
        bits.reverse()
        return bits

    def compose_to_scalar_be(self, s: List[AssignedCondition]) -> AssignedValue:
        assert len(s) % 2 == 0
        ctx = self.ctx
        acc = ctx.assign_constant(0)
        for i in range(len(s) // 2):
            b0 = s[2 * i + 1]
            b1 = s[2 * i]
            acc = ctx.sum_with_constant(
                [(b0.value, 1), (b1.value, 2), (acc, 4)], None
            )
        return acc

    def hash(self, inputs: List[AssignedValue]) -> AssignedValue:
        ctx = self.ctx
        one = AssignedCondition(ctx.assign_constant(1))
        zero = AssignedCondition(ctx.assign_constant(0))
        state = self.init()

        raw_len = len(inputs) * 256
        input_bits: List[AssignedCondition] = []
        for v in inputs:
            input_bits.extend(self.decompose_scalar_as_u256_be(v))

        aligned_len = (raw_len + 8 + ABSORB_BITS_RATE - 1) // ABSORB_BITS_RATE * ABSORB_BITS_RATE
        padding_len = aligned_len - raw_len

        if padding_len == 8:
            input_bits.extend([one] + [zero] * 6 + [one])  # 0x81
        else:
            input_bits.extend([zero] * 7 + [one])  # 0x01
            input_bits.extend([zero] * (padding_len - 16))
            input_bits.extend([one] + [zero] * 7)  # 0x80

        for off in range(0, len(input_bits), ABSORB_BITS_RATE):
            self.absorb(state, input_bits[off : off + ABSORB_BITS_RATE])

        res_bits: List[AssignedCondition] = []
        for lane in (state[0][0], state[1][0], state[2][0], state[3][0]):
            chunks = [lane[i : i + 8] for i in range(0, W, 8)]
            for chunk in reversed(chunks):
                res_bits.extend(chunk)

        return self.compose_to_scalar_be(res_bits)
