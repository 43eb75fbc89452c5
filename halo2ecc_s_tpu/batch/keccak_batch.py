"""Batched Keccak-256 witness generation.

The reference's keccak chip emits ~115k bit-level gates per permutation one
Rust call at a time (keccak_chip.rs:61-165) — the slowest witness path when
done scalar. Here the sponge is four witness templates batched over B lanes
(hashes):

  decompose  — 256-bit big-endian scalar decomposition (keccak_chip.rs:168-209)
  absorb     — rate-1088 xor of the input block into the state
  round      — one keccak-f round (theta, rho/pi, xi, iota); iota is a xor
               against a 64-bit round-constant VECTOR input, so one template
               serves all 24 rounds (the scalar chip folds constant bits into
               not_ gates instead — an intentional, verifier-checked layout
               difference)
  compose    — squeeze the 256 output bits back into a scalar

The 1600-bit state chains between templates as ONE stacked device tensor
(AssignedInputVec / AssignedVec — u32[B, 1600, 1]), so the whole permutation
runs in 26 device dispatches per batch. Round constants and padding bits are
wired by ROWS to two shared constant cells (one/zero) — no per-bit constant
rows. Correctness: host keccak oracle equality + full constraint verification
(tests/test_keccak_batch.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.assign import AssignedCondition, AssignedValue, Region
from ..core.context import Context
from ..kernels import ff_jax as ff
from ..ops.keccak_ops import ABSORB_BITS_RATE, KeccakContext, N_R, T, W
from ..utils.keccak import ROUND_CONSTANTS
from .template import AssignedInputVec, AssignedVec, Template, finalize_deferred

STATE_BITS = T * T * W  # 1600


def _flatten(state) -> List:
    return [state[x][y][z] for x in range(T) for y in range(T) for z in range(W)]


def _unflatten(flat) -> List:
    it = iter(flat)
    return [[[next(it) for _ in range(W)] for _ in range(T)] for _ in range(T)]


def _result_bit_indices() -> List[int]:
    """Flat state indices of the 256 output bits in compose order
    (keccak_chip.rs hash(): lanes (0..3, 0), bytes reversed per lane)."""
    idx = []
    for x in range(4):
        base = (x * T + 0) * W
        chunks = [list(range(base + i, base + i + 8)) for i in range(0, W, 8)]
        for chunk in reversed(chunks):
            idx.extend(chunk)
    return idx


class BatchKeccak:
    """Batched keccak-256 of one 256-bit scalar per lane (the reference
    test shape, keccak_chip.rs tests); templates cached across builds."""

    def __init__(self):
        self._templates: Dict[str, Template] = {}

    # ---------------- templates ----------------

    def _t_decompose(self):
        if "dec" in self._templates:
            return self._templates["dec"]

        def build(ctx, ins):
            kc = KeccakContext(ctx)
            bits = kc.decompose_scalar_as_u256_be(ctx.assign(ins["s"]))
            return AssignedVec(bits)

        tmpl = Template.trace(build, {"s": (254, 123456789)})
        self._templates["dec"] = tmpl
        return tmpl

    def _t_absorb(self):
        if "absorb" in self._templates:
            return self._templates["absorb"]

        def build(ctx, ins):
            kc = KeccakContext(ctx)
            state = _unflatten(
                [AssignedCondition(v) for v in ins["state"]]
            )
            block = [AssignedCondition(v) for v in ins["block"]]
            # absorb's xor pattern without the trailing permute
            x = y = 0
            w_bytes = W // 8
            for i in range(ABSORB_BITS_RATE // W):
                for j in range(w_bytes):
                    for k in range(8):
                        z = i * W + j * 8 + k
                        pz = (w_bytes - j - 1) * 8 + k
                        state[x][y][pz] = ctx.xor(block[z], state[x][y][pz])
                if x < T - 1:
                    x += 1
                else:
                    y += 1
                    x = 0
            return AssignedVec(_flatten(state))

        tmpl = Template.trace(
            build,
            {},
            assigned_inputs=[
                AssignedInputVec("state", 1, [0] * STATE_BITS),
                AssignedInputVec("block", 1, [0] * ABSORB_BITS_RATE),
            ],
        )
        self._templates["absorb"] = tmpl
        return tmpl

    def _t_round(self):
        if "round" in self._templates:
            return self._templates["round"]

        def build(ctx, ins):
            kc = KeccakContext(ctx)
            state = _unflatten([AssignedCondition(v) for v in ins["state"]])
            rc = [AssignedCondition(v) for v in ins["rc"]]
            kc.theta(state)
            b = kc.rho_and_pi(state)
            kc.xi(state, b)
            for z in range(W):
                state[0][0][z] = ctx.xor(state[0][0][z], rc[z])
            return AssignedVec(_flatten(state))

        rc0 = [(ROUND_CONSTANTS[0] >> (W - z - 1)) & 1 for z in range(W)]
        tmpl = Template.trace(
            build,
            {},
            assigned_inputs=[
                AssignedInputVec("state", 1, [0] * STATE_BITS),
                AssignedInputVec("rc", 1, rc0),
            ],
        )
        self._templates["round"] = tmpl
        return tmpl

    def _t_compose(self):
        if "compose" in self._templates:
            return self._templates["compose"]

        def build(ctx, ins):
            kc = KeccakContext(ctx)
            bits = [AssignedCondition(v) for v in ins["bits"]]
            return kc.compose_to_scalar_be(bits)

        tmpl = Template.trace(
            build,
            {},
            assigned_inputs=[AssignedInputVec("bits", 1, [0] * 256)],
        )
        self._templates["compose"] = tmpl
        return tmpl

    # ---------------- driver ----------------

    def hash_batch(
        self,
        inputs: List[int],
        ctx: Optional[Context] = None,
        device: bool = False,
        write_tables: bool = True,
    ) -> Tuple[Context, List[AssignedValue]]:
        """Hash B single-scalar messages; returns (ctx, per-lane results).

        write_tables=False (device only): serving mode — advice slabs stay
        device-resident and host Records (masks/fixed too — static layout a
        server caches once) are never materialised; results and safety flags
        are still fetched and checked."""
        ctx = ctx or Context()
        if not write_tables:
            assert device, "write_tables=False requires device=True"
            ctx.serving_mode = True
        for v in inputs:
            # scalars are field elements: an out-of-field input would be
            # silently reduced by assignment while the oracle hashes the raw
            # 32-byte encoding — reject loudly instead
            assert 0 <= v < ctx.n, "keccak inputs must be canonical scalars"
        B = len(inputs)
        deferred: Optional[list] = [] if device else None
        if device:
            import jax.numpy as jnp
            xp = jnp
        else:
            xp = np

        one = ctx.assign_constant(1)
        zero = ctx.assign_constant(0)

        def const_vec(bits: List[int]):
            """(vals [B, K, 16], (region, cols[K], rows[B, K])) wired to the
            shared one/zero constant cells."""
            K = len(bits)
            vals = np.zeros((B, K, 16), dtype=np.uint32)
            vals[:, :, 0] = np.asarray(bits, dtype=np.uint32)[None, :]
            rows = np.where(
                np.asarray(bits, dtype=np.int64)[None, :] == 1,
                one.cell.row,
                zero.cell.row,
            )
            rows = np.broadcast_to(rows, (B, K))
            cols = np.full(K, one.cell.col, dtype=np.int64)
            assert zero.cell.col == one.cell.col and zero.cell.region == one.cell.region
            return vals, (one.cell.region, cols, rows)

        # phase 1: decompose inputs to 256 BE bits per lane
        t_dec = self._t_decompose()
        bits_leaf = t_dec.instantiate(
            ctx, {"s": ff.ints_to_limbs(inputs, 16)}, deferred=deferred
        )

        # phase 2: build the rate-1088 block (input bits + 0x01..0x80 pad)
        pad_bits = [0] * 7 + [1] + [0] * (ABSORB_BITS_RATE - 256 - 16) + [1] + [0] * 7
        pad_vals, (pre, pcols, prows) = const_vec(pad_bits)
        bvals, (breg, bcols, brows) = bits_leaf
        block_vals = xp.concatenate([xp.asarray(bvals), xp.asarray(pad_vals)], axis=1)
        assert breg == pre
        block_cols = np.concatenate([np.asarray(bcols), pcols])
        block_rows = np.concatenate([np.asarray(brows), prows], axis=1)

        # phase 3: absorb into the zero state
        zero_state = const_vec([0] * STATE_BITS)
        t_abs = self._t_absorb()
        state_leaf = t_abs.instantiate(
            ctx,
            {
                "state": zero_state[0],
                "block": block_vals,
            },
            assigned_rows={
                "state": zero_state[1],
                "block": (breg, block_cols, block_rows),
            },
            deferred=deferred,
        )

        # phase 4: 24 rounds (one template; rc wired per round)
        t_round = self._t_round()
        for r in range(N_R):
            rc_bits = [(ROUND_CONSTANTS[r] >> (W - z - 1)) & 1 for z in range(W)]
            rc = const_vec(rc_bits)
            svals, srows = state_leaf
            state_leaf = t_round.instantiate(
                ctx,
                {"state": svals, "rc": rc[0]},
                assigned_rows={"state": srows, "rc": rc[1]},
                deferred=deferred,
            )

        # phase 5: compose the 256 result bits into a scalar per lane
        idx = np.asarray(_result_bit_indices(), dtype=np.int64)
        svals, (sreg, scols, srws) = state_leaf
        res_vals = xp.asarray(svals)[:, idx]
        res_rows = (sreg, np.asarray(scols)[idx], np.asarray(srws)[:, idx])
        t_comp = self._t_compose()
        out_leaf = t_comp.instantiate(
            ctx,
            {"bits": res_vals},
            assigned_rows={"bits": res_rows},
            deferred=deferred,
        )

        if device:
            finalize_deferred(deferred, write=write_tables)
        vals, (reg, col, rows) = out_leaf
        vals = np.asarray(vals)
        results = [
            AssignedValue(
                _cell(reg, col, int(rows[lane])), ff.limbs_to_int(vals[lane])
            )
            for lane in range(B)
        ]
        return ctx, results


def _cell(region, col, row):
    from ..core.assign import Cell

    return Cell(region, col, row)
