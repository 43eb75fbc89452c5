"""Keccak hash circuit builder."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from ..core.context import Context
from ..ops.keccak_ops import KeccakContext
from ..utils.keccak import keccak256_of_scalars


def build_keccak_circuit(
    values: Sequence[int], ctx: Optional[Context] = None
) -> Tuple[Context, object]:
    """Hash native scalars in-circuit; returns (ctx, assigned digest scalar)."""
    ctx = ctx or Context()
    kc = KeccakContext(ctx)
    assigned = [ctx.assign(v) for v in values]
    out = kc.hash(assigned)
    assert out.val == keccak256_of_scalars(values, ctx.n)
    return ctx, out
