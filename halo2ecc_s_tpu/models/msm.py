"""MSM circuit builders — the flagship workload.

Wraps the UnsafeError retry protocol the reference implements at its call
sites (tests/native_scalar_ecc_chip.rs:52-58): each attempt rebuilds the
trace with fresh blinding randomness.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

from ..core.context import Context
from ..ops.ecc_ops import (
    GeneralScalarEccContext,
    NativeScalarEccContext,
    UnsafeError,
)
from ..utils.curves import G1
from ..utils.fields import PairingCurve, bn254


def build_msm_circuit(
    points: Sequence,
    scalars: Sequence[int],
    curve: Optional[PairingCurve] = None,
    with_select_chip: bool = True,
    expected=None,
    max_tries: int = 10,
    seed: Optional[int] = None,
) -> Tuple[NativeScalarEccContext, object]:
    """Native-scalar MSM with retry; optionally asserts the expected point.

    Returns (context, assigned result point).
    """
    curve = curve or bn254()
    base_seed = seed if seed is not None else random.SystemRandom().randrange(1 << 62)
    last_err = None
    for attempt in range(max_tries):
        ecc = NativeScalarEccContext(
            curve,
            with_select_chip=with_select_chip,
            rng=random.Random(base_seed + attempt),
        )
        try:
            ap = [ecc.assign_point(p) for p in points]
            asc = [ecc.assign_scalar(s) for s in scalars]
            res = ecc.msm_unsafe(ap, asc)
            if expected is not None:
                ecc.ecc_assert_equal(res, ecc.assign_point(expected))
            return ecc, res
        except UnsafeError as e:
            last_err = e
            continue
    raise last_err


def build_general_msm_circuit(
    points: Sequence,
    scalars: Sequence[int],
    curve: PairingCurve,
    expected=None,
    max_tries: int = 10,
    seed: Optional[int] = None,
) -> Tuple[GeneralScalarEccContext, object]:
    """MSM for a foreign curve (e.g. bls12-381) witnessed over bn254 Fr."""
    base_seed = seed if seed is not None else random.SystemRandom().randrange(1 << 62)
    last_err = None
    for attempt in range(max_tries):
        ecc = GeneralScalarEccContext(curve, rng=random.Random(base_seed + attempt))
        try:
            ap = [ecc.assign_point(p) for p in points]
            asc = [ecc.assign_scalar(s) for s in scalars]
            res = ecc.msm_unsafe(ap, asc)
            if expected is not None:
                ecc.ecc_assert_equal(res, ecc.assign_point(expected))
            return ecc, res
        except UnsafeError as e:
            last_err = e
            continue
    raise last_err


def random_msm_instance(n: int, curve: Optional[PairingCurve] = None, seed: int = 0):
    """Host-generated test instance: points, scalars, expected result."""
    curve = curve or bn254()
    g1 = G1(curve)
    rng = random.Random(seed)
    points = [g1.random(rng) for _ in range(n)]
    scalars = [rng.randrange(curve.r) for _ in range(n)]
    return points, scalars, g1.msm(points, scalars)
