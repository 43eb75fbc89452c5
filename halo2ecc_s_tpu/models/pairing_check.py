"""Pairing-check circuit builders (reference tests/native_scalar_pairing_chip.rs
and tests/general_scalar_pairing_chip.rs workloads)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from ..ops.ecc_ops import GeneralScalarEccContext, NativeScalarEccContext
from ..utils.fields import PairingCurve, bn254


def build_pairing_check_circuit(
    terms: Sequence[Tuple[object, object]],
    curve: Optional[PairingCurve] = None,
):
    """Constrain prod e(g1_i, g2_i) == 1 for host affine point pairs.

    bn254 terms run over the native-scalar context; any other curve runs over
    bn254 Fr via the general-scalar context.
    """
    curve = curve or bn254()
    if curve.name == "bn254":
        ecc = NativeScalarEccContext(curve)
    else:
        ecc = GeneralScalarEccContext(curve)

    circ_terms = []
    for g1_pt, g2_pt in terms:
        p = ecc.assign_point(g1_pt)
        q = ecc.assign_constant_g2(g2_pt)
        circ_terms.append((p, q))
    ecc.check_pairing(circ_terms)
    return ecc


def build_pairing_eq_circuit(g1_pt, g2_pt, expected_gt, curve=None):
    """Constrain e(g1, g2) == expected (a host Fq12 constant)."""
    curve = curve or bn254()
    ecc = (
        NativeScalarEccContext(curve)
        if curve.name == "bn254"
        else GeneralScalarEccContext(curve)
    )
    p = ecc.assign_point(g1_pt)
    q = ecc.assign_constant_g2(g2_pt)
    res = ecc.pairing([(p, q)])
    expect = ecc.fq12_assign_constant(expected_gt)
    ecc.fq12_assert_eq(res, expect)
    return ecc
