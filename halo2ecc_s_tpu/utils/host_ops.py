"""Host pairing oracle: TowerOps/PairingOps instantiated over plain ints.

Runs the exact same algorithm schedule as the circuit contexts, so oracle
outputs match in-circuit values element-for-element. Used by tests as the
"expected" side (reference tests use halo2's host pairing the same way).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..core.pairing_core import PairingOps
from ..core.tower import TowerOps
from .curves import G1, G2
from .fields import PairingCurve, inv_mod


@dataclass
class HostG1Affine:
    x: int
    y: int
    z: int  # 1 for identity

    @classmethod
    def from_point(cls, pt):
        if pt is None:
            return cls(0, 0, 1)
        return cls(pt[0], pt[1], 0)


class HostPairingCtx(TowerOps, PairingOps):
    """int-backed tower + pairing context for a given curve."""

    def __init__(self, curve: PairingCurve):
        self.pairing_curve = curve
        self.p = curve.p

    # -- integer ops interface over plain ints --

    def int_add(self, a, b):
        return (a + b) % self.p

    def int_sub(self, a, b):
        return (a - b) % self.p

    def int_neg(self, a):
        return (-a) % self.p

    def int_mul(self, a, b):
        return (a * b) % self.p

    def int_square(self, a):
        return (a * a) % self.p

    def int_unsafe_invert(self, a):
        v = inv_mod(a, self.p)
        assert v != 0 or a % self.p == 0
        return v

    def assign_int_constant(self, c):
        return c % self.p

    def assert_int_equal(self, a, b):
        assert a % self.p == b % self.p

    def reduce(self, a):
        return a % self.p

    def assert_false_cond(self, cond):
        assert cond == 0

    # -- convenience for tests --

    def fq12_pow(self, f, e: int):
        res = self.fq12_assign_one()
        base = f
        while e > 0:
            if e & 1:
                res = self.fq12_mul(res, base)
            base = self.fq12_mul(base, base)
            e >>= 1
        return res

    def pairing_points(self, g1_pt, g2_pt):
        """Pairing of host affine points ((x, y) tuples or None)."""
        p = HostG1Affine.from_point(g1_pt)
        from ..core.assign import AssignedG2Affine

        if g2_pt is None:
            raise ValueError("identity G2 not supported (reference parity)")
        q = AssignedG2Affine(g2_pt[0], g2_pt[1], 0)
        return self.pairing([(p, q)])

    def check_pairing_points(self, terms) -> bool:
        from ..core.assign import AssignedG2Affine

        circ_terms = []
        for g1_pt, g2_pt in terms:
            p = HostG1Affine.from_point(g1_pt)
            q = AssignedG2Affine(g2_pt[0], g2_pt[1], 0)
            circ_terms.append((p, q))
        res = self.pairing(circ_terms)
        return res == self.fq12_assign_one()


def host_pairing(curve: PairingCurve, g1_pt, g2_pt):
    return HostPairingCtx(curve).pairing_points(g1_pt, g2_pt)
