"""Reference-fidelity anchor for the derived frobenius coefficient tables.

utils/fields.py DERIVES every frobenius coefficient from the curve params
(xi^((p^i-1)/k) powers); the reference hard-codes them as byte/limb constants
(/root/reference/src/circuit/bn256_constants.rs:15-383 as canonical LE bytes,
/root/reference/src/circuit/bls12_381_pairing_chip.rs:58-116 as Montgomery
from_raw_unchecked u64 limbs, R = 2^384). The end-to-end pairing tests imply
these values; this test pins any future regression to the exact coefficient
by diffing the derived tables against the reference constants parsed straight
out of the reference sources (skipped when the reference tree is absent).
"""

import os
import re

import pytest

from halo2ecc_s_tpu.utils.fields import bls12_381, bn254

REF = "/root/reference/src/circuit"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _parse_rust_numbers(text: str):
    """All integer literals (incl. hex with _ separators) in order."""
    out = []
    for tok in re.findall(r"0x[0-9a-fA-F_]+|\b\d+\b", text):
        out.append(int(tok.replace("_", ""), 0))
    return out


def _const_block(src: str, name: str) -> str:
    """Source text of `pub const NAME: ... = [...];` (to the closing `];`)."""
    m = re.search(rf"const {name}[^=]*=", src)
    assert m, name
    end = src.index("];", m.end())
    return src[m.end():end]


def _le_bytes_groups(nums, group=32):
    """Chunk a flat number list into little-endian `group`-byte integers."""
    assert len(nums) % group == 0
    return [
        int.from_bytes(bytes(nums[i : i + group]), "little")
        for i in range(0, len(nums), group)
    ]


def test_bn254_frobenius_tables_match_reference():
    src = open(os.path.join(REF, "bn256_constants.rs")).read()
    curve = bn254()
    p = curve.p

    def table(name):
        return _le_bytes_groups(_parse_rust_numbers(_const_block(src, name)))

    # FQ2_C1: scalar Fq entries (reference stores each as one 32-byte value)
    fq2_c1 = table("FROBENIUS_COEFF_FQ2_C1")
    assert tuple(fq2_c1) == tuple(curve.frob_fq2_c1)

    # FQ6_C1 / FQ6_C2 / FQ12_C1: Fq2 entries = pairs of 32-byte values
    for name, derived in (
        ("FROBENIUS_COEFF_FQ6_C1", curve.frob_fq6_c1),
        ("FROBENIUS_COEFF_FQ6_C2", curve.frob_fq6_c2),
        ("FROBENIUS_COEFF_FQ12_C1", curve.frob_fq12_c1),
    ):
        vals = table(name)
        got = [(vals[2 * i], vals[2 * i + 1]) for i in range(len(vals) // 2)]
        assert got == [tuple(x) for x in derived], name

    xi_half = table("XI_TO_Q_MINUS_1_OVER_2")
    assert (xi_half[0], xi_half[1]) == tuple(curve.xi_to_q_minus_1_over_2)

    # and the NAF schedule + curve parameter used by prepare_g2
    naf_text = _const_block(src, "SIX_U_PLUS_2_NAF")
    naf = [int(t) for t in re.findall(r"-?\d+", naf_text)]
    from halo2ecc_s_tpu.utils.fields import six_u_plus_2_naf

    assert naf == list(six_u_plus_2_naf())
    bn_x = _parse_rust_numbers(_const_block(src, "BN_X"))[0]
    assert bn_x == curve.x
    assert p % 4 == 3  # fq2 frobenius = conjugation (bn256_pairing_chip.rs:46)


def test_bls12_381_frobenius_constants_match_reference():
    src = open(os.path.join(REF, "bls12_381_pairing_chip.rs")).read()
    curve = bls12_381()
    p = curve.p
    r_inv = pow(1 << 384, -1, p)  # from_raw_unchecked limbs are Montgomery

    # every from_raw_unchecked([...6 u64s...]) in source order:
    raws = re.findall(r"from_raw_unchecked\(\[([^\]]*)\]", src)
    vals = []
    for body in raws:
        limbs = _parse_rust_numbers(body)
        assert len(limbs) == 6
        raw = sum(l << (64 * i) for i, l in enumerate(limbs))
        vals.append(raw * r_inv % p)
    # source order (bls12_381_pairing_chip.rs:58-116): fq6 coeff_c1 (c1 of an
    # Fq2 whose c0 is zero), fq6 coeff_c2 (c0; c1 zero), fq12 coeff (c0, c1)
    assert len(vals) == 4
    assert (0, vals[0]) == tuple(curve.frob_fq6_c1[1])
    assert (vals[1], 0) == tuple(curve.frob_fq6_c2[1])
    assert (vals[2], vals[3]) == tuple(curve.frob_fq12_c1[1])

    bls_x = _parse_rust_numbers(
        re.search(r"BLS_X[^=]*=\s*([0-9a-fx_]+)", src).group(1)
    )[0]
    assert bls_x == curve.x and curve.x_is_neg
