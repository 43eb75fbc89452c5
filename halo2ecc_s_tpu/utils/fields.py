"""Field and curve parameters for bn254 (aka bn256) and bls12-381.

Host-side exact arithmetic is plain Python integers (arbitrary precision);
device-side kernels use limbed representations (see kernels/).

Parity notes (reference: halo2ecc-s):
- moduli match halo2's `pairing::bn256::{Fq, Fr}` / `pairing::bls12_381::{Fq, Fr}`.
- Frobenius coefficients are *derived* here from the curve parameters (xi powers)
  rather than stored as byte tables (reference keeps them in
  src/circuit/bn256_constants.rs and inline in bls12_381_pairing_chip.rs).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

# --------------------------------------------------------------------------
# Moduli
# --------------------------------------------------------------------------

# bn254 / bn256
BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN_X = 4965661367192848881  # BN curve parameter x (p,r are degree-4 polys in x)

# bls12-381
BLS12_381_FQ = int(
    "1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab",
    16,
)
BLS12_381_FR = int(
    "73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16
)
BLS_X = 0xD201_0000_0001_0000  # |x|; the bls12-381 parameter is -x


def inv_mod(a, p: int):
    """Modular inverse; returns 0 for 0 (mirroring field `invert().unwrap_or(0)`
    call sites which handle zero explicitly).

    Symbolic values (batch tracing) take the Fermat path uniformly so lanes
    with a == 0 still evaluate to 0 without divergent control flow."""
    if not isinstance(a, int):
        return pow(a % p, -1, p)
    a %= p
    if a == 0:
        return 0
    return pow(a, -1, p)


def field_bits(p: int) -> int:
    return (p - 1).bit_length()


# --------------------------------------------------------------------------
# Fq2 helper arithmetic over plain int pairs (used for constant derivation
# and the host oracle). Fq2 = Fq[u]/(u^2+1) for both curves.
# --------------------------------------------------------------------------


def fq2_mul_host(a, b, p):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 - a1 * b1) % p, (a0 * b1 + a1 * b0) % p)


def fq2_pow_host(a, e: int, p):
    result = (1, 0)
    base = a
    while e > 0:
        if e & 1:
            result = fq2_mul_host(result, base, p)
        base = fq2_mul_host(base, base, p)
        e >>= 1
    return result


def fq2_inv_host(a, p):
    a0, a1 = a
    norm = (a0 * a0 + a1 * a1) % p
    ninv = inv_mod(norm, p)
    return ((a0 * ninv) % p, (-a1 * ninv) % p)


# --------------------------------------------------------------------------
# Signed-digit expansion for the BN miller loop scalar 6x+2
# --------------------------------------------------------------------------


def naf(value: int) -> list[int]:
    """Non-adjacent form, least-significant digit first, digits in {-1,0,1}."""
    digits = []
    n = value
    while n > 0:
        if n & 1:
            d = 2 - (n % 4)
            digits.append(d)
            n -= d
        else:
            digits.append(0)
        n >>= 1
    return digits


@lru_cache(maxsize=None)
def six_u_plus_2_naf() -> tuple[int, ...]:
    """Signed-digit expansion of 6*BN_X+2 used by the bn254 miller loop.

    Matches the table the reference stores at bn256_constants.rs:8-12 (the
    halo2curves/pse convention); validated by the checksum below.
    """
    digits = [
        0, 0, 0, 1, 0, 1, 0, -1, 0, 0, 1, -1, 0, 0, 1, 0, 0, 1, 1, 0, -1, 0, 0,
        1, 0, -1, 0, 0, 0, 0, 1, 1, 1, 0, 0, -1, 0, 0, 1, 0, 0, 0, 0, 0, -1, 0,
        0, 1, 1, 0, 0, -1, 0, 0, 0, 1, 1, 0, -1, 0, 0, 1, 0, 1, 1,
    ]
    assert sum(d << i for i, d in enumerate(digits)) == 6 * BN_X + 2
    return tuple(digits)


# --------------------------------------------------------------------------
# Pairing-friendly curve configuration
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class PairingCurve:
    """All parameters needed by the tower / pairing algorithm core.

    Frobenius coefficient tables are derived in __post_init__-style factory
    functions (see bn254() / bls12_381()).
    """

    name: str
    p: int  # base field modulus (Fq)
    r: int  # scalar field modulus (Fr)
    b: int  # G1: y^2 = x^3 + b
    b2: tuple  # G2: y^2 = x^3 + b2 over Fq2
    g1: tuple  # G1 generator (x, y)
    g2: tuple  # G2 generator ((x0,x1),(y0,y1))
    xi: tuple  # Fq6 nonresidue in Fq2
    x: int  # curve parameter (absolute value)
    x_is_neg: bool
    # frobenius tables, all entries Fq2 tuples
    frob_fq2_c1: tuple = field(default=())  # u^(p^i - 1) scalar (stored as fq elems)
    frob_fq6_c1: tuple = field(default=())  # xi^((p^i-1)/3)
    frob_fq6_c2: tuple = field(default=())  # xi^((2p^i-2)/3)
    frob_fq12_c1: tuple = field(default=())  # xi^((p^i-1)/6)
    xi_to_q_minus_1_over_2: tuple = field(default=())

    @property
    def fq_bits(self) -> int:
        return field_bits(self.p)

    @property
    def fr_bits(self) -> int:
        return field_bits(self.r)


def _derive_frobenius(p: int, xi) -> dict:
    frob_fq2_c1 = tuple(pow(-1, ((p**i - 1) // 2) % 2, p) for i in range(2))
    frob_fq6_c1 = tuple(fq2_pow_host(xi, (p**i - 1) // 3, p) for i in range(6))
    frob_fq6_c2 = tuple(fq2_pow_host(xi, (2 * p**i - 2) // 3, p) for i in range(6))
    frob_fq12_c1 = tuple(fq2_pow_host(xi, (p**i - 1) // 6, p) for i in range(12))
    xi_half = fq2_pow_host(xi, (p - 1) // 2, p)
    return dict(
        frob_fq2_c1=frob_fq2_c1,
        frob_fq6_c1=frob_fq6_c1,
        frob_fq6_c2=frob_fq6_c2,
        frob_fq12_c1=frob_fq12_c1,
        xi_to_q_minus_1_over_2=xi_half,
    )


@lru_cache(maxsize=None)
def bn254() -> PairingCurve:
    p = BN254_FQ
    xi = (9, 1)
    b2 = fq2_mul_host((3, 0), fq2_inv_host(xi, p), p)
    g2 = (
        (
            10857046999023057135944570762232829481370756359578518086990519993285655852781,
            11559732032986387107991004021392285783925812861821192530917403151452391805634,
        ),
        (
            8495653923123431417604973247489272438418190587263600148770280649306958101930,
            4082367875863433681332203403145435568316851327593401208105741076214120093531,
        ),
    )
    return PairingCurve(
        name="bn254",
        p=p,
        r=BN254_FR,
        b=3,
        b2=b2,
        g1=(1, 2),
        g2=g2,
        xi=xi,
        x=BN_X,
        x_is_neg=False,
        **_derive_frobenius(p, xi),
    )


@lru_cache(maxsize=None)
def bls12_381() -> PairingCurve:
    p = BLS12_381_FQ
    xi = (1, 1)
    g2 = (
        (
            int(
                "024aa2b2f08f0a91260805272dc51051c6e47ad4fa403b02b4510b647ae3d177"
                "0bac0326a805bbefd48056c8c121bdb8",
                16,
            ),
            int(
                "13e02b6052719f607dacd3a088274f65596bd0d09920b61ab5da61bbdc7f5049"
                "334cf11213945d57e5ac7d055d042b7e",
                16,
            ),
        ),
        (
            int(
                "0ce5d527727d6e118cc9cdc6da2e351aadfd9baa8cbdd3a76d429a695160d12c"
                "923ac9cc3baca289e193548608b82801",
                16,
            ),
            int(
                "0606c4a02ea734cc32acd2b02bc28b99cb3e287e85a763af267492ab572e99ab"
                "3f370d275cec1da1aaa9075ff05f79be",
                16,
            ),
        ),
    )
    return PairingCurve(
        name="bls12_381",
        p=p,
        r=BLS12_381_FR,
        b=4,
        b2=(4, 4),
        g1=(
            int(
                "17f1d3a73197d7942695638c4fa9ac0fc3688c4f9774b905a14e3a3f171bac58"
                "6c55e83ff97a1aeffb3af00adb22c6bb",
                16,
            ),
            int(
                "08b3f481e3aaa0f1a09e30ed741d8ae4fcf5e095d5d00af600db18cb2c04b3ed"
                "d03cc744a2888ae40caa232946c5e7e1",
                16,
            ),
        ),
        g2=g2,
        xi=xi,
        x=BLS_X,
        x_is_neg=True,
        **_derive_frobenius(p, xi),
    )
