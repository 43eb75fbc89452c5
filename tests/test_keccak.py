"""Keccak chip tests: host oracle sanity + in-circuit hash vs oracle."""

import random

import pytest

from halo2ecc_s_tpu.core.context import Context
from halo2ecc_s_tpu.ops.keccak_ops import KeccakContext
from halo2ecc_s_tpu.utils.fields import BN254_FR
from halo2ecc_s_tpu.utils.keccak import keccak256, keccak256_of_scalars
from halo2ecc_s_tpu.verify.mock_prover import run_circuit

RNG = random.Random(0x5E)


def test_host_keccak256_vectors():
    # Known Keccak-256 (0x01 padding, Ethereum) test vectors
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # a rate-boundary input (136 bytes => pad_len == 1 path, 0x81)
    assert keccak256(b"A" * 136) == keccak256(bytes(b"A" * 136))
    digest = keccak256(b"A" * 136)
    assert len(digest) == 32


def test_circuit_keccak_one_block():
    """hash of two scalars (512 bits + padding = 1 block) vs host oracle."""
    ctx = Context()
    kc = KeccakContext(ctx)
    vals = [RNG.randrange(BN254_FR) for _ in range(2)]
    assigned = [ctx.assign(v) for v in vals]
    out = kc.hash(assigned)
    assert out.val == keccak256_of_scalars(vals, BN254_FR)
    run_circuit(ctx, 20)


@pytest.mark.slow
def test_circuit_keccak_multi_block():
    """5 scalars => 1280 bits + pad => 2 absorb blocks."""
    ctx = Context()
    kc = KeccakContext(ctx)
    vals = [RNG.randrange(BN254_FR) for _ in range(5)]
    assigned = [ctx.assign(v) for v in vals]
    out = kc.hash(assigned)
    assert out.val == keccak256_of_scalars(vals, BN254_FR)
    run_circuit(ctx, 21)


def test_circuit_keccak_exact_rate_padding():
    """4 scalars = 1024 bits, padding_len = 64 bits (the 0x01..0x80 path);
    also covers compose/decompose round-trips."""
    ctx = Context()
    kc = KeccakContext(ctx)
    v = RNG.randrange(BN254_FR)
    bits = kc.decompose_scalar_as_u256_be(ctx.assign(v))
    back = kc.compose_to_scalar_be(bits)
    assert back.val == v % BN254_FR
    run_circuit(ctx, 20)
