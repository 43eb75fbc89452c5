"""Host Keccak-256 (original 0x01 padding, rate 1088) — oracle for the
in-circuit keccak chip. Standard Keccak-f[1600] from the public spec."""

from __future__ import annotations

# standard Keccak round constants (spec, same values as keccak_chip.rs:26-51)
ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rho rotation offsets indexed [x][y]
RHO_OFFSETS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_M64 = (1 << 64) - 1


def _rol(v: int, r: int) -> int:
    r %= 64
    return ((v << r) | (v >> (64 - r))) & _M64


def keccak_f1600(lanes):
    """lanes: 5x5 list of u64, indexed [x][y]."""
    for rc in ROUND_CONSTANTS:
        # theta
        c = [lanes[x][0] ^ lanes[x][1] ^ lanes[x][2] ^ lanes[x][3] ^ lanes[x][4]
             for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                lanes[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(lanes[x][y], RHO_OFFSETS[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                lanes[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        lanes[0][0] ^= rc
    return lanes


RATE_BYTES = 136  # 1088-bit rate


def keccak256(data: bytes) -> bytes:
    """Original Keccak-256 (0x01 domain padding, as used by Ethereum)."""
    padded = bytearray(data)
    pad_len = RATE_BYTES - (len(data) % RATE_BYTES)
    if pad_len == 1:
        padded.append(0x81)
    else:
        padded.append(0x01)
        padded.extend(b"\x00" * (pad_len - 2))
        padded.append(0x80)

    lanes = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), RATE_BYTES):
        block = padded[off : off + RATE_BYTES]
        for i in range(RATE_BYTES // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            x, y = i % 5, i // 5
            lanes[x][y] ^= lane
        keccak_f1600(lanes)

    out = bytearray()
    for i in range(4):
        out.extend(lanes[i][0].to_bytes(8, "little"))
    return bytes(out)


def keccak256_of_scalars(values, n_modulus: int) -> int:
    """The value the circuit keccak chip computes: keccak256 over the 32-byte
    big-endian encodings, composed back into the native field."""
    data = b"".join(int(v).to_bytes(32, "big") for v in values)
    return int.from_bytes(keccak256(data), "big") % n_modulus
